package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 58 (C636–C639): Rayleigh circular-seasonality test, Gumbel
  * block-maxima fit, spectral entropy, Parkinson/Garman–Klass
  * volatility.
  */
object Extras158 {

  /** C636 stat_rayleigh_seasonality — the circular-statistics test for
    * a seasonal concentration of order dates: day-of-year groups first
    * (BOUNDED ≤366 distinct), unit-circle coordinates micro-quantized
    * (1e9) per distinct day so ΣC/ΣS are exact count-weighted integer
    * sums, R̄ = √(C²+S²)/n, mean direction via atan2 mapped back to a
    * day-of-year, Rayleigh z = nR̄² against the 2.996 (α=.05) bound.
    */
  def statRayleighSeasonality(s: SparkSession, d: String): DataFrame = {
    val byDoy = orders(s, d)
      .groupBy(dayofyear(col("o_orderdate")).as("doy"))
      .agg(count(lit(1)).cast("long").as("nd"))
      .withColumn("cq", expr(
        "CAST(floor(cos(2 * pi() * (doy - 1) / 365.25) * 1e9 + 0.5) AS BIGINT)"))
      .withColumn("sq", expr(
        "CAST(floor(sin(2 * pi() * (doy - 1) / 365.25) * 1e9 + 0.5) AS BIGINT)"))
    byDoy.agg(sum(col("nd")).cast("long").as("n"),
        sum(expr("nd * cq")).cast("decimal(38,0)").as("c"),
        sum(expr("nd * sq")).cast("decimal(38,0)").as("s"))
      .selectExpr("n",
        "sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e9) AS rbar",
        "atan2(CAST(s AS DOUBLE), CAST(c AS DOUBLE)) AS ang")
      .selectExpr("n", "round(rbar, 6) AS r_bar",
        """round((CASE WHEN ang < 0 THEN ang + 2 * pi() ELSE ang END)
          |  / (2 * pi()) * 365.25 + 1, 2) AS mean_doy""".stripMargin,
        "round(n * rbar * rbar, 4) AS rayleigh_z",
        "n * rbar * rbar > 2.996 AS reject_uniform")
  }
  val statRayleighSeasonalitySql: String =
    """WITH bydoy AS (
      |  SELECT dayofyear(o_orderdate) AS doy, CAST(count(*) AS BIGINT) AS nd
      |  FROM orders GROUP BY 1),
      |q AS (
      |  SELECT nd,
      |    CAST(floor(cos(2 * pi() * (doy - 1) / 365.25) * 1e9 + 0.5) AS BIGINT) AS cq,
      |    CAST(floor(sin(2 * pi() * (doy - 1) / 365.25) * 1e9 + 0.5) AS BIGINT) AS sq
      |  FROM bydoy),
      |m AS (
      |  SELECT CAST(sum(nd) AS BIGINT) AS n,
      |    CAST(sum(nd * cq) AS DECIMAL(38,0)) AS c,
      |    CAST(sum(nd * sq) AS DECIMAL(38,0)) AS s
      |  FROM q),
      |r AS (
      |  SELECT n,
      |    sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
      |      + CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e9)
      |      AS rbar,
      |    atan2(CAST(s AS DOUBLE), CAST(c AS DOUBLE)) AS ang
      |  FROM m)
      |SELECT n, round(rbar, 6) AS r_bar,
      |  round((CASE WHEN ang < 0 THEN ang + 2 * pi() ELSE ang END)
      |    / (2 * pi()) * 365.25 + 1, 2) AS mean_doy,
      |  round(n * rbar * rbar, 4) AS rayleigh_z,
      |  n * rbar * rbar > 2.996 AS reject_uniform
      |FROM r""".stripMargin

  /** C637 stat_gumbel_block_maxima — extreme-value fit by block maxima
    * (the EVT workhorse for "how big can a daily spike get"): monthly
    * maxima of daily revenue over the BOUNDED month frame, Gumbel
    * method-of-moments β = s√6/π, μ = m̄ − γβ (γ = Euler–Mascheroni),
    * and the 100-month return level μ − β·ln(−ln(1−1/100)) — moments
    * from exact integer sums, three final double expressions.
    */
  def statGumbelBlockMaxima(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val blocks = daily.groupBy(date_trunc("month", col("day")).as("mon"))
      .agg(max(col("c")).as("mx"))
    blocks.agg(count(lit(1)).cast("long").as("b"),
        sum(col("mx")).cast("decimal(38,0)").as("sm"),
        sum(expr("CAST(mx AS DECIMAL(38,0)) * mx")).cast("decimal(38,0)").as("qm"))
      .selectExpr("b",
        "CAST(sm AS DOUBLE) / b AS mean_",
        """sqrt(CAST(CAST(b AS DECIMAL(38,0)) * qm - sm * sm AS DOUBLE))
          |  / b AS sd_""".stripMargin)
      .selectExpr("b AS n_blocks",
        "sd_ * sqrt(6) / pi() AS beta",
        "mean_ - 0.5772156649015329 * (sd_ * sqrt(6) / pi()) AS mu")
      .selectExpr("n_blocks",
        "round(mu / 100, 2) AS gumbel_mu",
        "round(beta / 100, 2) AS gumbel_beta",
        "round((mu - beta * ln(-ln(1 - 1.0 / 100))) / 100, 2) AS return_level_100")
  }
  val statGumbelBlockMaximaSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |blocks AS (
      |  SELECT date_trunc('month', day) AS mon, max(c) AS mx
      |  FROM daily GROUP BY 1),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS b,
      |    CAST(sum(mx) AS DECIMAL(38,0)) AS sm,
      |    CAST(sum(CAST(mx AS DECIMAL(38,0)) * mx) AS DECIMAL(38,0)) AS qm
      |  FROM blocks),
      |p AS (
      |  SELECT b, CAST(sm AS DOUBLE) / b AS mean_,
      |    sqrt(CAST(CAST(b AS DECIMAL(38,0)) * qm - sm * sm AS DOUBLE)) / b AS sd_
      |  FROM m),
      |g AS (
      |  SELECT b AS n_blocks, sd_ * sqrt(6) / pi() AS beta,
      |    mean_ - 0.5772156649015329 * (sd_ * sqrt(6) / pi()) AS mu
      |  FROM p)
      |SELECT n_blocks,
      |  round(mu / 100, 2) AS gumbel_mu,
      |  round(beta / 100, 2) AS gumbel_beta,
      |  round((mu - beta * ln(-ln(1 - 1.0 / 100))) / 100, 2) AS return_level_100
      |FROM g""".stripMargin

  /** C638 time_spectral_entropy — the normalized entropy of the daily-
    * revenue periodogram over candidate periods 2..30 (low entropy =
    * strongly periodic, the scalar seasonality summary): per-(t,p) DFT
    * terms use micro-quantized cos/sin against the denominator-cleared
    * exact series (decimal products, exact sums per period), the 29
    * energies PIVOT into one row, and the total + entropy evaluate in
    * FIXED textual order (the Higuchi discipline — no float-ordered
    * aggregation anywhere).
    */
  def timeSpectralEntropy(s: SparkSession, d: String): DataFrame = {
    val periods = 2 to 30
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = daily.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("day")
    val x = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("x", expr("CAST(n * c - sc AS DECIMAL(38,0))"))
    val terms = x.select(col("t"), col("x"),
      explode(array(periods.map(p => lit(p.toLong)): _*)).as("p"))
      .withColumn("cq", expr(
        "CAST(floor(cos(2 * pi() * t / p) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("sq", expr(
        "CAST(floor(sin(2 * pi() * t / p) * 1e6 + 0.5) AS BIGINT)"))
    val energies = terms.groupBy("p")
      .agg(sum(expr("x * cq")).as("a"), sum(expr("x * sq")).as("b"))
      .selectExpr("p",
        "CAST(a AS DOUBLE) * CAST(a AS DOUBLE) + CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS e")
    val pivCols = periods.map(p =>
      max(expr(s"CASE WHEN p = $p THEN e END")).as(s"e$p"))
    val piv = energies.agg(pivCols.head, pivCols.tail: _*)
    val totalExpr = periods.map(p => s"e$p").mkString(" + ")
    val entExpr = periods.map(p =>
      s"(CASE WHEN e$p > 0 THEN -(e$p / tot) * ln(e$p / tot) ELSE 0.0D END)")
      .mkString(" + ")
    piv.selectExpr(periods.map(p => s"e$p") :+ s"($totalExpr) AS tot": _*)
      .selectExpr(s"round(($entExpr) / ln(${periods.length}.0D), 6) AS spectral_entropy",
        "round((" + periods.map(p => s"CASE WHEN e$p = greatest(${periods.map(q => s"e$q").mkString(", ")}) THEN ${p}.0D ELSE 0.0D END").mkString(" + ") + "), 1) AS peak_period")
  }
  val timeSpectralEntropySql: String = {
    val periods = 2 to 30
    val structs = periods.map(p => s"{'p': CAST($p AS BIGINT)}").mkString(", ")
    val pivCols = periods.map(p =>
      s"max(CASE WHEN p = $p THEN e END) AS e$p").mkString(",\n      |    ")
    val totalExpr = periods.map(p => s"e$p").mkString(" + ")
    val entExpr = periods.map(p =>
      s"(CASE WHEN e$p > 0 THEN -(e$p / tot) * ln(e$p / tot) ELSE 0.0 END)")
      .mkString(" + ")
    val peakExpr = periods.map(p =>
      s"CASE WHEN e$p = greatest(${periods.map(q => s"e$q").mkString(", ")}) THEN ${p}.0 ELSE 0.0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(c) AS DECIMAL(38,0)) AS sc
       |  FROM daily),
       |x AS (
       |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |    CAST(n * c - sc AS DECIMAL(38,0)) AS x
       |  FROM daily, tot),
       |terms AS (
       |  SELECT x.t, x.x, u.p.p AS p,
       |    CAST(floor(cos(2 * pi() * x.t / u.p.p) * 1e6 + 0.5) AS BIGINT) AS cq,
       |    CAST(floor(sin(2 * pi() * x.t / u.p.p) * 1e6 + 0.5) AS BIGINT) AS sq
       |  FROM x, (SELECT unnest([$structs]) AS p) u),
       |energies AS (
       |  SELECT p,
       |    CAST(sum(x * cq) AS DOUBLE) * CAST(sum(x * cq) AS DOUBLE)
       |      + CAST(sum(x * sq) AS DOUBLE) * CAST(sum(x * sq) AS DOUBLE) AS e
       |  FROM terms GROUP BY 1),
       |piv AS (
       |  SELECT $pivCols
       |  FROM energies),
       |wt AS (
       |  SELECT *, ($totalExpr) AS tot FROM piv)
       |SELECT round(($entExpr) / ln(${periods.length}.0), 6) AS spectral_entropy,
       |  round(($peakExpr), 1) AS peak_period
       |FROM wt""".stripMargin
  }

  /** C639 win_parkinson_volatility — range-based daily volatility:
    * Parkinson σ² = Σ(ln(H/L))²/(4n·ln2) and Garman–Klass σ² =
    * Σ[½(ln(H/L))² − (2ln2−1)(ln(C/O))²]/n from daily OHLC (open/close
    * via struct-min/max over the deterministic order); each day's log
    * terms NANO-QUANTIZED so both numerator sums are exact integers
    * over the bounded daily frame — one division per estimator.
    */
  def winParkinsonVolatility(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(max(col("p")).as("h"), min(col("p")).as("l"),
        min(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("fo"),
        max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"))
      .selectExpr("day", "h", "l", "fo.p AS o", "lo.p AS c")
      .withColumn("hl", expr(
        "CAST(floor(ln(CAST(h AS DOUBLE) / l) * 1e9 + 0.5) AS BIGINT)"))
      .withColumn("co", expr(
        "CAST(floor(ln(CAST(c AS DOUBLE) / o) * 1e9 + 0.5) AS BIGINT)"))
    bars.agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CAST(hl AS DECIMAL(38,0)) * hl")).cast("decimal(38,0)").as("shl"),
        sum(expr("CAST(co AS DECIMAL(38,0)) * co")).cast("decimal(38,0)").as("sco"))
      .selectExpr("n_days",
        """round(CAST(shl AS DOUBLE) / 1e18 / (4 * n_days * ln(2)), 8)
          |  AS parkinson_var""".stripMargin,
        """round((0.5 * CAST(shl AS DOUBLE) / 1e18
          |  - (2 * ln(2) - 1) * CAST(sco AS DOUBLE) / 1e18) / n_days, 8)
          |  AS garman_klass_var""".stripMargin)
  }
  val winParkinsonVolatilitySql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day, max(p) AS h, min(p) AS l,
      |    (min(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS o,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c
      |  FROM px GROUP BY day),
      |q AS (
      |  SELECT
      |    CAST(floor(ln(CAST(h AS DOUBLE) / l) * 1e9 + 0.5) AS BIGINT) AS hl,
      |    CAST(floor(ln(CAST(c AS DOUBLE) / o) * 1e9 + 0.5) AS BIGINT) AS co
      |  FROM bars),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(CAST(hl AS DECIMAL(38,0)) * hl) AS DECIMAL(38,0)) AS shl,
      |    CAST(sum(CAST(co AS DECIMAL(38,0)) * co) AS DECIMAL(38,0)) AS sco
      |  FROM q)
      |SELECT n_days,
      |  round(CAST(shl AS DOUBLE) / 1e18 / (4 * n_days * ln(2)), 8) AS parkinson_var,
      |  round((0.5 * CAST(shl AS DOUBLE) / 1e18
      |    - (2 * ln(2) - 1) * CAST(sco AS DOUBLE) / 1e18) / n_days, 8)
      |    AS garman_klass_var
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_rayleigh_seasonality" -> (statRayleighSeasonality _),
    "stat_gumbel_block_maxima" -> (statGumbelBlockMaxima _),
    "time_spectral_entropy" -> (timeSpectralEntropy _),
    "win_parkinson_volatility" -> (winParkinsonVolatility _),
  )

  val oracle: Map[String, String] = Map(
    "stat_rayleigh_seasonality" -> statRayleighSeasonalitySql,
    "stat_gumbel_block_maxima" -> statGumbelBlockMaximaSql,
    "time_spectral_entropy" -> timeSpectralEntropySql,
    "win_parkinson_volatility" -> winParkinsonVolatilitySql,
  )
}
