package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 131 (C928–C931): capacity planning + FWER control + growth
  * curves + tail risk — the Erlang-B loss table, Holm–Bonferroni
  * step-down over the brand battery, a linearized Gompertz fit on
  * cumulative revenue, and 95% expected shortfall.
  *
  * Shared discipline: Erlang-B's 32-step recursion runs on ONE
  * collected scalar (offered load) with identical IEEE order in both
  * engines; Holm's critical values are the shared Acklam qnorm
  * evaluated at rank-dependent 1−α/(2(m−r+1)); Gompertz ln(−ln y)
  * terms quantize ·10⁹ before the bounded OLS; ES tail returns
  * quantize ·10⁹ before the tail mean.
  */
object Extras231 {

  /** C928 analytics_erlang_b — the Erlang-B blocking table for the
    * purchase-arrival process: offered load a = events per active hour
    * (lost-calls-cleared, unit service time — documented convention),
    * B(k) by the exact recursion B₀=1, Bₖ = aB/(k+aB) for k ≤ 32,
    * blocking at 8/16/24/32 servers and the minimum k with B < 1%.
    * The loss-system sibling of C876's Erlang-C wait model — trunk /
    * connection-pool sizing in one row.
    */
  def analyticsErlangB(s: SparkSession, d: String): DataFrame = {
    val row = events(s, d)
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct(expr("date_trunc('hour', ts)")).cast("long").as("h"))
      .collect().head
    val a = row.getLong(0).toDouble / row.getLong(1)
    val bs = new Array[Double](33)
    bs(0) = 1.0
    for (k <- 1 to 32) bs(k) = a * bs(k - 1) / (k + a * bs(k - 1))
    val kStar = (1 to 32).find(k => bs(k) < 0.01).getOrElse(33)
    import s.implicits._
    Seq((row.getLong(0), a, bs(8), bs(16), bs(24), bs(32), kStar.toLong))
      .toDF("n0", "a0", "b8", "b16", "b24", "b32", "k0")
      .selectExpr("n0 AS n_events", "round(a0, 4) AS offered_erlangs",
        "round(b8, 6) AS blocking_8", "round(b16, 6) AS blocking_16",
        "round(b24, 6) AS blocking_24", "round(b32, 6) AS blocking_32",
        "k0 AS min_servers_1pct")
  }
  val analyticsErlangBSql: String =
    """WITH RECURSIVE load AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) AS DOUBLE) / count(DISTINCT date_trunc('hour', ts)) AS a
      |  FROM events),
      |rec AS (
      |  SELECT 0 AS k, CAST(1 AS DOUBLE) AS b, a, n FROM load
      |  UNION ALL
      |  SELECT k + 1, a * b / ((k + 1) + a * b), a, n FROM rec WHERE k < 32),
      |fin AS (
      |  SELECT max(n) AS n, max(a) AS a,
      |    max(CASE WHEN k = 8 THEN b END) AS b8,
      |    max(CASE WHEN k = 16 THEN b END) AS b16,
      |    max(CASE WHEN k = 24 THEN b END) AS b24,
      |    max(CASE WHEN k = 32 THEN b END) AS b32,
      |    coalesce(min(CASE WHEN b < 0.01 AND k >= 1 THEN k END), 33) AS k0
      |  FROM rec)
      |SELECT n AS n_events, round(a, 4) AS offered_erlangs,
      |  round(b8, 6) AS blocking_8, round(b16, 6) AS blocking_16,
      |  round(b24, 6) AS blocking_24, round(b32, 6) AS blocking_32,
      |  CAST(k0 AS BIGINT) AS min_servers_1pct
      |FROM fin""".stripMargin

  /** C929 stat_holm_bonferroni — Holm's step-down FWER control over
    * the 25 brand-vs-rest price-mean z-tests: complement moments by
    * exact subtraction from the grand totals, |z| ranked desc over the
    * bounded 25-row frame, rank-r critical value qnorm(1−α/(2(m−r+1)))
    * (α=0.05, shared Acklam polynomial), step-down = cumulative-AND of
    * the per-rank pass flags. Reports unadjusted vs Bonferroni vs Holm
    * rejection counts — Holm dominates Bonferroni uniformly, pinned by
    * the spec. The FWER companion to C474's BH FDR.
    */
  def statHolmBonferroni(s: SparkSession, d: String): DataFrame = {
    val g = part(s, d)
      .select(col("p_brand"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("p_brand")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"))
    val tot = g.agg(sum(col("n")).cast("long").as("tn"),
      sum(col("s1")).cast("decimal(38,0)").as("ts1"),
      sum(col("s2")).cast("decimal(38,0)").as("ts2"))
    val z = g.crossJoin(broadcast(tot))
      .selectExpr("p_brand",
        """abs((CAST(s1 AS DOUBLE) / n - CAST(ts1 - s1 AS DOUBLE) / (tn - n))
          |/ sqrt(
          |  (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |    / (CAST(n AS DOUBLE) * (n - 1)) / n
          |+ (CAST(tn - n AS DOUBLE) * CAST(ts2 - s2 AS DOUBLE)
          |    - CAST(ts1 - s1 AS DOUBLE) * CAST(ts1 - s1 AS DOUBLE))
          |    / (CAST(tn - n AS DOUBLE) * ((tn - n) - 1)) / (tn - n))) AS az""".stripMargin)
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
      .withColumn("rnk", row_number().over(Window.orderBy(col("az").desc, col("p_brand"))).cast("long"))
    val flagged = z.selectExpr("az", "m", "rnk",
      s"CASE WHEN az >= ${QNorm.sql("1 - CAST(0.025 AS DOUBLE) / (m - rnk + 1)")} THEN 1L ELSE 0L END AS pass",
      s"CASE WHEN az >= ${QNorm.sql("1 - CAST(0.025 AS DOUBLE) / m")} THEN 1L ELSE 0L END AS bonf",
      s"CASE WHEN az >= ${QNorm.sql("0.975")} THEN 1L ELSE 0L END AS unadj")
      .withColumn("holm", min(col("pass")).over(
        Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)))
    flagged.agg(max(col("m")).as("m"),
        sum(col("unadj")).cast("long").as("n_unadjusted"),
        sum(col("bonf")).cast("long").as("n_bonferroni"),
        sum(col("holm")).cast("long").as("n_holm"),
        max(col("az")).as("mz"))
      .selectExpr("m AS n_tests", "n_unadjusted", "n_bonferroni", "n_holm",
        "round(mz, 4) AS max_abs_z")
  }
  val statHolmBonferroniSql: String = {
    val cRank = QNorm.sql("1 - CAST(0.025 AS DOUBLE) / (m - rnk + 1)")
    val cBonf = QNorm.sql("1 - CAST(0.025 AS DOUBLE) / m")
    val cUn = QNorm.sql("0.975")
    s"""WITH g AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |      * CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS s2
      |  FROM part GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS tn,
      |    CAST(sum(CAST(s1 AS HUGEINT)) AS DECIMAL(38,0)) AS ts1,
      |    CAST(sum(CAST(s2 AS HUGEINT)) AS DECIMAL(38,0)) AS ts2
      |  FROM g),
      |z AS (
      |  SELECT p_brand,
      |    abs((CAST(s1 AS DOUBLE) / n - CAST(ts1 - s1 AS DOUBLE) / (tn - n))
      |    / sqrt(
      |      (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * (n - 1)) / n
      |    + (CAST(tn - n AS DOUBLE) * CAST(ts2 - s2 AS DOUBLE)
      |        - CAST(ts1 - s1 AS DOUBLE) * CAST(ts1 - s1 AS DOUBLE))
      |        / (CAST(tn - n AS DOUBLE) * ((tn - n) - 1)) / (tn - n))) AS az
      |  FROM g, tot),
      |rk AS (
      |  SELECT az, CAST(count(*) OVER () AS BIGINT) AS m,
      |    CAST(row_number() OVER (ORDER BY az DESC, p_brand) AS BIGINT) AS rnk
      |  FROM z),
      |flagged AS (
      |  SELECT az, m, rnk,
      |    CASE WHEN az >= $cRank THEN 1 ELSE 0 END AS pass,
      |    CASE WHEN az >= $cBonf THEN 1 ELSE 0 END AS bonf,
      |    CASE WHEN az >= $cUn THEN 1 ELSE 0 END AS unadj
      |  FROM rk),
      |holm AS (
      |  SELECT *, min(pass) OVER (ORDER BY rnk
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS holm
      |  FROM flagged)
      |SELECT max(m) AS n_tests,
      |  CAST(sum(unadj) AS BIGINT) AS n_unadjusted,
      |  CAST(sum(bonf) AS BIGINT) AS n_bonferroni,
      |  CAST(sum(holm) AS BIGINT) AS n_holm,
      |  round(max(az), 4) AS max_abs_z
      |FROM holm""".stripMargin
  }

  /** C930 analytics_gompertz_fit — linearized Gompertz growth on
    * cumulative monthly revenue share: y_t = cum_t·50/(51·total)
    * (ceiling K = 1.02·total keeps the last point strictly interior),
    * ln(−ln y) quantized ·10⁹, bounded-frame OLS on t ⇒ ĉ = −slope,
    * b̂ = exp(intercept), inflection t* = ln(b)/c where growth peaks —
    * the S-curve every adoption/saturation forecast fits first.
    */
  def analyticsGompertzFit(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("v"))
    val tot = ms.agg(sum(col("v")).cast("decimal(38,0)").as("tv"))
    val w = Window.orderBy("m")
    val pts = ms
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(38,0)"))
      .crossJoin(broadcast(tot))
      .select(col("t"), expr(
        """CAST(floor(ln(-ln(CAST(cum AS DOUBLE) * 50 / (51 * CAST(tv AS DOUBLE)))) * 1e9 + 0.5) AS BIGINT)""")
        .as("x"))
    pts.agg(count(lit(1)).cast("long").as("k"),
        sum(col("t")).cast("long").as("st"),
        sum(expr("t * t")).cast("long").as("stt"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("stx"))
      .selectExpr("k AS n_months",
        """(CAST(k AS DOUBLE) * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
          |/ (CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) / 1e9 AS slope""".stripMargin,
        "(CAST(sx AS DOUBLE) / 1e9 / k - ((CAST(k AS DOUBLE) * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) / 1e9) * st / k) AS icept")
      .selectExpr("n_months",
        "round(-slope, 6) AS c_rate",
        "round(exp(icept), 6) AS b_shape",
        "round(icept / (-slope), 2) AS t_inflection_months",
        "round(exp(CAST(-1 AS DOUBLE)) * 51 / 50, 6) AS share_at_inflection")
  }
  val analyticsGompertzFitSql: String =
    """WITH ms AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS v
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS tv FROM ms),
      |pts AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t,
      |    CAST(floor(ln(-ln(CAST(sum(v) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      * 50 / (51 * CAST(tv AS DOUBLE)))) * 1e9 + 0.5) AS BIGINT) AS x
      |  FROM ms, tot),
      |fit AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS stt,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(t AS HUGEINT) * x) AS DECIMAL(38,0)) AS stx
      |  FROM pts),
      |lin AS (
      |  SELECT k,
      |    (CAST(k AS DOUBLE) * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / (CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) / 1e9 AS slope,
      |    (CAST(sx AS DOUBLE) / 1e9 / k - ((CAST(k AS DOUBLE) * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) / 1e9) * st / k) AS icept
      |  FROM fit)
      |SELECT k AS n_months,
      |  round(-slope, 6) AS c_rate,
      |  round(exp(icept), 6) AS b_shape,
      |  round(icept / (-slope), 2) AS t_inflection_months,
      |  round(exp(CAST(-1 AS DOUBLE)) * 51 / 50, 6) AS share_at_inflection
      |FROM lin""".stripMargin

  /** C931 win_expected_shortfall — 95% VaR and expected shortfall of
    * daily revenue returns: r_t = (vₜ−vₜ₋₁)/vₜ₋₁ over the calendar-
    * bounded daily frame, the worst ⌈5%⌉ returns by bounded-frame
    * rank, VaR = the boundary return, ES = the tail mean of
    * ·10⁹-quantized returns (exact integer mean). The coherent tail
    * measure Basel moved to when VaR's non-subadditivity bit — the
    * answer to "how bad is bad".
    */
  def winExpectedShortfall(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val w = Window.orderBy("day")
    val rets = days
      .withColumn("vp", lag(col("v"), 1).over(w))
      .filter(col("vp").isNotNull)
      .select(col("day"),
        expr("CAST(floor((CAST(v AS DOUBLE) - vp) / vp * 1e9 + 0.5) AS BIGINT)").as("rq"))
      .withColumn("rnk", row_number().over(Window.orderBy(col("rq").asc, col("day").asc)).cast("long"))
      .localCheckpoint(true) // ≤(calendar days) rows, 2 consumers (count + tail)
    val cnt = rets.agg(count(lit(1)).cast("long").as("n"))
    val tail = rets.crossJoin(broadcast(cnt))
      .filter(expr("rnk <= CAST(ceil(0.05 * n) AS BIGINT)"))
    tail.agg(max(col("n")).as("n"), count(lit(1)).cast("long").as("k"),
        max(col("rq")).as("varq"), sum(col("rq")).cast("long").as("sq"))
      .selectExpr("n AS n_returns", "k AS n_tail",
        "round(CAST(varq AS DOUBLE) / 1e9, 6) AS var_95",
        "round(CAST(sq AS DOUBLE) / k / 1e9, 6) AS es_95",
        "round(CAST(sq AS DOUBLE) / k / varq, 4) AS es_var_ratio")
  }
  val winExpectedShortfallSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |rets AS (
      |  SELECT day, CAST(floor((CAST(v AS DOUBLE) - vp) / vp * 1e9 + 0.5) AS BIGINT) AS rq
      |  FROM (SELECT day, v, lag(v) OVER (ORDER BY day) AS vp FROM days)
      |  WHERE vp IS NOT NULL),
      |rk AS (
      |  SELECT rq, CAST(row_number() OVER (ORDER BY rq, day) AS BIGINT) AS rnk,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM rets),
      |tail AS (SELECT * FROM rk WHERE rnk <= CAST(ceil(0.05 * n) AS BIGINT))
      |SELECT max(n) AS n_returns, CAST(count(*) AS BIGINT) AS n_tail,
      |  round(CAST(max(rq) AS DOUBLE) / 1e9, 6) AS var_95,
      |  round(CAST(sum(rq) AS DOUBLE) / count(*) / 1e9, 6) AS es_95,
      |  round(CAST(sum(rq) AS DOUBLE) / count(*) / max(rq), 4) AS es_var_ratio
      |FROM tail""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_erlang_b" -> (analyticsErlangB _),
    "stat_holm_bonferroni" -> (statHolmBonferroni _),
    "analytics_gompertz_fit" -> (analyticsGompertzFit _),
    "win_expected_shortfall" -> (winExpectedShortfall _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_erlang_b" -> analyticsErlangBSql,
    "stat_holm_bonferroni" -> statHolmBonferroniSql,
    "analytics_gompertz_fit" -> analyticsGompertzFitSql,
    "win_expected_shortfall" -> winExpectedShortfallSql,
  )
}
