package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 37 (C552–C555): unit-root and causality diagnostics on the
  * daily series, a fixed-point normality test, and calibration error
  * for the quality-score pipeline.
  */
object Extras137 {

  /** C552 stat_dickey_fuller — lag-0 Dickey–Fuller unit-root test on
    * daily revenue: Δc_t = α + ρ·c_{t−1}, t-stat for ρ̂. OLS collapses
    * to five exact DECIMAL(38,0) sums over the (lagged, diff) pair
    * frame, then ONE fixed-order IEEE chain — ρ = Num/Dx with
    * Num = nΣxy−ΣxΣy, Dx = nΣx²−(Σx)²; RSS = (Syyc − Num²/Dx)/n by
    * the centered identity; SE²(ρ̂) = (RSS/(n−2))·n/Dx — identical
    * doubles in both engines. Upstream is the Q1-shape group-by plus
    * a lag window over the bounded daily frame.
    */
  def statDickeyFuller(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    daily
      .withColumn("x", lag(col("c"), 1).over(Window.orderBy("day")))
      .filter(col("x").isNotNull)
      .selectExpr("x", "c - x AS y")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .selectExpr("n",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) AS num",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS dx",
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) AS syyc")
      .selectExpr("n AS n_obs",
        "round(num / dx, 9) AS rho",
        """round((num / dx) / sqrt((syyc - num / dx * num) / n / (n - 2)
          |  * n / dx), 6) AS df_t""".stripMargin,
        """CASE WHEN (num / dx) / sqrt((syyc - num / dx * num) / n / (n - 2)
          |  * n / dx) < -2.86 THEN 'reject_unit_root'
          |  ELSE 'unit_root_plausible' END AS verdict_5pct""".stripMargin)
  }
  val statDickeyFullerSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |pairs AS (
      |  SELECT lag(c, 1) OVER (ORDER BY day) AS x, c
      |  FROM daily),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(c - x AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |    sum(CAST(x AS DECIMAL(38,0)) * (c - x)) AS sxy,
      |    sum(CAST(c - x AS DECIMAL(38,0)) * (c - x)) AS syy
      |  FROM pairs WHERE x IS NOT NULL),
      |dd AS (
      |  SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) AS num,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS dx,
      |    CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) AS syyc
      |  FROM sums)
      |SELECT n AS n_obs, round(num / dx, 9) AS rho,
      |  round((num / dx) / sqrt((syyc - num / dx * num) / n / (n - 2)
      |    * n / dx), 6) AS df_t,
      |  CASE WHEN (num / dx) / sqrt((syyc - num / dx * num) / n / (n - 2)
      |    * n / dx) < -2.86 THEN 'reject_unit_root'
      |    ELSE 'unit_root_plausible' END AS verdict_5pct
      |FROM dd""".stripMargin

  /** C553 stat_granger_lag1 — does yesterday's ORDER VOLUME improve
    * the revenue forecast beyond yesterday's revenue (Granger lag-1)?
    * Restricted (w~1+u) vs unrestricted (w~1+u+v) OLS, both in closed
    * form from six exact n-scaled covariance sums Cab = nΣab − ΣaΣb
    * (DECIMAL(38,0) all the way — the largest, Cuu·Cvv, stays under
    * 10³⁴); the determinant algebra and the F-ratio
    * F = (RSSr − RSSu)(n−3)/RSSu run as one fixed-order DOUBLE chain
    * on those exact integers. Never materializes a residual column —
    * two model fits for the price of one aggregate.
    */
  def statGrangerLag1(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("c"),
        count(lit(1)).cast("long").as("v"))
    val w = Window.orderBy("day")
    daily
      .withColumn("u", lag(col("c"), 1).over(w))
      .withColumn("vl", lag(col("v"), 1).over(w))
      .filter(col("u").isNotNull)
      .selectExpr("u", "vl", "c AS w")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(u AS DECIMAL(38,0))")).as("su"),
        sum(expr("CAST(vl AS DECIMAL(38,0))")).as("sv"),
        sum(expr("CAST(w AS DECIMAL(38,0))")).as("sw"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"),
        sum(expr("CAST(vl AS DECIMAL(38,0)) * vl")).as("svv"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * vl")).as("suv"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * w")).as("suw"),
        sum(expr("CAST(vl AS DECIMAL(38,0)) * w")).as("svw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sww"))
      .selectExpr("n",
        "CAST(CAST(n AS DECIMAL(38,0)) * suu - su * su AS DOUBLE) AS cuu",
        "CAST(CAST(n AS DECIMAL(38,0)) * svv - sv * sv AS DOUBLE) AS cvv",
        "CAST(CAST(n AS DECIMAL(38,0)) * suv - su * sv AS DOUBLE) AS cuv",
        "CAST(CAST(n AS DECIMAL(38,0)) * suw - su * sw AS DOUBLE) AS cuw",
        "CAST(CAST(n AS DECIMAL(38,0)) * svw - sv * sw AS DOUBLE) AS cvw",
        "CAST(CAST(n AS DECIMAL(38,0)) * sww - sw * sw AS DOUBLE) AS cww")
      .selectExpr("n", "cuw", "cvw", "cww", "cuu",
        "cuu * cvv - cuv * cuv AS det",
        "cvv * cuw - cuv * cvw AS b1n",
        "cuu * cvw - cuv * cuw AS b2n")
      .selectExpr("n",
        "(cww - b1n / det * cuw - b2n / det * cvw) / n AS rss_u",
        "(cww - cuw / cuu * cuw) / n AS rss_r",
        "b2n / det AS b2")
      .selectExpr("n AS n_obs",
        "round(b2, 9) AS lag_volume_coef",
        "round((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat",
        """CASE WHEN (rss_r - rss_u) * (n - 3) / rss_u > 3.8415
          |  THEN 'granger_signif_5pct' ELSE 'not_signif' END
          |  AS verdict""".stripMargin)
  }
  val statGrangerLag1Sql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |lagged AS (
      |  SELECT lag(c, 1) OVER (ORDER BY day) AS u,
      |    lag(v, 1) OVER (ORDER BY day) AS vl, c AS w
      |  FROM daily),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(u AS DECIMAL(38,0))) AS su,
      |    sum(CAST(vl AS DECIMAL(38,0))) AS sv,
      |    sum(CAST(w AS DECIMAL(38,0))) AS sw,
      |    sum(CAST(u AS DECIMAL(38,0)) * u) AS suu,
      |    sum(CAST(vl AS DECIMAL(38,0)) * vl) AS svv,
      |    sum(CAST(u AS DECIMAL(38,0)) * vl) AS suv,
      |    sum(CAST(u AS DECIMAL(38,0)) * w) AS suw,
      |    sum(CAST(vl AS DECIMAL(38,0)) * w) AS svw,
      |    sum(CAST(w AS DECIMAL(38,0)) * w) AS sww
      |  FROM lagged WHERE u IS NOT NULL),
      |cc AS (
      |  SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * suu - su * su AS DOUBLE) AS cuu,
      |    CAST(CAST(n AS DECIMAL(38,0)) * svv - sv * sv AS DOUBLE) AS cvv,
      |    CAST(CAST(n AS DECIMAL(38,0)) * suv - su * sv AS DOUBLE) AS cuv,
      |    CAST(CAST(n AS DECIMAL(38,0)) * suw - su * sw AS DOUBLE) AS cuw,
      |    CAST(CAST(n AS DECIMAL(38,0)) * svw - sv * sw AS DOUBLE) AS cvw,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sww - sw * sw AS DOUBLE) AS cww
      |  FROM sums),
      |fit AS (
      |  SELECT n, cuw, cvw, cww, cuu,
      |    cuu * cvv - cuv * cuv AS det,
      |    cvv * cuw - cuv * cvw AS b1n,
      |    cuu * cvw - cuv * cuw AS b2n
      |  FROM cc),
      |rss AS (
      |  SELECT n,
      |    (cww - b1n / det * cuw - b2n / det * cvw) / n AS rss_u,
      |    (cww - cuw / cuu * cuw) / n AS rss_r,
      |    b2n / det AS b2
      |  FROM fit)
      |SELECT n AS n_obs, round(b2, 9) AS lag_volume_coef,
      |  round((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat,
      |  CASE WHEN (rss_r - rss_u) * (n - 3) / rss_u > 3.8415
      |    THEN 'granger_signif_5pct' ELSE 'not_signif' END AS verdict
      |FROM rss""".stripMargin

  /** C554 stat_shapiro_francia — Shapiro–Francia normality W′ for
    * daily revenue. The Blom scores m_i = Φ⁻¹((i−0.375)/(n+0.25)) use
    * the A&S 26.2.23 rational probit (ln+sqrt only) and are QUANTIZED
    * to nano fixed-point (floor(m·10⁹+0.5) — the CoPurchaseStage wfx
    * idiom), so Σm·x and Σm² are EXACT DECIMAL(38,0) sums (no
    * cross-engine float-summation-order hazard; the 10¹⁸ scale factor
    * cancels in the ratio) and W′ = n·(Σmx)²/(Σm²·Sxxc) is one final
    * IEEE chain. Rank pairing ties are value-identical, hence
    * W′-invariant.
    */
  def statShapiroFrancia(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val ranked = daily
      .withColumn("i", row_number().over(Window.orderBy("c", "day")).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
      .withColumn("p", expr("(i - 0.375) / (nn + 0.25)"))
      .withColumn("q", expr("CASE WHEN p <= 0.5 THEN p ELSE 1 - p END"))
      .withColumn("t", expr("sqrt(-2 * ln(q))"))
      .withColumn("z", expr(
        """t - (2.30753 + 0.27061 * t)
          |  / (1 + 0.99229 * t + 0.04481 * t * t)""".stripMargin))
      .withColumn("mfx", expr(
        "CAST(floor((CASE WHEN p <= 0.5 THEN -z ELSE z END) * 1e9 + 0.5) AS BIGINT)"))
    ranked.agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(mfx AS DECIMAL(38,0)) * c")).as("smx"),
        sum(expr("CAST(mfx AS DECIMAL(38,0)) * mfx")).as("smm"),
        sum(expr("CAST(c AS DECIMAL(38,0))")).as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
      .selectExpr("n",
        "CAST(smx AS DOUBLE) AS smxd", "CAST(smm AS DOUBLE) AS smmd",
        "CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE) AS sxxc")
      .selectExpr("n AS n_days",
        "round(n * (smxd / smmd * smxd) / sxxc, 6) AS w_prime")
  }
  val statShapiroFranciaSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |ranked AS (
      |  SELECT c, row_number() OVER (ORDER BY c, day) AS i,
      |    count(*) OVER () AS nn
      |  FROM daily),
      |scored AS (
      |  SELECT c, (i - 0.375) / (nn + 0.25) AS p FROM ranked),
      |zs AS (
      |  SELECT c, p,
      |    sqrt(-2 * ln(CASE WHEN p <= 0.5 THEN p ELSE 1 - p END)) AS t
      |  FROM scored),
      |mf AS (
      |  SELECT c,
      |    CAST(floor((CASE WHEN p <= 0.5 THEN
      |        -(t - (2.30753 + 0.27061 * t)
      |          / (1 + 0.99229 * t + 0.04481 * t * t))
      |      ELSE
      |        (t - (2.30753 + 0.27061 * t)
      |          / (1 + 0.99229 * t + 0.04481 * t * t))
      |      END) * 1e9 + 0.5) AS BIGINT) AS mfx
      |  FROM zs),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(mfx AS DECIMAL(38,0)) * c) AS smx,
      |    sum(CAST(mfx AS DECIMAL(38,0)) * mfx) AS smm,
      |    sum(CAST(c AS DECIMAL(38,0))) AS sc,
      |    sum(CAST(c AS DECIMAL(38,0)) * c) AS scc
      |  FROM mf)
      |SELECT n AS n_days,
      |  round(n * (CAST(smx AS DOUBLE) / CAST(smm AS DOUBLE)
      |    * CAST(smx AS DOUBLE))
      |    / CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE), 6)
      |    AS w_prime
      |FROM sums""".stripMargin

  /** C555 pipeline_calibration_ece — reliability diagram + expected
    * calibration error for the C1 quality score as a predictor of
    * "long document" (n_chars above the corpus lower median). The
    * confidence is the exact PPM integer
    * q_ppm = 7000·min(tok,100) + (300000·stop) div tok; bins are
    * q_ppm div 10⁵; per-bin |accuracy − confidence| clears
    * denominators to |lc·10⁶ − Σq_ppm| (EXACT integers), so
    * ECE = Σ|…|/(10⁶·N) is a single final IEEE division — no per-bin
    * float accumulation anywhere. Median via the value-frequency
    * histogram (bounded distinct frame), never a corpus sort.
    */
  def pipelineCalibrationEce(s: SparkSession, d: String): DataFrame = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    val scored = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("tok", size(col("toks")).cast("long"))
      .withColumn("stop",
        size(expr(s"filter(toks, t -> t IN $stopSql)")).cast("long"))
      .select(col("n_chars"),
        expr("7000 * least(tok, 100L) + (300000 * stop) div tok").as("q_ppm"))
    val hist = scored.groupBy("n_chars").agg(count(lit(1)).as("f"))
      .withColumn("cum", sum(col("f")).over(
        Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
    val tot = scored.agg(count(lit(1)).cast("long").as("nn"))
    val med = hist.crossJoin(broadcast(tot))
      .filter(expr("cum >= (nn + 1) div 2"))
      .agg(min(col("n_chars")).cast("long").as("med"))
    val binned = scored.crossJoin(broadcast(med))
      .selectExpr("least(q_ppm div 100000, 9) AS bin", "q_ppm",
        "CASE WHEN n_chars > med THEN 1L ELSE 0L END AS label")
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("label")).cast("long").as("lc"),
        sum(col("q_ppm")).cast("long").as("sq"))
    val eceTot = binned.agg(
      sum(expr("abs(lc * 1000000 - sq)")).cast("long").as("num"),
      sum(col("n_docs")).cast("long").as("nd"))
    binned.crossJoin(broadcast(eceTot))
      .selectExpr("bin", "n_docs",
        "round(CAST(sq AS DOUBLE) / n_docs / 1000000, 6) AS avg_conf",
        "round(CAST(lc AS DOUBLE) / n_docs, 6) AS frac_pos",
        "round(CAST(abs(lc * 1000000 - sq) AS DOUBLE) / 1000000 / n_docs, 6) AS bin_gap",
        "round(CAST(num AS DOUBLE) / 1000000 / nd, 6) AS ece")
      .orderBy("bin")
  }
  val pipelineCalibrationEceSql: String = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    s"""WITH scored AS (
       |  SELECT n_chars,
       |    7000 * least(CAST(len(string_split(text, ' ')) AS BIGINT), 100)
       |      + (300000 * CAST(len(list_filter(string_split(text, ' '),
       |          t -> t IN $stopSql)) AS BIGINT))
       |        // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_ppm
       |  FROM documents),
       |hist AS (
       |  SELECT n_chars, count(*) AS f,
       |    sum(count(*)) OVER (ORDER BY n_chars
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM scored GROUP BY n_chars),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM scored),
       |med AS (
       |  SELECT CAST(min(n_chars) AS BIGINT) AS med
       |  FROM hist, tot WHERE cum >= (nn + 1) // 2),
       |binned AS (
       |  SELECT least(q_ppm // 100000, 9) AS bin,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN n_chars > med THEN 1 ELSE 0 END) AS BIGINT) AS lc,
       |    CAST(sum(q_ppm) AS BIGINT) AS sq
       |  FROM scored, med GROUP BY 1),
       |etot AS (
       |  SELECT CAST(sum(abs(lc * 1000000 - sq)) AS BIGINT) AS num,
       |    CAST(sum(n_docs) AS BIGINT) AS nd
       |  FROM binned)
       |SELECT bin, n_docs,
       |  round(CAST(sq AS DOUBLE) / n_docs / 1000000, 6) AS avg_conf,
       |  round(CAST(lc AS DOUBLE) / n_docs, 6) AS frac_pos,
       |  round(CAST(abs(lc * 1000000 - sq) AS DOUBLE) / 1000000 / n_docs, 6)
       |    AS bin_gap,
       |  round(CAST(num AS DOUBLE) / 1000000 / nd, 6) AS ece
       |FROM binned, etot ORDER BY bin""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_dickey_fuller" -> (statDickeyFuller _),
    "stat_granger_lag1" -> (statGrangerLag1 _),
    "stat_shapiro_francia" -> (statShapiroFrancia _),
    "pipeline_calibration_ece" -> (pipelineCalibrationEce _),
  )

  val oracle: Map[String, String] = Map(
    "stat_dickey_fuller" -> statDickeyFullerSql,
    "stat_granger_lag1" -> statGrangerLag1Sql,
    "stat_shapiro_francia" -> statShapiroFranciaSql,
    "pipeline_calibration_ece" -> pipelineCalibrationEceSql,
  )
}
