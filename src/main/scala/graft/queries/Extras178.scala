package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 78 (C716–C719): nonlinear/diagnostic time-series tooling on
  * the daily-revenue series — recurrence quantification (RR + DET),
  * the tsfresh-style nonlinearity battery, White's heteroskedasticity
  * test, and Goldfeld–Quandt.
  *
  * Shared discipline: the day frame is calendar-bounded (every window
  * sits above an aggregate); recurrence CANDIDATES come from a
  * value-bucket equi-join (|cᵢ−cⱼ| ≤ ε ⇒ buckets within 1 — the same
  * neighbor-bucket trick the dedup tiers use, never an all-pairs
  * theta join); third-moment products stay exact in DECIMAL(38,0);
  * OLS diagnostics use closed 2×2 normal-equation forms over
  * quantized per-row doubles.
  */
object Extras178 {

  /** Exact daily revenue cents with a dense day index. */
  private def dayFrame(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    bars.withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
  }
  private val dayFrameSql: String =
    """bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |df AS (
      |  SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars)""".stripMargin

  /** C716 time_recurrence_quantification — RR and DET of the revenue
    * series at ε = range/10: recurrent pairs (i<j, |cᵢ−cⱼ| ≤ ε) found
    * by exploding each row to its 3 candidate value buckets and
    * equi-joining (exact |·|≤ε refilter), then DET as the fraction of
    * recurrent pairs lying on a diagonal line of length ≥ 2 (the pair
    * or its predecessor (i−1,j−1) also recurrent — one more equi-join
    * on the shifted key). High DET = deterministic structure; RR alone
    * is just amplitude clustering.
    */
  def timeRecurrenceQuantification(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      expr("max(c) - min(c)").cast("long").as("range"))
    val withEps = f.crossJoin(broadcast(tot))
      .withColumn("eps", expr("greatest(range div 10, 1L)"))
      .withColumn("b", expr("c div eps"))
    val probes = withEps
      .select(col("rn").as("i"), col("c").as("ci"), col("eps"), col("n"),
        explode(expr("array(b - 1, b, b + 1)")).as("bp"))
    val targets = withEps.select(col("rn").as("j"), col("c").as("cj"), col("b").as("bj"))
    val pairs = probes.join(targets,
        expr("bj = bp AND j > i AND abs(ci - cj) <= eps"))
      .select(col("i"), col("j"), col("n"))
    val diag = pairs.select(col("i"), col("j")).withColumnRenamed("i", "i2")
      .withColumnRenamed("j", "j2")
    val det = pairs.as("p")
      .join(diag.as("nx"), expr("nx.i2 = p.i + 1 AND nx.j2 = p.j + 1"), "left")
      .join(diag.as("pv"), expr("pv.i2 = p.i - 1 AND pv.j2 = p.j - 1"), "left")
      .agg(max(col("p.n")).as("n"),
        count(lit(1)).cast("long").as("n_pairs"),
        sum(expr("CASE WHEN nx.i2 IS NOT NULL OR pv.i2 IS NOT NULL THEN 1L ELSE 0L END"))
          .cast("long").as("n_diag"))
    det.selectExpr("n", "n_pairs",
      "round(CAST(n_pairs AS DOUBLE) * 2 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS rr",
      "round(CAST(n_diag AS DOUBLE) / n_pairs, 6) AS det")
  }
  val timeRecurrenceQuantificationSql: String =
    s"""WITH $dayFrameSql,
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(c) - min(c) AS BIGINT) AS range FROM df),
      |we AS (
      |  SELECT df.*, t.n, greatest(t.range // 10, 1) AS eps,
      |    c // greatest(t.range // 10, 1) AS b
      |  FROM df, tot t),
      |probes AS (
      |  SELECT rn AS i, c AS ci, eps, n, unnest([b - 1, b, b + 1]) AS bp FROM we),
      |pairs AS (
      |  SELECT p.i, t.rn AS j, p.n
      |  FROM probes p JOIN we t ON t.b = p.bp
      |  WHERE t.rn > p.i AND abs(p.ci - t.c) <= p.eps),
      |agg AS (
      |  SELECT max(p.n) AS n, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN nx.i IS NOT NULL OR pv.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_diag
      |  FROM pairs p
      |  LEFT JOIN pairs nx ON nx.i = p.i + 1 AND nx.j = p.j + 1
      |  LEFT JOIN pairs pv ON pv.i = p.i - 1 AND pv.j = p.j - 1)
      |SELECT n, n_pairs,
      |  round(CAST(n_pairs AS DOUBLE) * 2 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS rr,
      |  round(CAST(n_diag AS DOUBLE) / n_pairs, 6) AS det
      |FROM agg""".stripMargin

  /** C717 time_tsfresh_battery — the four workhorse nonlinearity
    * features over the day series in one pass: c3 (lag-1 triple
    * product, EXACT — cents³ fits DECIMAL(38,0)), CID-CE complexity
    * (√Σdiff²), mean |Δ|, and the time-reversal asymmetry statistic
    * E[x²ₜ₊₂xₜ₊₁ − xₜ₊₁x²ₜ] — a nonzero value certifies the series is
    * not time-reversible (no linear Gaussian process generates it).
    * Dollar-scaled at the very end.
    */
  def timeTsfreshBattery(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val w = Window.orderBy("rn")
    f.withColumn("c1", lead(col("c"), 1).over(w))
      .withColumn("c2", lead(col("c"), 2).over(w))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN CAST(c AS DECIMAL(38,0)) * c1 * c2 END"))
          .cast("decimal(38,0)").as("c3s"),
        sum(expr("CASE WHEN c2 IS NOT NULL THEN 1L ELSE 0L END")).cast("long").as("n3"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN CAST(c1 - c AS DECIMAL(38,0)) * (c1 - c) END"))
          .cast("decimal(38,0)").as("d2s"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN abs(c1 - c) END")).cast("decimal(38,0)").as("ads"),
        sum(expr("CASE WHEN c1 IS NOT NULL THEN 1L ELSE 0L END")).cast("long").as("n2"),
        sum(expr(
          """CASE WHEN c2 IS NOT NULL THEN
            |  CAST(c2 AS DECIMAL(38,0)) * c2 * c1 - CAST(c1 AS DECIMAL(38,0)) * c * c END""".stripMargin))
          .cast("decimal(38,0)").as("trevs"))
      .selectExpr("n",
        "round(CAST(c3s AS DOUBLE) / n3 / 1e18, 4) AS c3_lag1",
        "round(sqrt(CAST(d2s AS DOUBLE)) / 1e6, 4) AS cid_ce",
        "round(CAST(ads AS DOUBLE) / n2 / 1e6, 4) AS mean_abs_change",
        "round(CAST(trevs AS DOUBLE) / n3 / 1e18, 4) AS time_rev_asym")
  }
  val timeTsfreshBatterySql: String =
    s"""WITH $dayFrameSql,
      |lagd AS (
      |  SELECT c, lead(c, 1) OVER (ORDER BY rn) AS c1,
      |    lead(c, 2) OVER (ORDER BY rn) AS c2
      |  FROM df),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN CAST(c AS DECIMAL(38,0)) * c1 * c2 END) AS DECIMAL(38,0)) AS c3s,
      |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN CAST(c1 - c AS DECIMAL(38,0)) * (c1 - c) END) AS DECIMAL(38,0)) AS d2s,
      |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN abs(c1 - c) END) AS DECIMAL(38,0)) AS ads,
      |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN
      |      CAST(c2 AS DECIMAL(38,0)) * c2 * c1 - CAST(c1 AS DECIMAL(38,0)) * c * c END) AS DECIMAL(38,0)) AS trevs
      |  FROM lagd)
      |SELECT n,
      |  round(CAST(c3s AS DOUBLE) / n3 / 1e18, 4) AS c3_lag1,
      |  round(sqrt(CAST(d2s AS DOUBLE)) / 1e6, 4) AS cid_ce,
      |  round(CAST(ads AS DOUBLE) / n2 / 1e6, 4) AS mean_abs_change,
      |  round(CAST(trevs AS DOUBLE) / n3 / 1e18, 4) AS time_rev_asym
      |FROM agg""".stripMargin

  /** C718 stat_white_test — White's heteroskedasticity test on the
    * day-trend OLS: residuals from the closed-form fit of revenue on
    * t, then R² of e² on (t, t²) via the closed 2×2 normal-equation
    * solve (centred cross-sums quantized at 1e2 before summing);
    * LM = n·R² ~ χ²(2). The regression-diagnostics sibling of the
    * Breusch–Pagan row, catching variance curvature BP's linear form
    * misses.
    */
  def statWhiteTest(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val ols = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("rn")).cast("decimal(38,0)").as("st"),
      sum(expr("CAST(rn AS DECIMAL(38,0)) * rn")).cast("decimal(38,0)").as("stt"),
      sum(col("c")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(rn AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("sty"))
      .selectExpr("n", "st", "sy",
        """(CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b""".stripMargin)
      .selectExpr("n", "b",
        "(CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) / n AS a")
    // e2 is quantized ONCE per row (floor → LONG is safe at this
    // magnitude; floor of e2·v or e2² would CLAMP at Long.MaxValue —
    // Spark's floor(double) returns LONG), and the cross-moments are
    // EXACT DECIMAL products of the quantized value, which also makes
    // the centred cww non-negative by construction.
    f.crossJoin(broadcast(ols))
      .withColumn("e2", expr("(c - a - b * rn) * (c - a - b * rn) / 1e4")) // dollars²
      .withColumn("qe", expr("CAST(floor(e2 * 1e2 + 0.5) AS DECIMAL(38,0))"))
      .agg(max(col("n")).as("n"),
        sum(col("qe")).cast("decimal(38,0)").as("sw"),
        sum(expr("qe * rn")).cast("decimal(38,0)").as("swu"),
        sum(expr("qe * rn * rn")).cast("decimal(38,0)").as("swv"),
        sum(expr("qe * qe")).cast("decimal(38,0)").as("sww"),
        sum(col("rn")).cast("decimal(38,0)").as("su"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn")).cast("decimal(38,0)").as("suu"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn")).cast("decimal(38,0)").as("sv"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn * rn * rn")).cast("decimal(38,0)").as("svv"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn * rn")).cast("decimal(38,0)").as("suv"))
      .selectExpr("n",
        "CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) / n AS cuu",
        "CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n AS cvv",
        "CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE) / n AS cuv",
        "CAST(swu AS DOUBLE) / 1e2 - CAST(su AS DOUBLE) * (CAST(sw AS DOUBLE) / 1e2) / n AS cuw",
        "CAST(swv AS DOUBLE) / 1e2 - CAST(sv AS DOUBLE) * (CAST(sw AS DOUBLE) / 1e2) / n AS cvw",
        "CAST(sww AS DOUBLE) / 1e4 - (CAST(sw AS DOUBLE) / 1e2) * (CAST(sw AS DOUBLE) / 1e2) / n AS cww")
      .selectExpr("n",
        """(cvv * cuw * cuw - 2 * cuv * cuw * cvw + cuu * cvw * cvw)
          |/ (cuu * cvv - cuv * cuv) / cww AS r2""".stripMargin)
      .selectExpr("n", "round(r2, 6) AS r2",
        "round(CAST(n AS DOUBLE) * r2, 4) AS white_lm", "2 AS df")
  }
  val statWhiteTestSql: String =
    s"""WITH $dayFrameSql,
      |ols0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(rn) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn) AS DECIMAL(38,0)) AS stt,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sty
      |  FROM df),
      |ols1 AS (
      |  SELECT n, st, sy,
      |    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
      |  FROM ols0),
      |ols AS (SELECT n, b, (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) / n AS a FROM ols1),
      |rows0 AS (
      |  SELECT o.n, rn,
      |    CAST(floor((c - o.a - o.b * rn) * (c - o.a - o.b * rn) / 1e4 * 1e2 + 0.5) AS DECIMAL(38,0)) AS qe
      |  FROM df, ols o),
      |agg AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(qe) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(qe * rn) AS DECIMAL(38,0)) AS swu,
      |    CAST(sum(qe * rn * rn) AS DECIMAL(38,0)) AS swv,
      |    CAST(sum(qe * qe) AS DECIMAL(38,0)) AS sww,
      |    CAST(sum(rn) AS DECIMAL(38,0)) AS su,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn) AS DECIMAL(38,0)) AS suu,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn * rn * rn) AS DECIMAL(38,0)) AS svv,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn * rn) AS DECIMAL(38,0)) AS suv
      |  FROM rows0),
      |cen AS (
      |  SELECT n,
      |    CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) / n AS cuu,
      |    CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n AS cvv,
      |    CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE) / n AS cuv,
      |    CAST(swu AS DOUBLE) / 1e2 - CAST(su AS DOUBLE) * (CAST(sw AS DOUBLE) / 1e2) / n AS cuw,
      |    CAST(swv AS DOUBLE) / 1e2 - CAST(sv AS DOUBLE) * (CAST(sw AS DOUBLE) / 1e2) / n AS cvw,
      |    CAST(sww AS DOUBLE) / 1e4 - (CAST(sw AS DOUBLE) / 1e2) * (CAST(sw AS DOUBLE) / 1e2) / n AS cww
      |  FROM agg),
      |r AS (
      |  SELECT n,
      |    (cvv * cuw * cuw - 2 * cuv * cuw * cvw + cuu * cvw * cvw)
      |    / (cuu * cvv - cuv * cuv) / cww AS r2
      |  FROM cen)
      |SELECT n, round(r2, 6) AS r2,
      |  round(CAST(n AS DOUBLE) * r2, 4) AS white_lm, 2 AS df
      |FROM r""".stripMargin

  /** C719 stat_goldfeld_quandt — the ordered-split heteroskedasticity
    * F: separate closed-form OLS of revenue on t over the first and
    * last thirds of the calendar (middle third dropped), F = the
    * later segment's residual variance over the earlier one's — a
    * growing F says dispersion grows with the trend. Segment residual
    * sums via RSS = C_ww − C_tw²/C_tt in centred exact-cent sums.
    */
  def statGoldfeldQuandt(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val tot = f.agg(count(lit(1)).cast("long").as("n"))
    val seg = f.crossJoin(broadcast(tot))
      .withColumn("seg", expr(
        "CASE WHEN rn <= n div 3 THEN 1 WHEN rn > n - n div 3 THEN 2 END"))
      .filter(col("seg").isNotNull)
    seg.groupBy("seg")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("rn")).cast("decimal(38,0)").as("st"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * rn")).cast("decimal(38,0)").as("stt"),
        sum(col("c")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("sty"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("syy"))
      .selectExpr("seg", "m",
        "CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / m AS ctt",
        "CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) / m AS cty",
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m AS cyy")
      .selectExpr("seg", "m", "(cyy - cty * cty / ctt) / 1e4 AS rss") // dollars²
      .agg(max(expr("CASE WHEN seg = 1 THEN m END")).as("n1"),
        max(expr("CASE WHEN seg = 2 THEN m END")).as("n2"),
        max(expr("CASE WHEN seg = 1 THEN rss END")).as("rss1"),
        max(expr("CASE WHEN seg = 2 THEN rss END")).as("rss2"))
      .selectExpr("n1", "n2",
        "round(rss1 / (n1 - 2), 2) AS mse1",
        "round(rss2 / (n2 - 2), 2) AS mse2",
        "round((rss2 / (n2 - 2)) / (rss1 / (n1 - 2)), 6) AS gq_f")
  }
  val statGoldfeldQuandtSql: String =
    s"""WITH $dayFrameSql,
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM df),
      |sg AS (
      |  SELECT df.*,
      |    CASE WHEN rn <= t.n // 3 THEN 1 WHEN rn > t.n - t.n // 3 THEN 2 END AS seg
      |  FROM df, tot t
      |  WHERE rn <= t.n // 3 OR rn > t.n - t.n // 3),
      |g AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(rn) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * rn) AS DECIMAL(38,0)) AS stt,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(rn AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sty,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS syy
      |  FROM sg GROUP BY 1),
      |cen AS (
      |  SELECT seg, m,
      |    CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / m AS ctt,
      |    CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) / m AS cty,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m AS cyy
      |  FROM g),
      |rss AS (SELECT seg, m, (cyy - cty * cty / ctt) / 1e4 AS rss FROM cen)
      |SELECT max(CASE WHEN seg = 1 THEN m END) AS n1,
      |  max(CASE WHEN seg = 2 THEN m END) AS n2,
      |  round(max(CASE WHEN seg = 1 THEN rss END) / (max(CASE WHEN seg = 1 THEN m END) - 2), 2) AS mse1,
      |  round(max(CASE WHEN seg = 2 THEN rss END) / (max(CASE WHEN seg = 2 THEN m END) - 2), 2) AS mse2,
      |  round((max(CASE WHEN seg = 2 THEN rss END) / (max(CASE WHEN seg = 2 THEN m END) - 2))
      |    / (max(CASE WHEN seg = 1 THEN rss END) / (max(CASE WHEN seg = 1 THEN m END) - 2)), 6) AS gq_f
      |FROM rss""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_recurrence_quantification" -> (timeRecurrenceQuantification _),
    "time_tsfresh_battery" -> (timeTsfreshBattery _),
    "stat_white_test" -> (statWhiteTest _),
    "stat_goldfeld_quandt" -> (statGoldfeldQuandt _),
  )

  val oracle: Map[String, String] = Map(
    "time_recurrence_quantification" -> timeRecurrenceQuantificationSql,
    "time_tsfresh_battery" -> timeTsfreshBatterySql,
    "stat_white_test" -> statWhiteTestSql,
    "stat_goldfeld_quandt" -> statGoldfeldQuandtSql,
  )
}
