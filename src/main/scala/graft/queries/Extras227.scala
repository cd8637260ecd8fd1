package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 127 (C912–C915): forecast accuracy + process capability +
  * proportion effect size + the k-sample median test — the sMAPE/WAPE/
  * Theil-U2/tracking-signal battery, Cp/Cpk against a commissioning-
  * year design center, Cohen's h, and Mood's median χ².
  *
  * Shared discipline: every per-period ratio is quantized ·10⁹ before
  * its corpus mean (engine-identical doubles from exact cent integers);
  * WAPE/tracking-signal stay pure integer rationals; the grand median
  * comes off GlobalRank (never a corpus-scale single-task window); the
  * 5×2 median-test table is exact integer counts.
  */
object Extras227 {

  /** C912 time_forecast_accuracy — the four standard accuracy metrics
    * for the lag-12 seasonal-naive forecast of monthly revenue:
    * sMAPE (mean of per-month 2|e|/(v+f), each ·10⁹-quantized),
    * WAPE = Σ|e|/Σv (exact integer rational), Theil's U2 vs the naive
    * random walk (per-term squared relative errors quantized ·10⁹),
    * and the tracking signal Σe/MAD(e) = m·Σe/Σ|e| (exact rational).
    * The quartet a forecast-governance review quotes beside MASE
    * (C863's complement).
    */
  def timeForecastAccuracy(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val w = Window.orderBy("m")
    val fc = ms
      .withColumn("f", lag(col("v"), 12).over(w))
      .withColumn("vp", lag(col("v"), 1).over(w))
      .filter(col("f").isNotNull && col("vp").isNotNull)
    fc.agg(count(lit(1)).cast("long").as("mfc"),
        sum(expr("abs(v - f)")).cast("decimal(38,0)").as("sae"),
        sum(col("v")).cast("decimal(38,0)").as("sv"),
        sum(expr("v - f")).cast("decimal(38,0)").as("se"),
        sum(expr(
          """CAST(floor(CAST(2 AS DOUBLE) * abs(v - f) / (CAST(v AS DOUBLE) + f) * 1e9 + 0.5) AS BIGINT)"""))
          .cast("long").as("smq"),
        sum(expr(
          """CAST(floor((CAST(f AS DOUBLE) - v) / vp * ((CAST(f AS DOUBLE) - v) / vp) * 1e9 + 0.5) AS BIGINT)"""))
          .cast("long").as("u2n"),
        sum(expr(
          """CAST(floor((CAST(v AS DOUBLE) - vp) / vp * ((CAST(v AS DOUBLE) - vp) / vp) * 1e9 + 0.5) AS BIGINT)"""))
          .cast("long").as("u2d"))
      .selectExpr("mfc AS n_forecasts",
        "round(CAST(smq AS DOUBLE) / mfc / 1e9, 6) AS smape",
        "round(CAST(sae AS DOUBLE) / CAST(sv AS DOUBLE), 6) AS wape",
        "round(sqrt(CAST(u2n AS DOUBLE) / u2d), 6) AS theil_u2",
        "round(CAST(mfc AS DOUBLE) * CAST(se AS DOUBLE) / CAST(sae AS DOUBLE), 4) AS tracking_signal")
  }
  val timeForecastAccuracySql: String =
    """WITH ms AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |fc AS (
      |  SELECT * FROM (
      |    SELECT v, lag(v, 12) OVER (ORDER BY m) AS f, lag(v, 1) OVER (ORDER BY m) AS vp
      |    FROM ms)
      |  WHERE f IS NOT NULL AND vp IS NOT NULL),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS mfc,
      |    CAST(sum(CAST(abs(v - f) AS HUGEINT)) AS DECIMAL(38,0)) AS sae,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(v - f AS HUGEINT)) AS DECIMAL(38,0)) AS se,
      |    CAST(sum(CAST(floor(CAST(2 AS DOUBLE) * abs(v - f) / (CAST(v AS DOUBLE) + f) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS smq,
      |    CAST(sum(CAST(floor((CAST(f AS DOUBLE) - v) / vp * ((CAST(f AS DOUBLE) - v) / vp) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS u2n,
      |    CAST(sum(CAST(floor((CAST(v AS DOUBLE) - vp) / vp * ((CAST(v AS DOUBLE) - vp) / vp) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS u2d
      |  FROM fc)
      |SELECT mfc AS n_forecasts,
      |  round(CAST(smq AS DOUBLE) / mfc / 1e9, 6) AS smape,
      |  round(CAST(sae AS DOUBLE) / CAST(sv AS DOUBLE), 6) AS wape,
      |  round(sqrt(CAST(u2n AS DOUBLE) / u2d), 6) AS theil_u2,
      |  round(CAST(mfc AS DOUBLE) * CAST(se AS DOUBLE) / CAST(sae AS DOUBLE), 4) AS tracking_signal
      |FROM agg""".stripMargin

  /** C913 stat_process_capability — Cp/Cpk of daily revenue against a
    * DESIGN center: spec limits 0.7·m₀ / 1.3·m₀ where m₀ is the 1995
    * commissioning-year daily mean (so later drift separates Cpk from
    * Cp — symmetric-around-current-mean limits would pin them equal),
    * σ from exact cent moments, plus the observed fraction of days
    * beyond the limits and the drift ratio μ/m₀. The process-health
    * summary an SPC rollout reports above its control charts (C893).
    */
  def statProcessCapability(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val m0 = days.filter(expr("year(day) = 1995"))
      .agg((sum(col("v")).cast("decimal(38,0)").cast("double")
        / count(lit(1))).as("m0"))
    val mom = days.crossJoin(broadcast(m0))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"),
        sum(expr(
          "CASE WHEN CAST(v AS DOUBLE) < 0.7 * m0 OR CAST(v AS DOUBLE) > 1.3 * m0 THEN 1L ELSE 0L END"))
          .cast("long").as("beyond"),
        max(col("m0")).as("m0"))
    mom.selectExpr("n AS n_days", "m0",
        "CAST(s1 AS DOUBLE) / n AS mu",
        """sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
          | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1))) AS sd""".stripMargin,
        "beyond")
      .selectExpr("n_days",
        "round((1.3 * m0 - 0.7 * m0) / (6 * sd), 4) AS cp",
        "round(least(1.3 * m0 - mu, mu - 0.7 * m0) / (3 * sd), 4) AS cpk",
        "round(CAST(beyond AS DOUBLE) / n_days, 6) AS pct_beyond",
        "round(mu / m0, 6) AS drift_ratio")
  }
  val statProcessCapabilitySql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |m00 AS (
      |  SELECT CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS m0
      |  FROM days WHERE year(day) = 1995),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CASE WHEN CAST(v AS DOUBLE) < 0.7 * m0 OR CAST(v AS DOUBLE) > 1.3 * m0 THEN 1 ELSE 0 END) AS BIGINT) AS beyond,
      |    max(m0) AS m0
      |  FROM days, m00),
      |fin AS (
      |  SELECT n, m0, beyond,
      |    CAST(s1 AS DOUBLE) / n AS mu,
      |    sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (n - 1))) AS sd
      |  FROM mom)
      |SELECT n AS n_days,
      |  round((1.3 * m0 - 0.7 * m0) / (6 * sd), 4) AS cp,
      |  round(least(1.3 * m0 - mu, mu - 0.7 * m0) / (3 * sd), 4) AS cpk,
      |  round(CAST(beyond AS DOUBLE) / n, 6) AS pct_beyond,
      |  round(mu / m0, 6) AS drift_ratio
      |FROM fin""".stripMargin

  /** C914 stat_cohen_h — the arcsine effect size for two proportions:
    * return rate of discounted (≥5%) vs undiscounted lineitems,
    * h = 2·asin√p₁ − 2·asin√p₂ with SE √(1/n₁+1/n₂) and the
    * conventional negligible/small/medium/large bands. The scale-free
    * companion every two-proportion z-test should report — equal
    * p-gaps near 0 or ½ are NOT equal effects.
    */
  def statCohenH(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .select(expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("grp"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("r"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("r")).cast("long").as("k"))
    val a = g.filter(col("grp") === 1L).selectExpr("n AS n1", "k AS k1")
    val b = g.filter(col("grp") === 0L).selectExpr("n AS n2", "k AS k2")
    a.crossJoin(broadcast(b))
      .selectExpr("n1", "n2",
        "CAST(k1 AS DOUBLE) / n1 AS p1", "CAST(k2 AS DOUBLE) / n2 AS p2")
      .selectExpr("n1", "n2", "round(p1, 6) AS p1", "round(p2, 6) AS p2",
        "round(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2)), 6) AS cohen_h",
        """round((2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2)))
          |/ sqrt(CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2), 4) AS z""".stripMargin,
        """CASE WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.2 THEN 'negligible'
          |WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.5 THEN 'small'
          |WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.8 THEN 'medium'
          |ELSE 'large' END AS magnitude""".stripMargin)
  }
  val statCohenHSql: String =
    """WITH g AS (
      |  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS grp,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM lineitem GROUP BY 1),
      |ab AS (
      |  SELECT a.n AS n1, b.n AS n2,
      |    CAST(a.k AS DOUBLE) / a.n AS p1, CAST(b.k AS DOUBLE) / b.n AS p2
      |  FROM g a, g b WHERE a.grp = 1 AND b.grp = 0)
      |SELECT n1, n2, round(p1, 6) AS p1, round(p2, 6) AS p2,
      |  round(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2)), 6) AS cohen_h,
      |  round((2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2)))
      |  / sqrt(CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2), 4) AS z,
      |  CASE WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.2 THEN 'negligible'
      |  WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.5 THEN 'small'
      |  WHEN abs(2 * asin(sqrt(p1)) - 2 * asin(sqrt(p2))) < 0.8 THEN 'medium'
      |  ELSE 'large' END AS magnitude
      |FROM ab""".stripMargin

  /** C915 stat_mood_median_test — the k-sample median test over the 5
    * priority groups: grand LOWER median of order totals from
    * GlobalRank (rank ⌈n/2⌉ — never a corpus single-task window),
    * exact above/not-above counts per group, χ² = ΣΣ(O−E)²/E with
    * expected counts n_g·A/n, df = 4, decision vs χ²₀.₀₅,₄ = 9.488.
    * The robust location screen when Kruskal–Wallis' shift-alternative
    * assumptions are too strong — only the sign vs the median matters.
    */
  def statMoodMedianTest(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority").as("grp"), col("o_orderkey"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      o, "rn", "nn", Seq(col("v").asc, col("o_orderkey").asc))
    val med = ranked.filter(expr("rn = CAST(ceil(CAST(nn AS DOUBLE) / 2) AS BIGINT)"))
      .agg(max(col("v")).as("gm"))
    val counts = o.crossJoin(broadcast(med))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN v > gm THEN 1L ELSE 0L END")).cast("long").as("ag"))
    val tot = counts.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("ag")).cast("long").as("aa"))
    val chi = counts.crossJoin(broadcast(tot))
      .select(expr(
        """CAST(floor((
          |  (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * aa / n)
          |    * (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * aa / n)
          |    / (CAST(ng AS DOUBLE) * aa / n)
          |+ (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - aa) / n)
          |    * (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - aa) / n)
          |    / (CAST(ng AS DOUBLE) * (n - aa) / n)) * 1e9 + 0.5) AS BIGINT)""".stripMargin)
        .as("cq"))
      .agg(sum(col("cq")).cast("long").as("cq"), count(lit(1)).cast("long").as("k"))
    chi.crossJoin(broadcast(med)).crossJoin(broadcast(tot))
      .selectExpr("k AS n_groups",
        "round(CAST(gm AS DOUBLE) / 100, 2) AS grand_median_dollars",
        "aa AS n_above",
        "round(CAST(cq AS DOUBLE) / 1e9, 4) AS chi2",
        """CASE WHEN CAST(cq AS DOUBLE) / 1e9 > 9.487729036781154
          |THEN 'reject_equal_medians' ELSE 'consistent' END AS verdict""".stripMargin)
  }
  val statMoodMedianTestSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS grp, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY v, o_orderkey) AS BIGINT) AS rn,
      |    count(*) OVER () AS nn
      |  FROM o),
      |med AS (
      |  SELECT max(v) AS gm FROM ranked
      |  WHERE rn = CAST(ceil(CAST(nn AS DOUBLE) / 2) AS BIGINT)),
      |counts AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CASE WHEN v > gm THEN 1 ELSE 0 END) AS BIGINT) AS ag
      |  FROM o, med GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(ag) AS BIGINT) AS aa FROM counts),
      |chi AS (
      |  SELECT CAST(sum(CAST(floor((
      |      (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * aa / n)
      |        * (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * aa / n)
      |        / (CAST(ng AS DOUBLE) * aa / n)
      |    + (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - aa) / n)
      |        * (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - aa) / n)
      |        / (CAST(ng AS DOUBLE) * (n - aa) / n)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS cq,
      |    CAST(count(*) AS BIGINT) AS k
      |  FROM counts, tot)
      |SELECT k AS n_groups,
      |  round(CAST(gm AS DOUBLE) / 100, 2) AS grand_median_dollars,
      |  aa AS n_above,
      |  round(CAST(cq AS DOUBLE) / 1e9, 4) AS chi2,
      |  CASE WHEN CAST(cq AS DOUBLE) / 1e9 > 9.487729036781154
      |  THEN 'reject_equal_medians' ELSE 'consistent' END AS verdict
      |FROM chi, med, tot""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_forecast_accuracy" -> (timeForecastAccuracy _),
    "stat_process_capability" -> (statProcessCapability _),
    "stat_cohen_h" -> (statCohenH _),
    "stat_mood_median_test" -> (statMoodMedianTest _),
  )

  val oracle: Map[String, String] = Map(
    "time_forecast_accuracy" -> timeForecastAccuracySql,
    "stat_process_capability" -> statProcessCapabilitySql,
    "stat_cohen_h" -> statCohenHSql,
    "stat_mood_median_test" -> statMoodMedianTestSql,
  )
}
