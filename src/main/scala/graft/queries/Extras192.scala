package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 92 (C772–C775): homogeneity / changepoint screens on the
  * daily-revenue series + Hjorth signal descriptors — Buishand's
  * range test, the Standard Normal Homogeneity Test, a MOSUM scan,
  * and Hjorth activity/mobility/complexity.
  *
  * Shared discipline: the day×revenue series is an exact cent-integer
  * aggregate, prefix sums are integers via the range-partitioned
  * GlobalRank helper, every per-k statistic is computed from exact
  * integer ingredients in one IEEE expression (identical in both
  * engines), and argmaxes tie-break on the earliest day.
  */
object Extras192 {

  /** The shared daily-revenue spine: one row per order day,
    * v = revenue cents (exact), k = 1-based day index, p = inclusive
    * prefix sum — all integers via the two-pass prefix-sum plan.
    */
  private def daily(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .groupBy(expr("date_trunc('day', o_orderdate)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    // the day frame is calendar-bounded (≤ a few thousand rows) and
    // agg-bounded below, so a single-task cumulative window is both
    // plan-gate-legal and cheaper than the two-pass GlobalRank shuffle
    base.withColumn("p", sum(col("v")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("day").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)).cast("long"))
  }
  private val dailySql: String =
    """base AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |daily AS (
      |  SELECT day, v, CAST(sum(v) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      |  FROM base)""".stripMargin

  /** C772 stat_buishand_range — Buishand's cumulative-deviation
    * homogeneity test: S_k = P_k − k·μ held EXACT as n·S_k =
    * n·P_k − k·S_n (BIGINT), rescaled range R/(σ√n) and max deviation
    * Q/(σ√n) from the integer extremes, break day = argmax |S_k|
    * (integer comparison, earliest-day tie-break). The drift screen
    * that reads the whole deviation path, not one split.
    */
  def statBuishandRange(s: SparkSession, d: String): DataFrame = {
    val dd = daily(s, d)
    val idx = dd.withColumn("k",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)))
    val tot = dd.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sn"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("qn"))
    val sk = idx.crossJoin(broadcast(tot))
      .select(col("day"), col("n"), col("sn"), col("qn"),
        // n·S_k exact: |n·P_k − k·S_n| ≤ n·S_n ≈ 2.4e3 · 2.4e14 — DECIMAL(38,0)
        expr("CAST(n AS DECIMAL(38,0)) * p - CAST(k AS DECIMAL(38,0)) * sn").as("nsk"))
    val ext = sk.groupBy("n", "sn", "qn")
      .agg(max(col("nsk")).as("smax"), min(col("nsk")).as("smin"),
        max(abs(col("nsk"))).as("sabs"))
    val break_ = sk.join(broadcast(ext.selectExpr("sabs AS sabs2").limit(1)),
        expr("abs(nsk) = sabs2"))
      .agg(min(col("day")).as("break_day"))
    ext.crossJoin(broadcast(break_))
      .selectExpr("n", "CAST(CAST(break_day AS DATE) AS STRING) AS break_day",
        // σ = population std of v; R and Q are S-units = nsk / n
        """round((CAST(smax AS DOUBLE) - CAST(smin AS DOUBLE)) / n
          |/ sqrt((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n) / n)
          |/ sqrt(CAST(n AS DOUBLE)), 6) AS r_stat""".stripMargin,
        """round(CAST(sabs AS DOUBLE) / n
          |/ sqrt((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n) / n)
          |/ sqrt(CAST(n AS DOUBLE)), 6) AS q_stat""".stripMargin)
  }
  val statBuishandRangeSql: String =
    s"""WITH $dailySql,
      |idx AS (
      |  SELECT day, v, p, row_number() OVER (ORDER BY day) AS k FROM daily),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS DECIMAL(38,0)) AS sn,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qn
      |  FROM daily),
      |sk AS (
      |  SELECT i.day, t.n, t.sn, t.qn,
      |    CAST(t.n AS DECIMAL(38,0)) * i.p - CAST(i.k AS DECIMAL(38,0)) * t.sn AS nsk
      |  FROM idx i, tot t),
      |ext AS (
      |  SELECT n, sn, qn, max(nsk) AS smax, min(nsk) AS smin, max(abs(nsk)) AS sabs
      |  FROM sk GROUP BY 1, 2, 3),
      |brk AS (
      |  SELECT min(s.day) AS break_day FROM sk s, ext e WHERE abs(s.nsk) = e.sabs)
      |SELECT e.n, CAST(CAST(b.break_day AS DATE) AS VARCHAR) AS break_day,
      |  round((CAST(e.smax AS DOUBLE) - CAST(e.smin AS DOUBLE)) / e.n
      |    / sqrt((CAST(e.qn AS DOUBLE) - CAST(e.sn AS DOUBLE) * CAST(e.sn AS DOUBLE) / e.n) / e.n)
      |    / sqrt(CAST(e.n AS DOUBLE)), 6) AS r_stat,
      |  round(CAST(e.sabs AS DOUBLE) / e.n
      |    / sqrt((CAST(e.qn AS DOUBLE) - CAST(e.sn AS DOUBLE) * CAST(e.sn AS DOUBLE) / e.n) / e.n)
      |    / sqrt(CAST(e.n AS DOUBLE)), 6) AS q_stat
      |FROM ext e, brk b""".stripMargin

  /** C773 stat_snht — Alexandersson's Standard Normal Homogeneity
    * Test: T_k = S_k²·n²/(k(n−k)σ²) (the k-vs-rest two-mean form),
    * evaluated from the same exact n·S_k integers; T_max as the
    * statistic, argmax day with a DOUBLE comparison on identical
    * inputs + earliest-day tie-break. Complements Buishand: SNHT
    * weights the series ends, the range test the middle.
    */
  def statSnht(s: SparkSession, d: String): DataFrame = {
    val dd = daily(s, d)
    val idx = dd.withColumn("k",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)))
    val tot = dd.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sn"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("qn"))
    val tk = idx.crossJoin(broadcast(tot))
      .filter(expr("k < n")) // k = n has no right segment
      .select(col("day"), col("n"),
        // the k<n guard ALSO lives inside the expression: ANSI mode
        // evaluates fused projections speculatively, so the filter
        // alone does not protect the k=n division
        expr(
          """CASE WHEN k >= n THEN CAST(NULL AS DOUBLE) ELSE
            |(CAST(n AS DOUBLE) * p - CAST(k AS DOUBLE) * CAST(sn AS DOUBLE))
            |* (CAST(n AS DOUBLE) * p - CAST(k AS DOUBLE) * CAST(sn AS DOUBLE))
            |/ (CAST(k AS DOUBLE) * (n - k))
            |/ (CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n) END""".stripMargin)
          .as("t"))
    val tmax = tk.agg(max(col("t")).as("tmax"))
    tk.crossJoin(broadcast(tmax))
      .filter(col("t") === col("tmax"))
      .agg(min(col("day")).as("break_day"), max(col("tmax")).as("tm"))
      .crossJoin(broadcast(tot.select(col("n")).limit(1)))
      .selectExpr("n", "CAST(CAST(break_day AS DATE) AS STRING) AS break_day", "round(tm, 6) AS t_snht")
  }
  val statSnhtSql: String =
    s"""WITH $dailySql,
      |idx AS (
      |  SELECT day, v, p, row_number() OVER (ORDER BY day) AS k FROM daily),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS DECIMAL(38,0)) AS sn,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qn
      |  FROM daily),
      |tk AS (
      |  SELECT i.day, t.n,
      |    (CAST(t.n AS DOUBLE) * i.p - CAST(i.k AS DOUBLE) * CAST(t.sn AS DOUBLE))
      |      * (CAST(t.n AS DOUBLE) * i.p - CAST(i.k AS DOUBLE) * CAST(t.sn AS DOUBLE))
      |      / (CAST(i.k AS DOUBLE) * (t.n - i.k))
      |      / (CAST(t.qn AS DOUBLE) - CAST(t.sn AS DOUBLE) * CAST(t.sn AS DOUBLE) / t.n) AS t
      |  FROM idx i, tot t WHERE i.k < t.n),
      |tm AS (SELECT max(t) AS tmax FROM tk)
      |SELECT max(k.n) AS n, CAST(CAST(min(k.day) AS DATE) AS VARCHAR) AS break_day, round(max(m.tmax), 6) AS t_snht
      |FROM tk k, tm m WHERE k.t = m.tmax""".stripMargin

  /** C774 stat_mosum — a moving-sum changepoint scan with a fixed
    * h = 90-day bandwidth over the present-day sequence: the window
    * sum is the exact prefix-sum difference P_{t} − P_{t−h}, centered
    * by h·μ and scaled by σ√h; max |M| flags the steepest local level
    * shift, argmax day ties to the earliest. The LOCAL complement to
    * the global Buishand/SNHT split statistics.
    */
  def statMosum(s: SparkSession, d: String): DataFrame = {
    val h = 90
    val dd = daily(s, d)
    val idx = dd.withColumn("k",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("day").asc)))
      .withColumn("plag", lag(col("p"), h).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day").asc)))
      .filter(col("plag").isNotNull)
    val tot = dd.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("sn"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("qn"))
    val m = idx.crossJoin(broadcast(tot))
      .select(col("day"), col("n"),
        // n·M_t exact: n·(P_t − P_{t−h}) − h·S_n
        expr(s"abs(CAST(n AS DECIMAL(38,0)) * (p - plag) - CAST($h AS DECIMAL(38,0)) * sn)").as("nm"))
    val mx = m.agg(max(col("nm")).as("nmax"))
    m.crossJoin(broadcast(mx))
      .filter(col("nm") === col("nmax"))
      .agg(max(col("n")).as("n"), min(col("day")).as("peak_day"), max(col("nmax")).as("nmx"))
      .crossJoin(broadcast(tot.selectExpr("sn AS sn2", "qn AS qn2", "n AS n2").limit(1)))
      .selectExpr("n", s"CAST($h AS INT) AS h", "CAST(CAST(peak_day AS DATE) AS STRING) AS peak_day",
        s"""round(CAST(nmx AS DOUBLE) / n
          |/ sqrt((CAST(qn2 AS DOUBLE) - CAST(sn2 AS DOUBLE) * CAST(sn2 AS DOUBLE) / n2) / n2)
          |/ sqrt(CAST($h AS DOUBLE)), 6) AS mosum_stat""".stripMargin)
  }
  val statMosumSql: String =
    s"""WITH $dailySql,
      |idx AS (
      |  SELECT day, p,
      |    lag(p, 90) OVER (ORDER BY day) AS plag
      |  FROM daily),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS DECIMAL(38,0)) AS sn,
      |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qn
      |  FROM daily),
      |m AS (
      |  SELECT i.day, t.n,
      |    abs(CAST(t.n AS DECIMAL(38,0)) * (i.p - i.plag) - CAST(90 AS DECIMAL(38,0)) * t.sn) AS nm
      |  FROM idx i, tot t WHERE i.plag IS NOT NULL),
      |mx AS (SELECT max(nm) AS nmax FROM m)
      |SELECT max(m.n) AS n, CAST(90 AS INT) AS h, CAST(CAST(min(m.day) AS DATE) AS VARCHAR) AS peak_day,
      |  round(CAST(max(x.nmax) AS DOUBLE) / max(m.n)
      |    / sqrt((CAST(max(t.qn) AS DOUBLE) - CAST(max(t.sn) AS DOUBLE) * CAST(max(t.sn) AS DOUBLE) / max(t.n)) / max(t.n))
      |    / sqrt(CAST(90 AS DOUBLE)), 6) AS mosum_stat
      |FROM m, mx x, tot t WHERE m.nm = x.nmax""".stripMargin

  /** C775 time_hjorth_parameters — Hjorth's activity / mobility /
    * complexity of the hourly event-count signal: population variances
    * of x, Δx, Δ²x from exact integer moment sums over the
    * agg-bounded hourly frame (≤ one row per wall-clock hour), three
    * IEEE expressions at the end. The EEG-era signal triple that
    * summarizes amplitude, dominant frequency, and bandwidth in three
    * numbers.
    */
  def timeHjorthParameters(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .groupBy(expr("date_trunc('hour', ts)").as("hr"))
      .agg(count(lit(1)).cast("long").as("x"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("hr").asc)
    val diffs = hourly
      .withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("x2", lag(col("x"), 2).over(w))
      .select(col("x"), expr("x - x1").as("dx"), expr("x - 2 * x1 + x2").as("d2x"))
    diffs.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("qx"),
        sum(expr("CASE WHEN dx IS NULL THEN 0L ELSE 1L END")).cast("long").as("nd"),
        sum(coalesce(col("dx"), lit(0L))).cast("decimal(38,0)").as("sd"),
        sum(expr("CAST(coalesce(dx, 0L) AS DECIMAL(38,0)) * coalesce(dx, 0L)")).cast("decimal(38,0)").as("qd"),
        sum(expr("CASE WHEN d2x IS NULL THEN 0L ELSE 1L END")).cast("long").as("nd2"),
        sum(coalesce(col("d2x"), lit(0L))).cast("decimal(38,0)").as("sd2"),
        sum(expr("CAST(coalesce(d2x, 0L) AS DECIMAL(38,0)) * coalesce(d2x, 0L)")).cast("decimal(38,0)").as("qd2"))
      .selectExpr("n",
        "(CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n AS vx",
        "(CAST(qd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / nd) / nd AS vd",
        "(CAST(qd2 AS DOUBLE) - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE) / nd2) / nd2 AS vd2")
      .selectExpr("n", "round(vx, 6) AS activity",
        "round(sqrt(vd / vx), 6) AS mobility",
        "round(sqrt(vd2 / vd) / sqrt(vd / vx), 6) AS complexity")
  }
  val timeHjorthParametersSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |diffs AS (
      |  SELECT x,
      |    x - lag(x, 1) OVER (ORDER BY hr) AS dx,
      |    x - 2 * lag(x, 1) OVER (ORDER BY hr) + lag(x, 2) OVER (ORDER BY hr) AS d2x
      |  FROM hourly),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS qx,
      |    CAST(sum(CASE WHEN dx IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS nd,
      |    CAST(sum(COALESCE(dx, 0)) AS DECIMAL(38,0)) AS sd,
      |    CAST(sum(CAST(COALESCE(dx, 0) AS DECIMAL(38,0)) * COALESCE(dx, 0)) AS DECIMAL(38,0)) AS qd,
      |    CAST(sum(CASE WHEN d2x IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS nd2,
      |    CAST(sum(COALESCE(d2x, 0)) AS DECIMAL(38,0)) AS sd2,
      |    CAST(sum(CAST(COALESCE(d2x, 0) AS DECIMAL(38,0)) * COALESCE(d2x, 0)) AS DECIMAL(38,0)) AS qd2
      |  FROM diffs),
      |v AS (
      |  SELECT n,
      |    (CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n AS vx,
      |    (CAST(qd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / nd) / nd AS vd,
      |    (CAST(qd2 AS DOUBLE) - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE) / nd2) / nd2 AS vd2
      |  FROM ag)
      |SELECT n, round(vx, 6) AS activity,
      |  round(sqrt(vd / vx), 6) AS mobility,
      |  round(sqrt(vd2 / vd) / sqrt(vd / vx), 6) AS complexity
      |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_buishand_range" -> (statBuishandRange _),
    "stat_snht" -> (statSnht _),
    "stat_mosum" -> (statMosum _),
    "time_hjorth_parameters" -> (timeHjorthParameters _),
  )

  val oracle: Map[String, String] = Map(
    "stat_buishand_range" -> statBuishandRangeSql,
    "stat_snht" -> statSnhtSql,
    "stat_mosum" -> statMosumSql,
    "time_hjorth_parameters" -> timeHjorthParametersSql,
  )
}
