package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-eighth wave: IQR outlier fences, Pareto revenue
  * concentration on the distributed prefix sum, and Theil–Sen robust
  * slope.
  */
object Extras78 {

  /** stat_iqr_outliers — the Tukey box-plot outlier screen per event
    * stream: quartiles by percentile_disc ELEMENT selection (exact),
    * fences q1−1.5·IQR / q3+1.5·IQR as IEEE arithmetic on identical
    * operands, then one broadcast join tags every event row-locally.
    * Scale: the fence frame is O(streams) and broadcasts; the data
    * contributes two partial-agg passes, no wide shuffle.
    */
  def statIqrOutliers(s: SparkSession, d: String): DataFrame = {
    val fences = events(s, d).groupBy("event_type").agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("q1"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("q3"))
    events(s, d).join(broadcast(fences), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("q1")).as("q1"), min(col("q3")).as("q3"),
        sum(when(col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")),
          1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
          1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")
  }
  val statIqrOutliersSql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS q1,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS q3
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n, min(f.q1) AS q1, min(f.q3) AS q3,
      |  CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(sum(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM events e JOIN f USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** analytics_pareto_share — revenue concentration ("which prefix of
    * customers covers 80%?"): per-customer revenue in EXACT CENTS
    * (DECIMAL→long), customers ordered by revenue desc, and the
    * cumulative coverage computed with GlobalRank's RANGE-PARTITIONED
    * exclusive prefix sum (C129's machinery) — the single-partition
    * `SUM OVER (ORDER BY …)` window this replaces is the classic
    * 100TB bottleneck. A customer is in the top set while the revenue
    * BEFORE it covers <80% of the total (5·prefix < 4·total in exact
    * integer cents). One final IEEE block reports the shares.
    */
  def analyticsParetoShare(s: SparkSession, d: String): DataFrame = {
    val rev = orders(s, d).groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(14,2)")) * 100)
        .cast("long").as("cents"))
    val ranked = graft.plans.GlobalRank.withExclusivePrefixSum(
      rev, "cents_before", col("cents"),
      Seq(col("cents").desc, col("o_custkey").asc))
    val tot = rev.agg(sum(col("cents")).as("t"), count(lit(1)).as("n_cust"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("cents_before") * 5 < col("t") * 4)
      .agg(min(col("n_cust")).as("n_customers"),
        count(lit(1)).as("n_top"),
        round(sum(col("cents")).cast("double") / min(col("t")).cast("double"),
          6).as("rev_share"),
        round(count(lit(1)).cast("double")
          / min(col("n_cust")).cast("double"), 6).as("cust_share"))
  }
  val analyticsParetoShareSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT cents,
      |    coalesce(sum(cents) OVER (ORDER BY cents DESC, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cents_before
      |  FROM rev),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t, count(*) AS n_cust
      |        FROM rev)
      |SELECT min(n_cust) AS n_customers, count(*) AS n_top,
      |  round(CAST(sum(cents) AS DOUBLE) / CAST(min(t) AS DOUBLE), 6)
      |    AS rev_share,
      |  round(CAST(count(*) AS DOUBLE) / CAST(min(n_cust) AS DOUBLE), 6)
      |    AS cust_share
      |FROM r, tot WHERE cents_before * 5 < t * 4""".stripMargin

  /** stat_theil_sen_slope — the ROBUST trend estimate (median of all
    * pairwise slopes — immune to the outliers that poison least
    * squares, the companion to C358's OLS drift): the series is the
    * per-day exact-decimal revenue per stream, so the pair frame is
    * bounded by CALENDAR² per stream, not data² — the self-join is a
    * keyed equi-join on the stream with a day-order filter. Pairwise
    * slopes are IEEE on identical operands; the median is
    * percentile_disc ELEMENT selection over them.
    */
  def statTheilSenSlope(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("xi"))
      .agg(dsum(col("value")).as("y"))
    val pairs = daily.select(col("event_type"), col("xi").as("x1"),
        col("y").as("y1"))
      .join(daily.select(col("event_type"), col("xi").as("x2"),
        col("y").as("y2")), "event_type")
      .filter(col("x1") < col("x2"))
      .select(col("event_type"),
        ((col("y2") - col("y1")) / (col("x2") - col("x1")).cast("double"))
          .as("slope"))
    val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    pairs.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)"), 6)
          .as("median_slope"))
      .join(broadcast(nd), "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("median_slope"))
      .orderBy("event_type")
  }
  val statTheilSenSlopeSql: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS xi,
       |    ${dsumSql("value")} AS y
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT d1.event_type,
       |    (d2.y - d1.y) / CAST(d2.xi - d1.xi AS DOUBLE) AS slope
       |  FROM daily d1 JOIN daily d2
       |    ON d1.event_type = d2.event_type AND d1.xi < d2.xi),
       |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
       |SELECT p.event_type, min(nd.n_days) AS n_days, count(*) AS n_pairs,
       |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope), 6)
       |    AS median_slope
       |FROM p JOIN nd USING (event_type)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_iqr_outliers" -> (statIqrOutliers _),
    "analytics_pareto_share" -> (analyticsParetoShare _),
    "stat_theil_sen_slope" -> (statTheilSenSlope _))

  val oracle: Map[String, String] = Map(
    "stat_iqr_outliers" -> statIqrOutliersSql,
    "analytics_pareto_share" -> analyticsParetoShareSql,
    "stat_theil_sen_slope" -> statTheilSenSlopeSql)
}
