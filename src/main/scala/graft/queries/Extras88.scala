package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-eighth wave: last-touch attribution, sliding distinct counts,
  * and KMV sketch intersection with exact validation.
  */
object Extras88 {

  /** analytics_last_touch — last-touch marketing attribution: each
    * purchase is attributed to the most recent preceding click/view by
    * the same user, via ONE user-partitioned window (last IGNORE NULLS
    * over the strictly-preceding frame, (ts, event_id) total order) —
    * no purchases⋈touches self-join, no per-user state beyond the
    * window sort. Unattributed purchases report channel 'none'.
    */
  def analyticsLastTouch(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("touch_type",
        when(col("event_type").isin("click", "view"), col("event_type")))
      .withColumn("attr",
        last(col("touch_type"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("attr"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("total_value"))
      .orderBy("channel")
  }
  val analyticsLastTouchSql: String =
    """WITH a AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |        THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
      |  FROM events)
      |SELECT coalesce(attr, 'none') AS channel,
      |  count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      |FROM a WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** win_sliding_distinct — 7-day sliding distinct users per day (the
    * DAU/WAU board): neither engine allows count(DISTINCT) in a
    * window, so the union rides per-day USER SETS over the O(days)
    * frame — daily sets from one distinct pass on the fact, the
    * 7-row window flattens + dedups bounded arrays. At 100 TB the
    * daily-set frame is days × |users/day|, not the event count.
    */
  def winSlidingDistinct(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("dau"),
        sort_array(collect_list(col("user_id"))).as("us"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("wau7",
        size(array_distinct(flatten(collect_list(col("us")).over(w)))))
      .select(col("day").cast("timestamp_ntz").as("day"), col("dau"),
        col("wau7").cast("long").as("wau7"))
      .orderBy("day")
  }
  val winSlidingDistinctSql: String =
    """WITH daily AS (
      |  SELECT day, count(*) AS dau, list_sort(list(user_id)) AS us
      |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
      |  GROUP BY day)
      |SELECT CAST(day AS TIMESTAMP) AS day, dau,
      |  CAST(len(list_distinct(flatten(list(us) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)))) AS BIGINT) AS wau7
      |FROM daily ORDER BY day""".stripMargin

  /** agg_kmv_intersection — K-minimum-values sketch overlap between
    * two behavioral cohorts (purchasers vs signups), validated against
    * the exact answer in the same result row: the k=64 smallest
    * md5(user) values per cohort are DETERMINISTIC order statistics
    * (distributed TakeOrdered, no RNG), the merged sketch's Jaccard
    * estimate is pure set counting on two 64-row frames, and the
    * exact Jaccard comes from one distinct-pair pass. The absolute
    * error column is the op's own quality certificate.
    */
  def aggKmvIntersection(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    def cohort(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id")).distinct()
      .select(col("user_id"), md5(col("user_id").cast("string")).as("h"))
    val a = cohort("purchase").localCheckpoint(true)
    val b = cohort("signup").localCheckpoint(true)
    val ka = a.orderBy("h").limit(64).select(col("h").as("ha"))
    val kb = b.orderBy("h").limit(64).select(col("h").as("hb"))
    val merged = ka.select(col("ha").as("h"))
      .unionAll(kb.select(col("hb").as("h")))
      .distinct().orderBy("h").limit(64)
    val estJ = merged
      .join(ka, merged("h") === ka("ha"), "left_semi")
      .join(kb, merged("h") === kb("hb"), "left_semi")
      .agg(count(lit(1)).as("k_both"))
    val exact = a.select(col("user_id")).intersect(b.select(col("user_id")))
      .agg(count(lit(1)).as("n_inter"))
      .crossJoin(a.agg(count(lit(1)).as("n_a")))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
    estJ.crossJoin(exact)
      .select(col("n_a"), col("n_b"), col("n_inter"), col("k_both"),
        round(col("k_both").cast("double") / 64.0d, 6).as("jaccard_est"),
        round(col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6)
          .as("jaccard_exact"))
  }
  val aggKmvIntersectionSql: String =
    """WITH a AS (
      |  SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM (
      |    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')),
      |b AS (
      |  SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM (
      |    SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')),
      |ka AS (SELECT h FROM a ORDER BY h LIMIT 64),
      |kb AS (SELECT h FROM b ORDER BY h LIMIT 64),
      |merged AS (
      |  SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
      |  ORDER BY h LIMIT 64),
      |est AS (
      |  SELECT count(*) AS k_both FROM merged
      |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
      |ex AS (
      |  SELECT
      |    (SELECT count(*) FROM a) AS n_a,
      |    (SELECT count(*) FROM b) AS n_b,
      |    (SELECT count(*) FROM (
      |       SELECT user_id FROM a INTERSECT SELECT user_id FROM b))
      |      AS n_inter)
      |SELECT n_a, n_b, n_inter, k_both,
      |  round(CAST(k_both AS DOUBLE) / 64.0, 6) AS jaccard_est,
      |  round(CAST(n_inter AS DOUBLE)
      |    / CAST(n_a + n_b - n_inter AS DOUBLE), 6) AS jaccard_exact
      |FROM est, ex""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_last_touch" -> (analyticsLastTouch _),
    "win_sliding_distinct" -> (winSlidingDistinct _),
    "agg_kmv_intersection" -> (aggKmvIntersection _))

  val oracle: Map[String, String] = Map(
    "analytics_last_touch" -> analyticsLastTouchSql,
    "win_sliding_distinct" -> winSlidingDistinctSql,
    "agg_kmv_intersection" -> aggKmvIntersectionSql)
}
