package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninetieth wave: new-vs-returning split, winsorized means, and
  * profile inversion QC.
  */
object Extras90 {

  /** analytics_new_vs_returning — the daily acquisition-vs-retention
    * revenue split: each customer's first order day comes from one
    * keyed aggregate (O(customers), broadcast back), the new/returning
    * tag is a row-local comparison, and the daily split is one
    * partial-agg pass. The fact table is touched once; nothing wide
    * shuffles twice.
    */
  def analyticsNewVsReturning(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val first = o.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("first_day"))
    o.join(broadcast(first), "o_custkey")
      .withColumn("day", col("o_orderdate").cast("date"))
      .withColumn("is_new", col("day") === col("first_day"))
      .groupBy("day")
      .agg(
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_returning"),
        dsumx(when(col("is_new"), dec(col("o_totalprice")))
          .otherwise(lit(0).cast(M))).as("rev_new"),
        dsumx(when(!col("is_new"), dec(col("o_totalprice")))
          .otherwise(lit(0).cast(M))).as("rev_returning"))
      .select(col("day").cast("timestamp_ntz").as("day"), col("n_new"),
        col("n_returning"), col("rev_new"), col("rev_returning"))
      .orderBy("day")
  }
  val analyticsNewVsReturningSql: String =
    """WITH first AS (
      |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_day
      |  FROM orders GROUP BY 1)
      |SELECT CAST(day AS TIMESTAMP) AS day,
      |  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_returning,
      |  CAST(sum(CASE WHEN is_new THEN CAST(o_totalprice AS DECIMAL(14,2))
      |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS rev_new,
      |  CAST(sum(CASE WHEN is_new THEN CAST(0 AS DECIMAL(14,2))
      |    ELSE CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE)
      |    AS rev_returning
      |FROM (
      |  SELECT o_totalprice, CAST(o_orderdate AS DATE) AS day,
      |    CAST(o_orderdate AS DATE) = first_day AS is_new
      |  FROM orders JOIN first ON orders.o_custkey = first.o_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** stat_winsorized_mean — 5%-winsorized mean per event stream (the
    * robust-location companion to C362's outlier screen): clamp
    * bounds are percentile_disc ELEMENT selections (exact decimal)
    * broadcast back as an O(streams) frame, clamping is row-local
    * exact-decimal least/greatest, and the mean divides the exact sum
    * once per stream. No sort of the fact table anywhere.
    */
  def statWinsorizedMean(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"), dec(col("value")).as("v"))
    val bounds = e.groupBy("event_type").agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY v)").as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)").as("hi"))
    e.join(broadcast(bounds), "event_type")
      .withColumn("w", least(greatest(col("v"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("w")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("winsor_mean"),
        round(sum(col("v")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("raw_mean"))
      .orderBy("event_type")
  }
  val statWinsorizedMeanSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(value AS DECIMAL(14,2)) AS v FROM events),
      |b AS (
      |  SELECT event_type,
      |    percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS lo,
      |    percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS hi
      |  FROM e GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  round(CAST(sum(least(greatest(v, lo), hi)) AS DOUBLE) / count(*), 6)
      |    AS winsor_mean,
      |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS raw_mean
      |FROM e JOIN b ON e.event_type = b.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ref_profile_inversion_qc — the oceanographic profile-inversion
    * screen (value rising where depth increases flags a suspect
    * cast): depths derive from the integer id scheme, each profile is
    * a (cruise, day) partition, and the inversion test is one lag
    * window ordered (depth, event_id) per profile — keyed shuffle
    * only, state O(profile length). Output: per-cruise suspect-cast
    * census, cruises with any inversion only.
    */
  def refProfileInversionQc(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id").as("cruise"), col("ts").cast("date").as("day"),
        (col("event_id") % 200).as("depth_dm"), col("event_id"),
        dec(col("value")).as("v"))
    val w = Window.partitionBy("cruise", "day")
      .orderBy(col("depth_dm"), col("event_id"))
    e.withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("inv",
        when(col("prev").isNotNull && col("v") > col("prev"), 1L).otherwise(0L))
      .groupBy("cruise", "day")
      .agg(count(lit(1)).as("n_obs"), sum(col("inv")).as("n_inversions"))
      .filter(col("n_inversions") > 0)
      .groupBy("cruise")
      .agg(count(lit(1)).as("n_suspect_casts"),
        sum(col("n_inversions")).as("total_inversions"),
        max(col("n_inversions")).as("worst_cast"))
      .filter(col("n_suspect_casts") >= 5)
      .orderBy("cruise")
  }
  val refProfileInversionQcSql: String =
    """WITH e AS (
      |  SELECT user_id AS cruise, CAST(ts AS DATE) AS day,
      |    event_id % 200 AS depth_dm, event_id,
      |    CAST(value AS DECIMAL(14,2)) AS v
      |  FROM events),
      |l AS (
      |  SELECT cruise, day, v,
      |    lag(v, 1) OVER (PARTITION BY cruise, day
      |      ORDER BY depth_dm, event_id) AS prev
      |  FROM e),
      |casts AS (
      |  SELECT cruise, day, count(*) AS n_obs,
      |    sum(CASE WHEN prev IS NOT NULL AND v > prev THEN 1 ELSE 0 END)
      |      AS n_inversions
      |  FROM l GROUP BY 1, 2)
      |SELECT cruise, count(*) AS n_suspect_casts,
      |  CAST(sum(n_inversions) AS BIGINT) AS total_inversions,
      |  CAST(max(n_inversions) AS BIGINT) AS worst_cast
      |FROM casts WHERE n_inversions > 0
      |GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_new_vs_returning" -> (analyticsNewVsReturning _),
    "stat_winsorized_mean" -> (statWinsorizedMean _),
    "ref_profile_inversion_qc" -> (refProfileInversionQc _))

  val oracle: Map[String, String] = Map(
    "analytics_new_vs_returning" -> analyticsNewVsReturningSql,
    "stat_winsorized_mean" -> statWinsorizedMeanSql,
    "ref_profile_inversion_qc" -> refProfileInversionQcSql)
}
