package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-sixth wave: capture-recapture estimation, activity heatmap
  * grid, and the Argo spike QC test.
  */
object Extras96 {

  /** stat_capture_recapture — Lincoln–Petersen / Chapman population
    * estimation (how many users exist, from two overlapping behavioral
    * "captures"): the three cohort counts are distinct aggregates
    * collapsed from per-user flags in ONE fact pass, the Chapman
    * estimator and its CI are a final IEEE block, and the true count
    * sits beside the estimate as the op's error certificate.
    */
  def statCaptureRecapture(s: SparkSession, d: String): DataFrame = {
    val flags = events(s, d).groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
    flags.agg(count(lit(1)).as("n_true"),
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("c2")).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        round((col("n1") + 1).cast("double") * (col("n2") + 1).cast("double")
          / (col("m") + 1).cast("double") - lit(1.0d), 2).as("n_chapman"),
        round(sqrt((col("n1") + 1).cast("double")
          * (col("n2") + 1).cast("double")
          * (col("n1") - col("m")).cast("double")
          * (col("n2") - col("m")).cast("double")
          / ((col("m") + 1).cast("double") * (col("m") + 1).cast("double")
            * (col("m") + 2).cast("double"))), 2).as("se"))
  }
  val statCaptureRecaptureSql: String =
    """WITH flags AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS n_true,
      |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
      |    CAST(sum(c1 * c2) AS BIGINT) AS m
      |  FROM flags)
      |SELECT n_true, n1, n2, m,
      |  round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
      |    / CAST(m + 1 AS DOUBLE) - 1.0, 2) AS n_chapman,
      |  round(sqrt(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
      |    * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
      |    / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
      |      * CAST(m + 2 AS DOUBLE))), 2) AS se
      |FROM s""".stripMargin

  /** time_activity_heatmap — the dow × hour activity grid behind every
    * ops dashboard: both axes are row-local date parts riding the
    * scan, one partial-agg pass, output bounded 7×24 regardless of
    * data size; revenue rides along as an exact-decimal sum.
    */
  def timeActivityHeatmap(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"))
      .orderBy("dow", "hod")
  val timeActivityHeatmapSql: String =
    """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
      |  CAST(hour(ts) AS BIGINT) AS hod,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ref_qc_spike_test — the Argo-style spike test (|v − (prev+next)/2|
    * beyond threshold flags an instrument spike): prev/next come from
    * ONE lag+lead window per profile ordered (depth, id), the spike
    * magnitude stays EXACT decimal (×2 scaling dodges the /2), and
    * the per-cruise census is one keyed aggregate. Interior points
    * only (both neighbors required).
    */
  def refQcSpikeTest(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id").as("cruise"),
        (col("event_id") % 200).as("depth_dm"), col("event_id"),
        dec(col("value")).as("v"))
    val w = Window.partitionBy("cruise").orderBy(col("depth_dm"), col("event_id"))
    e.withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("next", lead(col("v"), 1).over(w))
      .filter(col("prev").isNotNull && col("next").isNotNull)
      .withColumn("spike2", abs(col("v") * 2 - col("prev") - col("next")))
      .groupBy("cruise")
      .agg(count(lit(1)).as("n_interior"),
        sum(when(col("spike2") > lit(400).cast(M), 1L).otherwise(0L))
          .as("n_spikes"),
        max(col("spike2")).cast("double").as("max_spike2"))
      .filter(col("n_spikes") > 0)
      .orderBy("cruise")
  }
  val refQcSpikeTestSql: String =
    """WITH e AS (
      |  SELECT user_id AS cruise, event_id % 200 AS depth_dm, event_id,
      |    CAST(value AS DECIMAL(14,2)) AS v
      |  FROM events),
      |l AS (
      |  SELECT cruise, v,
      |    lag(v, 1) OVER w AS prev, lead(v, 1) OVER w AS next
      |  FROM e WINDOW w AS (PARTITION BY cruise ORDER BY depth_dm, event_id))
      |SELECT cruise, count(*) AS n_interior,
      |  CAST(sum(CASE WHEN abs(v * 2 - prev - next)
      |    > CAST(400 AS DECIMAL(14,2)) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_spikes,
      |  CAST(max(abs(v * 2 - prev - next)) AS DOUBLE) AS max_spike2
      |FROM l WHERE prev IS NOT NULL AND next IS NOT NULL
      |GROUP BY 1 HAVING n_spikes > 0 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_capture_recapture" -> (statCaptureRecapture _),
    "time_activity_heatmap" -> (timeActivityHeatmap _),
    "ref_qc_spike_test" -> (refQcSpikeTest _))

  val oracle: Map[String, String] = Map(
    "stat_capture_recapture" -> statCaptureRecaptureSql,
    "time_activity_heatmap" -> timeActivityHeatmapSql,
    "ref_qc_spike_test" -> refQcSpikeTestSql)
}
