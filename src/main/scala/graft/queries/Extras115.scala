package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.Tables._

/** 115th wave — the RIGHT OUTER stream-stream join (completing the
  * inner/left/full/semi menu) and the true Argo spike test (the
  * existing C-qc row implements the GRADIENT formula; the spike test
  * proper subtracts the half-range term — a genuinely different QC
  * discriminator on steep profiles).
  */
object Extras115 {

  /** stream_stream_right_outer — all VIEWS, joined to a purchase by
    * the same user within the following hour when one exists:
    * the right-outer member of the stream-stream join family. Same
    * watermark/sentinel harness as the C-left-outer row (sentinels
    * ride inside both streams to advance the watermark past all real
    * data so unmatched RIGHT rows flush deterministically); state
    * bounds come from the time-bound condition exactly as in the
    * inner join. Output keeps the nullable purchase side.
    */
  def streamStreamRightOuter(s: SparkSession, d: String): DataFrame = {
    val sch = Streaming.rawSchema(s, d)
    val dir = Streaming.stageDir(s, d, copies = 1, sentinels = true)
    def side(tpe: String, prefix: String): DataFrame =
      s.readStream.schema(sch).parquet(dir)
        .withColumn("ets", col("ts").cast("timestamp"))
        .filter(col("event_type") === tpe || col("event_type") === "sentinel")
        .select(
          col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          col("ets").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val joined = side("purchase", "p").join(
      side("view", "v"),
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"),
      "rightOuter")
    Streaming.runToBatch(s, joined, "append")
      .filter(col("v_user") >= 0) // drop the sentinel right rows
      .select(col("v_id"), col("p_id"), col("v_user"),
        col("v_ts").cast(TimestampNTZType).as("v_ts"),
        col("p_ts").cast(TimestampNTZType).as("p_ts"))
      .orderBy("v_id", "p_id")
  }
  val streamStreamRightOuterSql: String =
    """SELECT v.event_id AS v_id, p.event_id AS p_id, v.user_id AS v_user,
      |  v.ts AS v_ts, p.ts AS p_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
      |ORDER BY v_id, p_id""".stripMargin

  /** ref_qc_argo_spike — the Argo quality-control SPIKE test proper
    * (Argo QC manual test 9): test value |v − (p+n)/2| − |(p−n)/2| —
    * unlike the plain second-difference (the GRADIENT formula the
    * C-qc_spike_test row computes), the subtracted half-range term
    * forgives steep-but-smooth profiles, so only genuine one-point
    * excursions flag. Kept exact in the ×2 decimal domain:
    * t2 = |2v−p−n| − |p−n|, flagged when t2 > 2·threshold — no
    * division, no float. Same synthetic cruise/depth profile model and
    * per-profile window as the gradient row; one window pass +
    * map-side-combinable rollup.
    */
  def refQcArgoSpike(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id").as("cruise"),
        (col("event_id") % 200).as("depth_dm"), col("event_id"),
        dec(col("value")).as("v"))
    val w = Window.partitionBy("cruise").orderBy(col("depth_dm"), col("event_id"))
    e.withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("next", lead(col("v"), 1).over(w))
      .filter(col("prev").isNotNull && col("next").isNotNull)
      .withColumn("t2",
        abs(col("v") * 2 - col("prev") - col("next"))
          - abs(col("prev") - col("next")))
      .groupBy("cruise")
      .agg(count(lit(1)).as("n_interior"),
        sum(when(col("t2") > lit(400).cast(M), 1L).otherwise(0L))
          .as("n_spikes"),
        max(col("t2")).cast("double").as("max_t2"))
      .filter(col("n_spikes") > 0)
      .orderBy("cruise")
  }
  val refQcArgoSpikeSql: String =
    """WITH e AS (
      |  SELECT user_id AS cruise, event_id % 200 AS depth_dm, event_id,
      |    CAST(value AS DECIMAL(14,2)) AS v
      |  FROM events),
      |l AS (
      |  SELECT cruise, v,
      |    lag(v, 1) OVER w AS prev, lead(v, 1) OVER w AS next
      |  FROM e WINDOW w AS (PARTITION BY cruise ORDER BY depth_dm, event_id))
      |SELECT cruise, count(*) AS n_interior,
      |  CAST(sum(CASE WHEN abs(v * 2 - prev - next) - abs(prev - next)
      |    > CAST(400 AS DECIMAL(14,2)) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_spikes,
      |  CAST(max(abs(v * 2 - prev - next) - abs(prev - next)) AS DOUBLE)
      |    AS max_t2
      |FROM l WHERE prev IS NOT NULL AND next IS NOT NULL
      |GROUP BY 1 HAVING n_spikes > 0 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_stream_right_outer" -> (streamStreamRightOuter _),
    "ref_qc_argo_spike" -> (refQcArgoSpike _))

  val oracle: Map[String, String] = Map(
    "stream_stream_right_outer" -> streamStreamRightOuterSql,
    "ref_qc_argo_spike" -> refQcArgoSpikeSql)
}
