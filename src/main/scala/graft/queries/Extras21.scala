package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Twenty-first wave: the nearest-neighbor ASOF join — with a DuckDB
  * oracle. Completes the as-of menu (backward B11/C44, forward C85,
  * tolerance C115).
  */
object Extras21 {

  /** join_asof_nearest — ASOF in BOTH directions, keeping whichever
    * match is closer in time (ties break toward the earlier view, then
    * the lower id — a total order, so the pick is engine-independent):
    * the sensor-fusion "closest reading" contract. Built as one
    * union-window pass: both candidate directions flow through a
    * single row_number window ordered by (|Δt|, ts, id) per purchase —
    * no second shuffle for the direction merge, and the absolute
    * deltas are exact µs integers. Unmatched purchases survive via the
    * left join back.
    */
  def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("v_user"),
        col("ts").as("vts"))
    val dt = abs(expr("unix_micros(cast(vts AS TIMESTAMP)) - unix_micros(cast(pts AS TIMESTAMP))"))
    val w = Window.partitionBy("pid")
      .orderBy(col("dt_us").asc, col("vts").asc, col("vid").asc)
    val best = p.join(v, col("user_id") === col("v_user"))
      .withColumn("dt_us", dt)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("pid").as("b_pid"), col("vid").as("nearest_view_id"),
        col("vts").as("nearest_view_ts"), col("dt_us").as("dt_us"))
    p.join(best, col("pid") === col("b_pid"), "left_outer")
      .select(col("pid"), col("user_id"), col("pts"),
        col("nearest_view_id"), col("nearest_view_ts"), col("dt_us"))
      .orderBy("pid")
  }
  val joinAsofNearestSql: String =
    """SELECT pid, user_id, pts, nearest_view_id, nearest_view_ts, dt_us FROM (
      |  SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
      |    v.event_id AS nearest_view_id, v.ts AS nearest_view_ts,
      |    abs(epoch_us(v.ts) - epoch_us(p.ts)) AS dt_us,
      |    row_number() OVER (PARTITION BY p.event_id
      |      ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
      |               v.ts ASC, v.event_id ASC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |    ON p.user_id = v.user_id) t
      |WHERE rn = 1 OR nearest_view_id IS NULL
      |ORDER BY pid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_nearest" -> (joinAsofNearest _),
  )

  val oracle: Map[String, String] = Map(
    "join_asof_nearest" -> joinAsofNearestSql,
  )
}
