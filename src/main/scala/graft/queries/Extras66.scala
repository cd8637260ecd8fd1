package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-sixth wave: the quality-screened matchup — C207's grid
  * matchup composed with C246's L2 flag decode, the way a real
  * validation pipeline actually runs them.
  */
object Extras66 {

  /** ref_matchup_flagged — QUALITY-SCREENED satellite matchups (the
    * composition the reference's validation workflow actually
    * executes: match in-situ records to satellite pixels, but only
    * pixels whose L2 quality flags are clean — cloud/glint/land
    * excluded BEFORE the spatial join, C207 ∘ C246): the flag test is
    * a scan-side bitmask conjunct on the satellite side (the cheap
    * reject runs before any join work), then the same grid-cell
    * equi-join + exact box/time verify + nearest-in-time pick as
    * C207. The census reports match counts and screening loss — how
    * many in-situ records LOST their best match to the quality screen
    * (matched in C207's unscreened run but not here, an anti-join of
    * the two runs' keeper sets).
    */
  def refMatchupFlagged(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d).select(col("event_id"), col("event_type"),
      (col("value") % 360.0 - lit(180.0)).as("lon"),
      ((col("user_id") % 180).cast("double") - lit(90.0)).as("lat"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"),
      ((col("event_id") * 2654435761L) % 64).cast("bigint").as("l2_flags"))
    val insitu = g.filter(col("event_type") === "purchase")
      .select(col("event_id").as("i_id"), col("lon").as("i_lon"),
        col("lat").as("i_lat"), col("tus").as("i_tus"))
    def satSide(screened: Boolean): DataFrame = {
      val base = g.filter(col("event_type") === "view")
      val kept = if (screened) base.filter(col("l2_flags").bitwiseAND(7) === 0) else base
      kept.select(col("event_id").as("s_id"), col("lon").as("s_lon"),
        col("lat").as("s_lat"), col("tus").as("s_tus"),
        floor(col("lon")).as("cx"), floor(col("lat")).as("cy"))
    }
    val probes = insitu
      .withColumn("cx", explode(array(floor(col("i_lon")) - 1, floor(col("i_lon")),
        floor(col("i_lon")) + 1)))
      .withColumn("cy", explode(array(floor(col("i_lat")) - 1, floor(col("i_lat")),
        floor(col("i_lat")) + 1)))
    def best(sat: DataFrame): DataFrame = {
      val cand = probes.join(sat, Seq("cx", "cy"))
        .filter(abs(col("i_lon") - col("s_lon")) <= 1.0 &&
          abs(col("i_lat") - col("s_lat")) <= 1.0 &&
          abs(col("i_tus") - col("s_tus")) <= 2L * 86400 * 1000000)
        .select(col("i_id"), col("s_id"),
          abs(col("i_tus") - col("s_tus")).as("dt_us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("i_id").orderBy(col("dt_us"), col("s_id"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("i_id", "s_id")
    }
    val screened = best(satSide(screened = true))
    val unscreened = best(satSide(screened = false)).select(col("i_id"))
    val lost = unscreened.join(screened.select("i_id"), Seq("i_id"), "left_anti")
    screened.agg(count(lit(1)).as("n_matched"))
      .crossJoin(lost.agg(count(lit(1)).as("n_lost_to_screen")))
  }
  val refMatchupFlaggedSql: String =
    """WITH g AS (
      |  SELECT event_id, event_type,
      |    value % 360.0 - 180.0 AS lon,
      |    CAST(user_id % 180 AS DOUBLE) - 90.0 AS lat,
      |    epoch_us(ts) AS tus,
      |    (event_id * 2654435761) % 64 AS l2_flags
      |  FROM events),
      |cand AS (
      |  SELECT i.event_id AS i_id, s.event_id AS s_id,
      |    abs(i.tus - s.tus) AS dt_us, (s.l2_flags & 7) = 0 AS clean
      |  FROM g i JOIN g s
      |    ON i.event_type = 'purchase' AND s.event_type = 'view'
      |   AND abs(i.lon - s.lon) <= 1.0 AND abs(i.lat - s.lat) <= 1.0
      |   AND abs(i.tus - s.tus) <= CAST(172800000000 AS BIGINT)),
      |screened AS (
      |  SELECT i_id, s_id FROM (
      |    SELECT i_id, s_id,
      |      row_number() OVER (PARTITION BY i_id ORDER BY dt_us, s_id) AS rn
      |    FROM cand WHERE clean) t WHERE rn = 1),
      |unscreened AS (SELECT DISTINCT i_id FROM cand)
      |SELECT (SELECT count(*) FROM screened) AS n_matched,
      |  (SELECT count(*) FROM unscreened u
      |   WHERE u.i_id NOT IN (SELECT i_id FROM screened)) AS n_lost_to_screen""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_matchup_flagged" -> (refMatchupFlagged _))

  val oracle: Map[String, String] = Map(
    "ref_matchup_flagged" -> refMatchupFlaggedSql)
}
