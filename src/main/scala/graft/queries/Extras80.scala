package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eightieth wave: M4 chart downsampling, the antimeridian bbox edge
  * case, and k-core graph peeling.
  */
object Extras80 {

  /** time_downsample_m4 — the M4 downsampling operator (the published
    * min/max/first/last-per-pixel-bucket reduction that makes
    * billion-point series renderable without visual error): per
    * (stream, 4-hour bucket), first/last by min/max over a
    * UNIQUE-KEYED struct — (ts, event_id, value): the key decides, the
    * payload rides along — plus the value extrema. ONE partial-agg
    * pass, output bounded by streams × pixels, never the data.
    */
  def timeDownsampleM4(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"),
        (floor(unix_micros(col("ts").cast("timestamp"))
          / (14400L * 1000000L)) * 14400L).as("bucket_s"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts"), col("event_id"), col("value"))).getField("value")
          .as("v_first"),
        max(struct(col("ts"), col("event_id"), col("value"))).getField("value")
          .as("v_last"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .orderBy("event_type", "bucket_s")
  val timeDownsampleM4Sql: String =
    """SELECT event_type,
      |  CAST(floor(epoch_us(ts) / 14400000000) * 14400 AS BIGINT)
      |    AS bucket_s,
      |  count(*) AS n,
      |  min(struct_pack(ts := ts, event_id := event_id, value := value)).value
      |    AS v_first,
      |  max(struct_pack(ts := ts, event_id := event_id, value := value)).value
      |    AS v_last,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ref_bbox_antimeridian — the DATE-LINE-crossing bounding box (the
    * geo edge case every spatial search must get right: west > east
    * means the box wraps through ±180): points synthesize
    * deterministically from event ids (the C131 scheme), and the wrap
    * predicate is (lon ≥ west OR lon ≤ east) — row-local, rides the
    * scan, pushes down like any other conjunct. Census: hits per side
    * of the seam plus the hit envelope.
    */
  def refBboxAntimeridian(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        ((col("event_id") * 7919 % 36000).cast("double") / 100.0d - 180.0d)
          .as("lon"),
        ((col("event_id") * 4409 % 18000).cast("double") / 100.0d - 90.0d)
          .as("lat"))
      .filter((col("lon") >= 170.0d || col("lon") <= -170.0d)
        && col("lat").between(-10.0d, 10.0d))
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("lon") >= 170.0d, 1L).otherwise(0L)).as("n_west_side"),
        sum(when(col("lon") <= -170.0d, 1L).otherwise(0L)).as("n_east_side"),
        round(min(col("lon")), 6).as("min_lon"),
        round(max(col("lon")), 6).as("max_lon"),
        round(min(col("lat")), 6).as("min_lat"),
        round(max(col("lat")), 6).as("max_lat"))
  val refBboxAntimeridianSql: String =
    """WITH p AS (
      |  SELECT event_id,
      |    CAST(event_id * 7919 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
      |    CAST(event_id * 4409 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat
      |  FROM events)
      |SELECT count(*) AS n_in,
      |  CAST(sum(CASE WHEN lon >= 170.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_west_side,
      |  CAST(sum(CASE WHEN lon <= -170.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_east_side,
      |  round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon,
      |  round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat
      |FROM p
      |WHERE (lon >= 170.0 OR lon <= -170.0) AND lat BETWEEN -10.0 AND 10.0"""
      .stripMargin

  /** graph_k_core — 3-core decomposition of the C180 rule-derived
    * graph by 6 fixed PEELING rounds (the community-detection
    * preprocessing step: iteratively drop degree-<k vertices until
    * stable): each round is a degree aggregate over the surviving edge
    * list + two LEFT-SEMI joins — keyed shuffles only, no adjacency
    * state; 6 rounds suffice for convergence here and the output
    * reports both membership and a CONVERGED flag (last two rounds
    * agree) so a production run knows whether to continue. Scale: per
    * round cost is O(E) shuffled by vertex, and each round is EAGERLY
    * MATERIALIZED (localCheckpoint) to truncate lineage — without it
    * the round-k plan references round-(k−1) three times and the DAG
    * replays the base ~3^k times (measured: >6 min at sf0.01 vs
    * seconds with the cut); on a cluster this would be
    * `Dataset.checkpoint` to the shuffle-tracking store.
    */
  def graphKCore(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val raw = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    var edges = raw.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    var prevCount: DataFrame = null
    for (_ <- 1 to 6) {
      prevCount = edges
      val keep = edges.select(col("a").as("v"))
        .union(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dv"))
        .filter(col("dv") >= 3).select("v")
      edges = edges
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
    }
    val fin = edges.agg(count(lit(1)).as("n_edges_core"))
    val nodes = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v"))).distinct()
      .agg(count(lit(1)).as("n_nodes_core"))
    val prev = prevCount.agg(count(lit(1)).as("n_prev"))
    fin.crossJoin(nodes).crossJoin(prev)
      .select(col("n_nodes_core"), col("n_edges_core"),
        (col("n_edges_core") === col("n_prev")).as("converged"))
  }
  val graphKCoreSql: String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM users),
        |raw AS (
        |  SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
        |  UNION ALL
        |  SELECT user_id, (user_id + 2) % n FROM users, nn
        |  UNION ALL
        |  SELECT user_id, (user_id * 7 + 3) % n FROM users, nn),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE src <> dst)""".stripMargin
    // MATERIALIZED mirrors the Spark side's localCheckpoint: DuckDB
    // inlines plain CTEs, and e(k) references e(k-1) five times →
    // ~5^6 inlined copies of the base scan without it.
    val rounds = (1 to 6).map { k =>
      s"""k$k AS MATERIALIZED (
         |  SELECT v FROM (
         |    SELECT v, count(*) AS dv FROM (
         |      SELECT a AS v FROM e${k - 1} UNION ALL SELECT b FROM e${k - 1})
         |    GROUP BY 1) WHERE dv >= 3),
         |e$k AS MATERIALIZED (
         |  SELECT a, b FROM e${k - 1}
         |  WHERE a IN (SELECT v FROM k$k) AND b IN (SELECT v FROM k$k))"""
        .stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds +
      """
        |SELECT
        |  (SELECT count(*) FROM (SELECT DISTINCT v FROM (
        |     SELECT a AS v FROM e6 UNION ALL SELECT b FROM e6)))
        |    AS n_nodes_core,
        |  (SELECT count(*) FROM e6) AS n_edges_core,
        |  (SELECT count(*) FROM e6) = (SELECT count(*) FROM e5) AS converged"""
        .stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_downsample_m4" -> (timeDownsampleM4 _),
    "ref_bbox_antimeridian" -> (refBboxAntimeridian _),
    "graph_k_core" -> (graphKCore _))

  val oracle: Map[String, String] = Map(
    "time_downsample_m4" -> timeDownsampleM4Sql,
    "ref_bbox_antimeridian" -> refBboxAntimeridianSql,
    "graph_k_core" -> graphKCoreSql)
}
