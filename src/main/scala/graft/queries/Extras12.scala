package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Twelfth wave of coverage operators: bounded-state streaming dedup
  * and int8 embedding quantization — each with a DuckDB oracle. (The
  * native ZOrder2 expression added alongside this wave rewires C105.)
  */
object Extras12 {

  /** stream_dedup_within_wm — `dropDuplicatesWithinWatermark` (B49's
    * bounded-state sibling): duplicates are only guaranteed dropped if
    * they arrive within the watermark delay of the first sighting —
    * in exchange, state for an id is EVICTED once the watermark passes
    * it, so memory is bounded by the lateness horizon instead of the
    * full key universe. B49's `dropDuplicates` keeps every in-horizon
    * id with per-event-time semantics; this operator's contract is the
    * one an infinite-retention stream actually runs. The double replay
    * delivers both copies in one batch (well inside the horizon), so
    * the result equals the single-copy batch aggregate — the oracle.
    */
  def streamDedupWithinWm(s: SparkSession, d: String): DataFrame = {
    val sch = Streaming.rawSchema(s, d)
    val dir = Streaming.stageDir(s, d, copies = 2, sentinels = false)
    val deduped = Streaming.eventStream(s, dir, sch)
      .withWatermark("ets", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
    Streaming.runToBatch(s, deduped, "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }
  val streamDedupWithinWmSql: String =
    s"""SELECT event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** embed_quantize_int8 — int8 quantization of the embedding column
    * (the ANN-serving compression step: 4× smaller vectors, SIMD int
    * dot products downstream): q = clamp(⌊x·127 + 0.5⌋, −127, 127)
    * per dimension — float→double exact, one identically-rounded
    * multiply/floor, integer clamp, so the quantized vectors are
    * bit-identical on any engine/partitioning. Output is the per-vector
    * quantization audit (component sum / extremes / saturation count)
    * rather than a 64-wide array (comparator-friendly, same information
    * for drift checks). Row-local codegen'd lambda work; no shuffle
    * but the output sort.
    */
  def embedQuantizeInt8(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("""transform(embedding,
          |  x -> cast(greatest(least(floor(cast(x as double) * 127 + 0.5), 127), -127) as bigint))"""
          .stripMargin).as("q"))
      .select(col("vec_id"), col("label"),
        expr("aggregate(q, 0L, (a, v) -> a + v)").as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        expr("cast(size(filter(q, v -> v = 127L OR v = -127L)) as bigint)")
          .as("n_saturated"))
      .orderBy("vec_id")
  val embedQuantizeInt8Sql: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x ->
      |      CAST(greatest(least(floor(CAST(x AS DOUBLE) * 127 + 0.5), 127), -127)
      |        AS BIGINT)) AS qv
      |  FROM embeddings)
      |SELECT vec_id, CAST(label AS INT) AS label,
      |  list_reduce(qv, (a, v) -> a + v) AS q_sum,
      |  list_min(qv) AS q_min, list_max(qv) AS q_max,
      |  CAST(len(list_filter(qv, v -> v = 127 OR v = -127)) AS BIGINT)
      |    AS n_saturated
      |FROM q ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_dedup_within_wm" -> (streamDedupWithinWm _),
    "embed_quantize_int8" -> (embedQuantizeInt8 _),
  )

  val oracle: Map[String, String] = Map(
    "stream_dedup_within_wm" -> streamDedupWithinWmSql,
    "embed_quantize_int8" -> embedQuantizeInt8Sql,
  )
}
