package graft

import org.apache.spark.sql.functions._
import graft.queries.Streaming

/** Streaming ≡ batch equivalence (SURVEY §5.3): the streaming results
  * must equal their batch formulations on the same input. Two of the
  * four streams run here (the other two are covered by the Verify
  * oracle harness; each stream costs ~10 s of wall time).
  */
class StreamingSpec extends SparkSpec {

  test("stream_dedup_watermark == batch aggregate despite double replay") {
    val streamed = Streaming.streamDedupWatermark(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Tables.dsum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("stream_tumbling_count flushes every window (sentinel watermark push)") {
    val streamed = Streaming.streamTumblingCount(spark, sf)
    val batchHours = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("h")).distinct().count()
    assert(streamed.count() == batchHours,
      "append-mode stream withheld windows — sentinel flush broken")
  }
}
