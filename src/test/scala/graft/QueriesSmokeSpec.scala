package graft

/** Every declared operator runs at sf0.001, returns rows, and its
  * oracle SQL (when declared) is non-empty. Value-level equality vs
  * DuckDB is the Verify/compare.py harness's job (scripts/compare.py);
  * this spec guards runability + the contract invariants.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  // Streaming queries are exercised (more cheaply) in StreamingSpec and
  // by Verify; running all four here would double the suite's wall time.
  private val deferred = Set(
    "stream_tumbling_count", "stream_sliding_sum",
    "stream_session_window", "stream_dedup_watermark", "stream_custom_state",
    "stream_stream_join")

  SparkEntry.queries.filterNot(q => deferred(q._1)).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has empty schema")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
