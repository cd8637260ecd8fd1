package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Unit coverage for the hundredth wave beyond the query-level oracles:
  * planted-duplicate detection for the exact-substring miner, snapshot
  * semantics of the incremental release dedup, and the RocksDB state
  * store's result parity with the default provider.
  */
class SubstringDedupSpec extends SparkSpec {

  test("substring miner finds a planted cross-document span and ignores unique text") {
    import spark.implicits._
    val L = graft.queries.Extras100.SpanLen
    val S = graft.queries.Extras100.SpanStride
    // a shared region long enough for the aligned-window guarantee
    // (>= L + S - 1 chars, both docs at phase 0) + unique tails
    val shared = ("the quick brown fox jumps over the lazy dog again and " +
      "again until the passage is long enough to span windows").take(L + S)
    val docs = Seq(
      (1L, shared + " unique tail alpha " + "a" * 40),
      (2L, shared + " different tail beta " + "b" * 40),
      (3L, "entirely unrelated text " + "c" * 100)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
    val dir = Files.createTempDirectory("graft_ssd_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Extras100.dedupSubstringExact(spark, dir).collect()
    assert(out.nonEmpty, "planted duplicate span not found")
    // every reported span involves >= 2 docs; doc 3 shares nothing
    out.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(3) != 3L, "unique doc reported as duplicated")
    }
    // the phase-0 guarantee: at least the first window of the shared
    // region is reported for both docs 1 and 2 (first_doc = 1)
    assert(out.exists(_.getLong(3) == 1L))
  }

  test("incremental release dedup reads two snapshots and never re-admits prior content") {
    val store = graft.queries.Extras100.releaseStore(spark, sf)
    assert(store.versions().take(2) == Seq(1L, 2L),
      "release store must retain both snapshots")
    val out = graft.queries.Extras100.dedupIncrementalRelease(spark, sf)
    val priorHashes = store.readAt(1)
      .select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).toSet
    val outRows = out.collect()
    outRows.foreach { r =>
      assert(!priorHashes.contains(r.getString(1)),
        s"doc ${r.getLong(0)} duplicates prior-release content but survived")
    }
    // deterministic across invocations (staging is cached + idempotent)
    assert(out.collect().toSeq == outRows.toSeq)
  }

  test("RocksDB state store produces byte-identical results to the default provider") {
    val default = graft.queries.Streaming.streamTumblingCount(spark, sf)
      .collect().map(_.toString).toSeq
    val rocks = graft.queries.Extras100.streamRocksdbState(spark, sf)
      .collect().map(_.toString).toSeq
    assert(rocks == default, "state-backend swap changed the result")
    // and the provider conf was restored after the query (getOption
    // surfaces the conf's built-in default, so assert on the value)
    assert(!spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"), "provider conf leaked out of the query")
  }
}
