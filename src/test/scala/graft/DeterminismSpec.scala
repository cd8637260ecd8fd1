package graft

/** The oracle harness hashes results exactly, so every query must be
  * bit-stable across runs (shuffle task order, partial-agg merge order
  * and window evaluation must not leak into values). Run the queries
  * most exposed to float/merge-order hazards twice and require
  * identical collected output.
  */
class DeterminismSpec extends SparkSpec {

  private val exposed = Seq(
    "agg_hash_groupby",     // decimal-pattern sums across 4 shuffle partitions
    "udaf_geomean",         // fixed-point log accumulation, merge order free
    "win_running_sum",      // windowed decimal running sums
    "win_sliding_avg",      // sliding frames over decimal dailies
    "sim_topk_cosine",      // float dot products + rank ties
    "dedup_ngram_jaccard",  // set-similarity join + int-ratio division
    "json_funcs",           // dsum over extracted groups
    "text_langid_confusion" // fixed-point argmax over join order
  )

  exposed.foreach { name =>
    test(s"$name is bit-stable across runs") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs between two runs")
    }
  }
}
