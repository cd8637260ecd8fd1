package graft

/** Quantization-recall sanity: float is its own truth (exactly 1.0),
  * and more bits can't retrieve worse than fewer.
  */
class Extras108Spec extends SparkSpec {

  test("embed_quantization_recall: float=1.0, int8 >= binary, all bounded") {
    val m = queries.Extras108.embedQuantizationRecall(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m.keySet == Set("float", "int8", "binary"))
    assert(m("float")._2 == 1.0,
      s"float scheme must be its own ground truth: ${m("float")}")
    assert(m("float")._1 == queries.Extras108.QuantProbeBudget * 10L)
    m.values.foreach { case (_, rec) => assert(rec > 0.0 && rec <= 1.0) }
    assert(m("int8")._2 >= m("binary")._2,
      s"8-bit retrieval (${m("int8")._2}) should not trail " +
        s"1-bit (${m("binary")._2})")
  }

  test("embed_quantization_recall scored stage broadcasts probes; corpus never shuffles") {
    val plan = queries.Extras108.embedQuantizationScored(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "probe side must join as a broadcast nested loop")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "corpus must not shuffle or cross-join")
  }
}
