package graft

/** Wave-7 properties: the threshold sweep must be a monotone curve
  * anchored at the miner's own threshold, and the rule-split DiD must
  * behave as a placebo test (no real treatment exists in generator
  * data, so the estimate must sit near zero).
  */
class Extras107Spec extends SparkSpec {

  test("dedup_threshold_sweep: monotone in tau, anchored at the staged pair count") {
    val rows = queries.Extras107.dedupThresholdSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == queries.Extras107.SweepTaus)
    val pairCounts = rows.map(_._2).toSeq
    assert(pairCounts == pairCounts.sorted(Ordering[Long].reverse),
      s"pair counts not non-increasing in tau: $pairCounts")
    val docCounts = rows.map(_._3).toSeq
    assert(docCounts == docCounts.sorted(Ordering[Long].reverse),
      s"doc counts not non-increasing in tau: $docCounts")
    val staged = queries.NgramPairStage.pairs(spark, sf).count()
    assert(rows.head._2 == staged,
      s"tau=0.6 row (${rows.head._2}) must equal the full staged " +
        s"pair table ($staged)")
  }

  test("analytics_diff_in_diff: placebo estimate near zero, cells populated") {
    val r = queries.Extras107.analyticsDiffInDiff(spark, sf).head()
    val cells = (0 to 3).map(r.getDouble)
    val did = r.getDouble(4)
    cells.foreach(c => assert(c > 0.0, s"empty/degenerate cell: $cells"))
    val grand = cells.sum / 4
    assert(math.abs(did) < 0.10 * grand,
      s"placebo DiD $did exceeds 10% of grand mean $grand — the rule " +
        "split accidentally correlates with order value")
  }
}
