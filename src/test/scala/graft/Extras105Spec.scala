package graft

/** The ANN recall/cost curve must behave like one: recall and scanned
  * candidates both monotone in nprobe, recall bounded, cost strictly
  * below brute force.
  */
class Extras105Spec extends SparkSpec {

  test("embed_ann_recall_curve: monotone recall and cost, bounded, sub-brute-force") {
    val rows = queries.Extras105.embedAnnRecallCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq ==
      queries.Extras105.AnnNprobeLevels.map(_.toLong))
    val recalls = rows.map(_._4).toSeq
    assert(recalls == recalls.sorted, s"recall not monotone in nprobe: $recalls")
    val costs = rows.map(_._2).toSeq
    assert(costs == costs.sorted, s"cost not monotone in nprobe: $costs")
    rows.foreach { case (np, nCand, nHits, recall) =>
      assert(recall > 0.0 && recall <= 1.0, s"nprobe=$np recall=$recall")
      assert(nHits <= queries.Extras105.AnnProbeBudget * 10L)
    }
    // the whole point: even nprobe=8 (half the cells) scans well under
    // the brute-force probe x corpus pair count
    val n = Tables.embeddings(spark, sf).count()
    val brute = queries.Extras105.AnnProbeBudget * (n - 1)
    assert(rows.last._2 < brute,
      s"nprobe=8 scans ${rows.last._2} of brute-force $brute")
  }
}
