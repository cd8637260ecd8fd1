package graft

/** Conductance invariants: a cut can't exceed the volume producing it,
  * and φ is in [0,1] whenever defined (NULL only for a community
  * holding the whole graph).
  */
class Extras109Spec extends SparkSpec {

  test("graph_community_conductance: cut <= volume, phi in [0,1] or undefined") {
    val rows = queries.Extras109.graphCommunityConductance(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vol, cut) = (r.getLong(2), r.getLong(3))
      assert(cut <= vol, s"community ${r.getLong(0)}: cut $cut > volume $vol")
      if (!r.isNullAt(4)) {
        val phi = r.getDouble(4)
        assert(phi >= 0.0 && phi <= 1.0,
          s"community ${r.getLong(0)}: phi=$phi")
      } else {
        // NULL only in the whole-graph case: volume must be the full 2m
        val m2 = queries.Extras101.lpaEdges(spark, sf).count()
        assert(vol == m2,
          s"undefined phi on a proper sub-community (vol=$vol, 2m=$m2)")
      }
    }
  }
}
