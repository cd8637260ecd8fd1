package graft

import org.apache.spark.sql.functions._

/** Wave-15 properties: the right-outer join must preserve every view
  * and agree with the inner join on matched pairs; the Argo spike test
  * must flag a subset of what the gradient formula flags (the
  * half-range term only ever forgives).
  */
class Extras115Spec extends SparkSpec {

  test("stream_stream_right_outer: all views preserved, matched pairs = inner join") {
    val out = queries.Extras115.streamStreamRightOuter(spark, sf)
      .select("v_id", "p_id").collect()
    val views = Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(out.map(_.getLong(0)).distinct.length.toLong == views,
      "right outer lost or invented views")
    val matched = out.filter(!_.isNullAt(1))
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    val inner = queries.Streaming.streamStreamJoin(spark, sf)
      .select("p_id", "v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched == inner,
      "matched pairs diverge from the inner stream-stream join")
  }

  test("ref_qc_argo_spike flags a subset of the gradient test's flags") {
    val argo = queries.Extras115.refQcArgoSpike(spark, sf)
      .select("cruise", "n_spikes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gradient = queries.Extras96.refQcSpikeTest(spark, sf)
      .select("cruise", "n_spikes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // |2v-p-n| - |p-n| <= |2v-p-n|, so every Argo flag is a gradient
    // flag: per-cruise counts can only shrink, never grow or appear
    argo.foreach { case (cruise, n) =>
      assert(gradient.contains(cruise),
        s"cruise $cruise flagged by Argo but not by gradient")
      assert(n <= gradient(cruise),
        s"cruise $cruise: Argo flags $n > gradient ${gradient(cruise)}")
    }
  }
}
