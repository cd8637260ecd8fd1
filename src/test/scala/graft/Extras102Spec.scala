package graft

import org.apache.spark.sql.functions._

/** Engine-side invariants of the round-8 second wave: incremental view
  * maintenance must equal the full recompute (the IVM identity,
  * checked against the STORE's own v2 snapshot — independent of the
  * relational oracle), and Cohen's kappa must behave like kappa.
  */
class Extras102Spec extends SparkSpec {

  test("store_incremental_agg_refresh equals a full recompute of the v2 snapshot") {
    val incr = queries.Extras102.storeIncrementalAggRefresh(spark, sf)
      .collect().map(_.toString).toSeq
    val store = queries.Extras102.ivmStore(spark, sf)
    val full = store.read()
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"))
      .orderBy("lang")
      .collect().map(_.toString).toSeq
    assert(incr == full,
      "incremental refresh diverged from the full v2 recompute")
  }

  test("stat_cohens_kappa: agreement beyond chance, within bounds") {
    val r = queries.Extras102.statCohensKappa(spark, sf).head()
    val (po, pe, kappa) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(po > pe,
      s"length and token-count raters must agree beyond chance (po=$po pe=$pe)")
    assert(kappa > 0.0 && kappa <= 1.0, s"kappa out of range: $kappa")
    // the definitional identity survives the 6-decimal rounding
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 2e-6)
  }
}
