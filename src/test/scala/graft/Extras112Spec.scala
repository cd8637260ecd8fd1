package graft

/** Drift-metric sanity: both metrics must be non-negative (Gibbs), JS
  * bounded by 1 bit, and a placebo split of generator data must read
  * as stable.
  */
class Extras112Spec extends SparkSpec {

  test("stat_psi_drift: non-negative, placebo split reads stable") {
    val r = queries.Extras112.statPsiDrift(spark, sf).head()
    val (n0, n1, psi) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n0 > 0 && n1 > 0)
    assert(psi >= 0.0, s"PSI must be non-negative (Gibbs): $psi")
    assert(psi < 0.1, s"placebo split reads as drift: PSI=$psi")
  }

  test("stat_js_divergence: in [0,1] bits, near zero for independent mix") {
    val r = queries.Extras112.statJsDivergence(spark, sf).head()
    val js = r.getDouble(2)
    assert(js >= 0.0 && js <= 1.0, s"JS out of [0,1] bits: $js")
    assert(js < 0.1, s"weekday/weekend mix reads as dependent: JS=$js")
  }
}
