package graft

import org.apache.spark.sql.functions._

/** Engine-side properties of the round-8 fourth wave: modularity must
  * certify the LPA partition beats chance (the property the self-vote
  * fix exists for), and Chatterjee's ξ must stay in its theoretical
  * range and read ≈0 on an independent pair.
  */
class Extras104Spec extends SparkSpec {

  test("graph_modularity_score: LPA communities beat the chance baseline") {
    // sf0.001's ~100-user graph is dense enough that LPA legitimately
    // merges everything (one community -> Q = 0 exactly); the sharp
    // structure check needs the sf0.1 graph
    val r = queries.Extras104.graphModularityScore(spark, sf).head()
    val (m, eWithin, q) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(m > 0 && eWithin > 0,
      s"degenerate partition: m=$m e_within=$eWithin — the synchronous-LPA " +
        "oscillation the self-vote prevents is back")
    assert(q >= 0.0 && q <= 1.0, s"modularity $q out of range")
    sf01.foreach { big =>
      val rb = queries.Extras104.graphModularityScore(spark, big).head()
      assert(rb.getLong(1) > 0, "sf0.1: zero intra-community edges")
      assert(rb.getDouble(3) > 0.05 && rb.getDouble(3) <= 1.0,
        s"sf0.1 modularity ${rb.getDouble(3)} does not certify community structure")
    }
  }

  test("stat_xi_correlation: within theoretical bounds, ~0 for date vs price") {
    val rows = queries.Extras104.statXiCorrelation(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val xi = r.getDouble(2)
      // xi_n >= -1/2 always, <= 1; date does not determine price, so
      // the estimate must sit near zero (generous finite-n slack)
      assert(xi >= -0.5 && xi <= 1.0, s"${r.getString(0)}: xi=$xi out of range")
      assert(math.abs(xi) < 0.25, s"${r.getString(0)}: xi=$xi far from 0 " +
        "for an independent pair")
    }
  }
}
