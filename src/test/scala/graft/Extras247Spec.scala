package graft

/** Wave-147 properties at sf0.001: scorecard-quality identities for
  * the declared risk model — Tjur vs direct means, McFadden bounds,
  * calibration slope ≈ the true generator relation, AUC vs a direct
  * pairwise replay.
  */
class Extras247Spec extends SparkSpec {

  private lazy val strata: Array[(Long, Long, Double)] = Tables.lineitem(spark, sf)
    .selectExpr("l_discount AS x", "l_returnflag = 'R' AS y")
    .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    .groupBy(_._1).toArray.sortBy(_._1).map { case (x, g) =>
      (g.length.toLong, g.count(_._2).toLong,
        math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5) / 1e12)
    }

  test("stat_tjur_r2: matches direct conditional means; |R2| <= 1") {
    val o = strata.map(_._2).sum; val z = strata.map(s => s._1 - s._2).sum
    val m1 = strata.map(s => s._2 * s._3).sum / o
    val m0 = strata.map(s => (s._1 - s._2) * s._3).sum / z
    val row = queries.Extras247.statTjurR2(spark, sf).collect().head
    assert(row.getLong(0) == o + z)
    assert(math.abs(row.getDouble(1) - m1) < 1e-5)
    assert(math.abs(row.getDouble(2) - m0) < 1e-5)
    assert(math.abs(row.getDouble(3) - (m1 - m0)) < 1e-5)
    assert(math.abs(row.getDouble(3)) <= 1.0)
  }

  test("stat_mcfadden_r2: model LL >= null LL (declared score fits the generator)") {
    val row = queries.Extras247.statMcfaddenR2(spark, sf).collect().head
    assert(row.getDouble(1) <= 0 && row.getDouble(2) <= 0, "log-likelihoods negative")
    // McFadden R2 can be slightly negative if the declared score is
    // worse than the base rate; bound it sanely either way
    assert(row.getDouble(3) > -0.05 && row.getDouble(3) < 1.0)
  }

  test("stat_calibration_slope: Newton converged (score equation ~ 0)") {
    val row = queries.Extras247.statCalibrationSlope(spark, sf).collect().head
    val (a, b) = (row.getDouble(1), row.getDouble(2))
    val sc = strata.map { case (n, o, p) =>
      val lg = math.floor(math.log(p / (1 - p)) * 1e12 + 0.5) / 1e12
      o - n / (1 + math.exp(-(a + b * lg)))
    }.sum
    assert(math.abs(sc) / strata.map(_._1).sum < 1e-3, s"score $sc")
    assert(Set("overconfident", "underconfident", "ok")(row.getString(3)))
  }

  test("stat_auc_gini: matches a direct tie-aware pairwise replay") {
    val o = strata.map(_._2).sum.toDouble; val z = strata.map(s => s._1 - s._2).sum.toDouble
    // tie-aware AUC: P(score_event > score_nonevent) + 0.5 P(equal)
    var num = 0.0
    for (i <- strata.indices; j <- strata.indices) {
      val (ei, zi) = (strata(i)._2.toDouble, strata(j)._1 - strata(j)._2.toDouble)
      if (strata(i)._3 > strata(j)._3) num += ei * zi
      else if (strata(i)._3 == strata(j)._3) num += 0.5 * ei * zi
    }
    val auc = num / (o * z)
    val row = queries.Extras247.statAucGini(spark, sf).collect().head
    assert(math.abs(row.getDouble(1) - auc) < 1e-5, s"AUC ${row.getDouble(1)} vs $auc")
    assert(math.abs(row.getDouble(2) - (2 * auc - 1)) < 1e-5, "Gini = 2AUC-1")
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1, "KS in [0,1]")
    assert(row.getDouble(1) >= 0.5 - 0.1, "score is not anti-predictive")
  }
}
