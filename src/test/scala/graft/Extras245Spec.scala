package graft

/** Wave-145 properties at sf0.001: 2×2 identities and calibration
  * replays — RR/AR from exact cells, AC vs Wald width, Spiegelhalter
  * vs a direct stratum replay.
  */
class Extras245Spec extends SparkSpec {

  private lazy val cells: (Long, Long, Long, Long) = {
    val xs = Tables.lineitem(spark, sf)
      .selectExpr("l_discount > 0.05 AS e", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    (xs.count(x => x._1 && x._2).toLong, xs.count(x => x._1 && !x._2).toLong,
      xs.count(x => !x._1 && x._2).toLong, xs.count(x => !x._1 && !x._2).toLong)
  }

  test("stat_risk_ratio_ci: matches cell algebra; CI brackets the point estimate") {
    val (a, b, c, dd) = cells
    val p1 = a.toDouble / (a + b); val p0 = c.toDouble / (c + dd)
    val se = math.sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + dd))
    val row = queries.Extras245.statRiskRatioCi(spark, sf).collect().head
    assert(row.getLong(0) == a + b + c + dd)
    assert(math.abs(row.getDouble(1) - p1 / p0) < 1e-5)
    assert(math.abs(row.getDouble(2) - p1 / p0 * math.exp(-1.96 * se)) < 1e-5)
    assert(math.abs(row.getDouble(3) - p1 / p0 * math.exp(1.96 * se)) < 1e-5)
    assert(row.getDouble(2) < row.getDouble(1) && row.getDouble(1) < row.getDouble(3))
  }

  test("stat_attributable_risk: identities hold") {
    val (a, b, c, dd) = cells
    val p1 = a.toDouble / (a + b); val p0 = c.toDouble / (c + dd)
    val p = (a + c).toDouble / (a + b + c + dd)
    val row = queries.Extras245.statAttributableRisk(spark, sf).collect().head
    assert(math.abs(row.getDouble(1) - (p1 - p0)) < 1e-5, "RD")
    assert(math.abs(row.getDouble(2) - (p1 - p0) / p1) < 1e-5, "AF exposed")
    assert(math.abs(row.getDouble(3) - (p - p0) / p) < 1e-5, "PAF")
    assert(math.abs(row.getDouble(4) - 1.0 / math.abs(p1 - p0)) < 0.5, "NNT")
    // PAF <= AF_exposed in absolute value when exposure < 100%
    assert(math.abs(row.getDouble(3)) <= math.abs(row.getDouble(2)) + 1e-9)
  }

  test("stat_agresti_coull: AC interval is inside-shifted vs Wald; covers p_hat") {
    val row = queries.Extras245.statAgrestiCoull(spark, sf).collect().head
    val (ph, acLo, acHi, wLo, wHi) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(acLo < ph && ph < acHi, "AC covers p_hat")
    assert(wLo < ph && ph < wHi, "Wald covers p_hat")
    // AC center is pulled toward 1/2 relative to Wald's center p_hat
    val acCenter = (acLo + acHi) / 2
    assert((ph - 0.5) * (ph - acCenter) >= -1e-9, "AC center shrunk toward 1/2")
  }

  test("stat_spiegelhalter_z: matches the stratum replay") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount AS x", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
      .groupBy(_._1).map { case (x, ys) => (x, ys.length.toLong, ys.count(_._2).toLong) }
    var sn = 0L; var sd = 0L
    g.foreach { case (x, n, o) =>
      val p = math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5) / 1e12
      sn += math.floor((o - n * p) * (1 - 2 * p) * 1e6 + 0.5).toLong
      sd += math.floor(n * p * (1 - p) * (1 - 2 * p) * (1 - 2 * p) * 1e6 + 0.5).toLong
    }
    val z = sn / 1e6 / math.sqrt(sd / 1e6)
    val row = queries.Extras245.statSpiegelhalterZ(spark, sf).collect().head
    assert(row.getLong(0) == g.map(_._2).sum)
    assert(math.abs(row.getDouble(1) - z) < 1e-3, s"z ${row.getDouble(1)} vs $z")
    assert(row.getBoolean(2) == (math.abs(z) <= 1.96))
  }
}
