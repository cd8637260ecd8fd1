package graft

/** Wave-144 properties at sf0.001: LISA identity vs global Moran,
  * robust scales vs direct order-stat replays, winsorized corr
  * bounds, medcouple vs a kernel replay.
  */
class Extras244Spec extends SparkSpec {

  private lazy val months: Array[Long] = Tables.orders(spark, sf)
    .selectExpr("date_trunc('month', o_orderdate) AS m",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
    .collect().map(r => (r.get(0).toString, r.getLong(1)))
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  private def med(a: Array[Double]): Double = {
    val so = a.sorted; val k = so.length
    if (k % 2 == 1) so(k / 2) else (so(k / 2 - 1) + so(k / 2)) / 2
  }

  test("stat_local_moran: top-5 cells, quadrants consistent with signs") {
    val rows = queries.Extras244.statLocalMoran(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val q = r.getString(3)
      val li = r.getDouble(2)
      assert(Set("HH", "LL", "HL", "LH")(q))
      // HH and LL have positive local I; HL/LH negative
      if (q == "HH" || q == "LL") assert(li > 0, s"$q should have positive I")
      else assert(li < 0, s"$q should have negative I")
      assert(r.getLong(0) >= 0 && r.getLong(0) < 32 && r.getLong(1) >= 0 && r.getLong(1) < 32)
    }
  }

  test("stat_robust_scale_battery: matches direct order-stat replays; all positive") {
    val ms = months
    val n = ms.length
    def medL(a: Array[Long]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2).toDouble else (so(k / 2 - 1) + so(k / 2)) / 2.0
    }
    val m0 = medL(ms)
    val mad = medL(ms.map(x => math.abs(x - math.floor(m0 + 0.5).toLong))) * 1.4826
    val sorted = ms.sorted
    val q1 = medL(sorted.take(n / 2)); val q3 = medL(sorted.takeRight(n / 2))
    val iqr = (q3 - q1) / 1.349
    val diffs = (for (i <- 0 until n; j <- (i + 1) until n)
      yield math.abs(ms(i) - ms(j))).sorted
    val h = n / 2 + 1
    val qn = diffs(h * (h - 1) / 2 - 1) * 2.2219
    val rows = queries.Extras244.statRobustScaleBattery(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size == 4)
    assert(math.abs(rows("mad_14826") - mad / 100) < 0.02, "MAD")
    assert(math.abs(rows("iqr_1349") - iqr / 100) < 0.02, "IQR")
    assert(math.abs(rows("qn_22219") - qn / 100) < 0.02, "Qn")
    rows.values.foreach(v => assert(v > 0))
  }

  test("stat_winsorized_corr: |r| <= 1 both; clamping changes the tails only") {
    val row = queries.Extras244.statWinsorizedCorr(spark, sf).collect().head
    assert(math.abs(row.getDouble(1)) <= 1.0 && math.abs(row.getDouble(2)) <= 1.0)
    // the synthetic generator draws quantity and price independently:
    // both correlations are near zero and clamping can't invent signal
    assert(math.abs(row.getDouble(1) - row.getDouble(2)) < 0.5)
    val n = Tables.lineitem(spark, sf).count()
    assert(row.getLong(0) == n)
  }

  test("stat_medcouple: matches the kernel replay; fences bracket the quartiles") {
    val ms = months
    val m0 = med(ms.map(_.toDouble))
    val lo = ms.filter(_ <= m0); val hi = ms.filter(_ >= m0)
    val kern = (for (xi <- lo; xj <- hi; if xj != xi)
      yield ((xj - m0) - (m0 - xi)) / (xj - xi).toDouble).toArray
    val mc = med(kern)
    val row = queries.Extras244.statMedcouple(spark, sf).collect().head
    assert(row.getLong(0) == ms.length.toLong)
    assert(math.abs(row.getDouble(1) - mc) < 1e-5, s"MC ${row.getDouble(1)} vs $mc")
    assert(math.abs(row.getDouble(1)) <= 1.0, "medcouple bounded")
    assert(row.getDouble(2) < row.getDouble(3), "lo fence < hi fence")
  }
}
