package graft

/** Wave-134 properties: WW DP vs an independent O(T²) solve + policy
  * optimality, RTS smoother vs the sequential two-pass, CRPS vs a
  * brute-force ensemble replay (+ the m=1 MAE identity), PIT bins vs a
  * rank replay — at sf0.001.
  */
class Extras234Spec extends SparkSpec {

  private def monthly(col0: String, tbl: String => org.apache.spark.sql.DataFrame,
      valueExpr: String): Seq[Long] =
    tbl(col0).selectExpr(s"CAST(date_trunc('month', $col0) AS STRING) AS m", valueExpr + " AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)

  test("analytics_wagner_whitin: matches an independent DP; policy beats naive plans") {
    val dem = Tables.lineitem(spark, sf)
      .selectExpr("CAST(date_trunc('month', l_shipdate) AS STRING) AS m",
        "CAST(l_quantity AS BIGINT) AS q")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum / 1000)
    val t = dem.length
    val f = Array.fill(t + 1)(Long.MaxValue); f(0) = 0
    for (i <- 1 to t; j <- 1 to i) {
      var hold = 0L
      for (x <- j to i) hold += (x - j) * dem(x - 1)
      val c = f(j - 1) + 5000 + hold
      if (c < f(i)) f(i) = c
    }
    val row = queries.Extras234.analyticsWagnerWhitin(spark, sf).collect().head
    assert(row.getLong(0) == t.toLong)
    assert(row.getLong(1) == f(t), s"optimal cost ${row.getLong(1)} vs ${f(t)}")
    assert(row.getLong(1) <= row.getLong(3), "optimal beats order-every-month")
    assert(row.getLong(1) <= row.getLong(4), "optimal beats single order")
    assert(row.getLong(2) >= 1 && row.getLong(2) <= t, "order count sane")
    assert(row.getLong(3) == t * 5000L)
  }

  test("time_kalman_smoother: matches the sequential two-pass; smoother pins the filter at n") {
    val ms = monthly("o_orderdate", d => Tables.orders(spark, sf),
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
    val n = ms.length
    val ds = (1 until n).map(i => ms(i) - ms(i - 1))
    val sd1 = ds.map(BigInt(_)).sum; val sd2 = ds.map(x => BigInt(x) * x).sum
    val nd = ds.length
    val vd = (nd.toDouble * sd2.toDouble - sd1.toDouble * sd1.toDouble) / (nd.toDouble * (nd - 1))
    val q = vd / 10; val r = vd / 2
    val m = new Array[Double](n); val p = new Array[Double](n)
    m(0) = ms(0).toDouble; p(0) = vd
    for (i <- 1 until n) {
      val pp = p(i - 1) + q; val k = pp / (pp + r)
      m(i) = m(i - 1) + k * (ms(i) - m(i - 1)); p(i) = (1 - k) * pp
    }
    val xs = new Array[Double](n); xs(n - 1) = m(n - 1)
    for (i <- n - 2 to 0 by -1)
      xs(i) = m(i) + p(i) / (p(i) + q) * (xs(i + 1) - m(i))
    var revq = 0L
    for (i <- 0 until n) revq += math.floor(math.abs(xs(i) - m(i)) / 100 * 100 + 0.5).toLong
    val row = queries.Extras234.timeKalmanSmoother(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - xs(0) / 100) < 0.02, "smoothed first")
    assert(math.abs(row.getDouble(2) - m(n - 1) / 100) < 0.02, "smoothed last == filtered last")
    assert(math.abs(row.getDouble(3) - revq.toDouble / n / 100) < 0.02, "mean revision")
    assert(row.getDouble(3) >= 0)
  }

  test("stat_crps_ensemble: matches a brute-force replay; one-member CRPS = MAE") {
    val ms = monthly("o_orderdate", d => Tables.orders(spark, sf),
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
    val n = ms.length
    var terms = Seq.empty[(Long, Long)] // (cq, m)
    for (t <- 0 until n) {
      val e2 = (1 to t / 12).map(k => ms(t - 12 * k))
      if (e2.nonEmpty) {
        val mm = e2.length.toLong
        val say = e2.map(x => math.abs(x - ms(t))).sum
        val sxx = (for (a <- e2; b <- e2) yield math.abs(a - b)).sum
        val cq = ((2 * mm * say - sxx) * 100) / (2 * mm * mm)
        terms :+= ((cq, mm))
        // one-member identity: CRPS reduces to MAE when m = 1
        if (mm == 1) assert(cq == say * 100, "m=1: CRPS lattice == MAE")
      }
    }
    val row = queries.Extras234.statCrpsEnsemble(spark, sf).collect().head
    assert(row.getLong(0) == terms.length.toLong)
    assert(row.getLong(1) == terms.map(_._2).min && row.getLong(2) == terms.map(_._2).max)
    val mean = terms.map(x => BigInt(x._1)).sum.toDouble / terms.length / 100 / 100
    assert(math.abs(row.getDouble(3) - mean) < 0.02, s"CRPS ${row.getDouble(3)} vs $mean")
    assert(row.getDouble(3) > 0)
  }

  test("stat_pit_calibration: matches the rank replay; bins partition the scored months") {
    val ms = monthly("o_orderdate", d => Tables.orders(spark, sf),
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
    val n = ms.length
    val bins = Array.fill(4)(0L)
    var scored = 0L
    for (t <- 0 until n) {
      val e2 = (1 to t / 12).map(k => ms(t - 12 * k))
      if (e2.nonEmpty) {
        scored += 1
        val rnk = e2.count(_ < ms(t)).toLong
        val bin = math.min(4 * (rnk + 1) / (e2.length + 1), 3L)
        bins(bin.toInt) += 1
      }
    }
    var chi = 0.0
    bins.foreach { c =>
      val e = scored.toDouble / 4
      chi += math.floor((c - e) * (c - e) / e * 1e9 + 0.5) / 1e9
    }
    val edge = (bins(0) + bins(3)).toDouble / scored
    val row = queries.Extras234.statPitCalibration(spark, sf).collect().head
    assert(row.getLong(0) == scored)
    assert(math.abs(row.getDouble(1) - chi) < 1e-3, s"chi2 ${row.getDouble(1)} vs $chi")
    assert(math.abs(row.getDouble(2) - edge) < 1e-3)
    val verdict = if (edge > 0.6) "too_narrow" else if (edge < 0.4) "too_wide" else "calibrated"
    assert(row.getString(3) == verdict)
    assert(bins.sum == scored, "bins partition the scored months")
  }
}
