package graft

/** Wave-143 properties at sf0.001: Lilliefors vs a sorted-ECDF replay,
  * uncertainty coefficients vs entropy algebra, EWMA chart vs a driver
  * recursion replay, Cochran's C bounds.
  */
class Extras243Spec extends SparkSpec {

  private def phi(z: Double): Double = math.exp(-(z * z) / 2) / math.sqrt(2 * math.Pi)
  private def bigPhi(z: Double): Double = {
    val p = 0.2316419
    def poly(t: Double): Double =
      t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    if (z >= 0) 1 - phi(z) * poly(1 / (1 + p * z)) else phi(z) * poly(1 / (1 - p * z))
  }

  test("stat_lilliefors: matches the ECDF replay; rejects the skewed totals") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(_.getLong(0))
    val n = vs.length
    val mu = vs.map(BigInt(_)).sum.toDouble / n
    val svv = vs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val sv = vs.map(BigInt(_)).sum.toDouble
    val sig = math.sqrt((n * svv - sv * sv) / (n.toDouble * (n - 1)))
    val byV = vs.groupBy(identity).map { case (v, g) => v -> g.length }.toSeq.sortBy(_._1)
    var cum = 0L; var dmax = 0L
    byV.foreach { case (v, c) =>
      val f = bigPhi((v - mu) / sig)
      val d = math.max(math.abs((cum + c).toDouble / n - f), math.abs(f - cum.toDouble / n))
      val dq = math.floor(d * 1e9 + 0.5).toLong
      if (dq > dmax) dmax = dq
      cum += c
    }
    val row = queries.Extras243.statLilliefors(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - dmax / 1e9) < 1e-6, s"D ${row.getDouble(1)} vs ${dmax / 1e9}") // query rounds to 6dp
    assert(row.getBoolean(3), "order totals are right-skewed: normality must reject")
  }

  test("stat_uncertainty_coeff: matches entropy algebra; all in [0,1]") {
    val cells = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderpriority"),
        Seq("l_orderkey"))
      .selectExpr("l_returnflag AS r", "o_orderpriority AS c").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = cells.length.toLong
    def h(counts: Iterable[Long]): Double = {
      val klnk = counts.filter(_ > 1)
        .map(k => math.floor(k * math.log(k.toDouble) * 1e6 + 0.5).toLong).sum
      math.log(n.toDouble) - klnk / 1e6 / n
    }
    val hr = h(cells.groupBy(_._1).map(_._2.length.toLong))
    val hc = h(cells.groupBy(_._2).map(_._2.length.toLong))
    val hj = h(cells.groupBy(identity).map(_._2.length.toLong))
    val row = queries.Extras243.statUncertaintyCoeff(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - (hr + hc - hj) / hr) < 1e-5)
    assert(math.abs(row.getDouble(2) - (hr + hc - hj) / hc) < 1e-5)
    assert(math.abs(row.getDouble(3) - 2 * (hr + hc - hj) / (hr + hc)) < 1e-5)
    Seq(1, 2, 3).foreach(i => assert(row.getDouble(i) >= -1e-9 && row.getDouble(i) <= 1.0))
  }

  test("time_ewma_chart: matches the driver recursion replay") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray
    val n = ms.length
    val mu = ms.map(BigInt(_)).sum.toDouble / n
    val svv = ms.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val sv = ms.map(BigInt(_)).sum.toDouble
    val sig = math.sqrt((n * svv - sv * sv) / (n.toDouble * (n - 1)))
    var zq = math.floor(mu * 1e3 + 0.5).toLong
    var pq = 1000000000000000L
    var nsig = 0L; var first = 0L; var maxrq = 0L
    for (t <- 1 to n) {
      zq = math.floor((0.2 * ms(t - 1) + 0.8 * (zq / 1e3)) * 1e3 + 0.5).toLong
      pq = math.floor(pq / 1e15 * 0.64 * 1e15 + 0.5).toLong
      val lim = 3 * sig * math.sqrt(0.2 / 1.8 * (1 - pq / 1e15))
      val rq = math.floor(math.abs(zq / 1e3 - mu) / lim * 1e6 + 0.5).toLong
      if (rq > maxrq) maxrq = rq
      if (rq > 1000000L) { nsig += 1; if (first == 0L) first = t.toLong }
    }
    val row = queries.Extras243.timeEwmaChart(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == nsig, s"signals ${row.getLong(1)} vs $nsig")
    assert(row.getLong(2) == first)
    assert(math.abs(row.getDouble(3) - maxrq / 1e6) < 1e-4)
  }

  test("stat_cochran_c: C in [1/k, 1]; identifies the max-variance group") {
    val row = queries.Extras243.statCochranC(spark, sf).collect().head
    val k = row.getLong(0)
    assert(k == 5)
    assert(row.getDouble(1) >= 1.0 / k - 1e-9 && row.getDouble(1) <= 1.0)
    assert(math.abs(row.getDouble(3) - row.getDouble(1) * k) < 2e-3)
    val g = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS grp",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (grp, xs) =>
        val nn = xs.length
        val s = xs.map(x => BigInt(x._2)).sum.toDouble
        val ss = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble
        grp -> (nn * ss - s * s) / (nn.toDouble * (nn - 1))
      }
    assert(row.getString(2) == g.maxBy(_._2)._1, "max-variance group")
  }
}
