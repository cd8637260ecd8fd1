package graft

/** Wave-96 properties: distance correlation, energy test, Filliben
  * PPCC (incl. the Acklam inverse normal), degree Gini vs brute force.
  */
class Extras196Spec extends SparkSpec {

  /** Acklam's inverse normal — mirror of the SQL rational polynomial. */
  private def qnorm(p: Double): Double = {
    if (p < 0.02425) {
      val q = math.sqrt(-2 * math.log(p))
      (((((-7.784894002430293e-03 * q - 3.223964580411365e-01) * q
        - 2.400758277161838e+00) * q - 2.549732539343734e+00) * q
        + 4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q
          + 2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1)
    } else if (p > 1 - 0.02425) {
      -qnorm(1 - p) // symmetric upper tail — same ops as the SQL branch
    } else {
      val q = p - 0.5; val r = q * q
      (((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r
        - 2.759285104469687e+02) * r + 1.383577518672690e+02) * r
        - 3.066479806614716e+01) * r + 2.506628277459239e+00) * q /
        (((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r
          - 1.556989798598866e+02) * r + 6.680131188771972e+01) * r
          - 1.328068155288572e+01) * r + 1)
    }
  }

  private def nationXY(): Seq[(Long, Long)] = {
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    val ords = Tables.orders(spark, sf).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val natOf = cust.map(c => (c._1, c._2)).toMap
    val x = cust.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val y = ords.filter(o => natOf.contains(o._1)).groupBy(o => natOf(o._1))
      .view.mapValues(_.map(_._2).sum).toMap
    x.keySet.intersect(y.keySet).toSeq.sorted.map(k => (x(k), y(k)))
  }

  test("stat_distance_corr: x-n2-centered replay; 0 <= dcor <= 1") {
    val pts = nationXY()
    val n = pts.size
    def mat(f: ((Long, Long)) => Long): Array[Array[BigInt]] =
      pts.map(p => pts.map(q => BigInt(math.abs(f(p) - f(q)))).toArray).toArray
    val am = mat(_._1); val bm = mat(_._2)
    def centered(m: Array[Array[BigInt]]): Array[Array[BigInt]] = {
      val r = m.map(_.sum); val s = r.sum
      Array.tabulate(n, n)((i, j) => BigInt(n) * n * m(i)(j) - BigInt(n) * r(i) - BigInt(n) * r(j) + s)
    }
    val ac = centered(am); val bc = centered(bm)
    var sab = BigInt(0); var saa = BigInt(0); var sbb = BigInt(0)
    for (i <- 0 until n; j <- 0 until n) {
      sab += ac(i)(j) * bc(i)(j); saa += ac(i)(j) * ac(i)(j); sbb += bc(i)(j) * bc(i)(j)
    }
    val dcor2 = sab.toDouble / math.sqrt(saa.toDouble * sbb.toDouble)
    val row = queries.Extras196.statDistanceCorr(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - dcor2) < 1e-5)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
    assert(math.abs(row.getDouble(2) - math.sqrt(math.max(dcor2, 0))) < 1e-5)
  }

  test("stat_energy_test: pair-sum replay; energy_dist >= 0") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    val a = xs.filter(_._1 == "A").map(_._2); val b = xs.filter(_._1 == "R").map(_._2)
    def cross(u: Seq[Int], v: Seq[Int]): BigInt =
      BigInt(u.map(x => v.map(y => math.abs(x - y).toLong).sum).sum)
    val exy = cross(a, b).toDouble / a.size / b.size
    val exx = cross(a, a).toDouble / a.size / a.size
    val eyy = cross(b, b).toDouble / b.size / b.size
    val e = 2 * exy - exx - eyy
    val row = queries.Extras196.statEnergyTest(spark, sf).collect().head
    assert(row.getLong(0) == a.size.toLong && row.getLong(1) == b.size.toLong)
    assert(math.abs(row.getDouble(2) - exy) < 1e-5)
    assert(math.abs(row.getDouble(3) - e) < 1e-5)
    assert(row.getDouble(3) >= -1e-9)
    assert(math.abs(row.getDouble(4) - a.size.toDouble * b.size / (a.size + b.size) * e) < 1e-3)
  }

  test("stat_filliben_ppcc: plotting-position replay; 0 < ppcc <= 1") {
    val cv = Tables.orders(spark, sf).select("o_totalprice", "o_orderkey").collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).map(_._1)
    val n = cv.length
    val mq = cv.indices.map { i0 =>
      val i = i0 + 1
      val u = if (i == 1) 1 - math.pow(0.5, 1.0 / n)
        else if (i == n) math.pow(0.5, 1.0 / n)
        else (i - 0.3175) / (n + 0.365)
      math.floor(qnorm(u) * 1e6 + 0.5).toLong
    }
    val sm = mq.map(BigInt(_)).sum; val smm = mq.map(x => BigInt(x) * BigInt(x)).sum
    val smx = mq.zip(cv).map { case (m, x) => BigInt(m) * BigInt(x) }.sum
    val sx = cv.map(BigInt(_)).sum; val sxx = cv.map(x => BigInt(x) * BigInt(x)).sum
    val r = (n.toDouble * smx.toDouble - sm.toDouble * sx.toDouble) /
      math.sqrt((n.toDouble * smm.toDouble - sm.toDouble * sm.toDouble) *
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble))
    val row = queries.Extras196.statFillibenPpcc(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - r) < 1e-5)
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1)
  }

  test("graph_degree_gini: histogram block replay; 0 <= G < 1") {
    val users = Tables.events(spark, sf).select("user_id").collect().map(_.getLong(0)).distinct
    val n = users.length
    val arcs = users.flatMap(u => Seq((u, (u + 1) % n), (u, (u + 2) % n), (u, (u * 7 + 3) % n)))
      .filter(p => p._1 != p._2)
    val edges = (arcs ++ arcs.map(p => (p._2, p._1))).distinct
    val degs = edges.groupBy(_._1).values.map(_.size.toLong).toSeq.sorted
    val nn = degs.size; val sd = degs.sum
    val gnum = degs.zipWithIndex.map { case (dv, i) => dv * (2L * (i + 1) - nn - 1) }.sum
    val g = gnum.toDouble / (nn.toDouble * sd)
    val row = queries.Extras196.graphDegreeGini(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong)
    assert(math.abs(row.getDouble(1) - sd.toDouble / nn) < 1e-3)
    assert(math.abs(row.getDouble(2) - g) < 1e-5)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) < 1)
  }
}
