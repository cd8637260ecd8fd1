package graft

/** Wave-95 properties: Alexander–Govern, Kuiper, jackknife r CI, and
  * Fligner–Policello replayed against brute force at sf0.001.
  */
class Extras195Spec extends SparkSpec {

  test("stat_alexander_govern: Hill-transform replay; A >= 0") {
    val xs = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0).substring(0, 1).toInt, math.round(r.getDouble(1) * 100)))
    val grps = xs.groupBy(_._1).toSeq.sortBy(_._1)
    val st = grps.map { case (_, g) =>
      val ng = g.size.toLong
      val sg = g.map(x => BigInt(x._2)).sum
      val qg = g.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val mu = sg.toDouble / ng / 100
      val se2 = (ng.toDouble * qg.toDouble - sg.toDouble * sg.toDouble) /
        (ng.toDouble * (ng - 1)) / 1e4 / ng
      (ng, mu, se2)
    }
    val wq = st.map { case (ng, mu, se2) => math.floor(1 / se2 * 1e12 + 0.5).toLong }
    val wmq = st.map { case (ng, mu, se2) => math.floor(1 / se2 * mu * 1e9 + 0.5).toLong }
    val grand = wmq.sum.toDouble / wq.sum * 1e3
    val aq = st.map { case (ng, mu, se2) =>
      val a = ng - 1.5
      val b = 48 * a * a
      val cc = a * math.log(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))
      val c = math.sqrt(cc)
      val z = c + (math.pow(c, 3) + 3 * c) / b -
        (4 * math.pow(c, 7) + 33 * math.pow(c, 5) + 240 * math.pow(c, 3) + 855 * c) /
          (10 * b * b + 8 * b * cc * cc + 1000 * b)
      math.floor(z * z * 1e9 + 0.5).toLong
    }.sum
    val row = queries.Extras195.statAlexanderGovern(spark, sf).collect().head
    assert(row.getLong(0) == st.size.toLong && row.getLong(1) == xs.length.toLong)
    assert(math.abs(row.getDouble(2) - aq / 1e9) < 1e-4)
    assert(row.getDouble(2) >= 0)
    assert(row.getLong(3) == st.size - 1)
  }

  test("stat_kuiper: integer ECDF-gap replay; V >= max(D+, D-)") {
    val hs = Tables.events(spark, sf).select("ts").collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).getHour)
    val n = hs.length.toLong
    val cum = (0 until 24).map(h => hs.count(_ <= h).toLong)
    val dp = (0 until 24).map(k => 24 * cum(k) - (k + 1) * n).max
    val dm = (0 until 24).map(k => (k + 1) * n - 24 * cum(k)).max
    val row = queries.Extras195.statKuiper(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - math.max(dp, 0L).toDouble / 24 / n) < 1e-6)
    assert(math.abs(row.getDouble(2) - math.max(dm, 0L).toDouble / 24 / n) < 1e-6)
    val v = (math.max(dp, 0L).toDouble + math.max(dm, 0L)) / 24 / n
    assert(math.abs(row.getDouble(3) - v * (math.sqrt(n.toDouble) + 0.155 + 0.24 / math.sqrt(n.toDouble))) < 1e-5)
    assert(row.getDouble(3) >= math.max(row.getDouble(1), row.getDouble(2)))
  }

  test("stat_jackknife_corr_ci: loo-moment replay; ci_low <= r <= ci_high") {
    val xs = Tables.lineitem(spark, sf).select("l_quantity", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100)))
    val n = xs.length
    val sx = xs.map(t => BigInt(t._1)).sum; val sy = xs.map(t => BigInt(t._2)).sum
    val sxx = xs.map(t => BigInt(t._1) * BigInt(t._1)).sum
    val syy = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val sxy = xs.map(t => BigInt(t._1) * BigInt(t._2)).sum
    val zq = xs.map { case (x, y) =>
      val nn = n - 1
      val r = (nn.toDouble * (sxy - BigInt(x) * BigInt(y)).toDouble - (sx - x).toDouble * (sy - y).toDouble) /
        math.sqrt((nn.toDouble * (sxx - BigInt(x) * BigInt(x)).toDouble - (sx - x).toDouble * (sx - x).toDouble) *
          (nn.toDouble * (syy - BigInt(y) * BigInt(y)).toDouble - (sy - y).toDouble * (sy - y).toDouble))
      math.floor(0.5 * math.log((1 + r) / (1 - r)) * 1e9 + 0.5).toLong
    }
    val zbar = zq.map(BigInt(_)).sum.toDouble / n
    val sd2 = zq.map(z => math.floor((z - zbar) * (z - zbar) + 0.5).toLong).sum
    val se = math.sqrt((n - 1.0) / n * sd2 / 1e18)
    def tanh2(z: Double) = (math.exp(2 * z) - 1) / (math.exp(2 * z) + 1)
    val row = queries.Extras195.statJackknifeCorrCi(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(2) - tanh2(zbar / 1e9 - 1.959964 * se)) < 1e-5)
    assert(math.abs(row.getDouble(3) - tanh2(zbar / 1e9 + 1.959964 * se)) < 1e-5)
    assert(row.getDouble(2) <= row.getDouble(1) && row.getDouble(1) <= row.getDouble(3))
  }

  test("stat_fligner_policello: placement replay; sign(U) = sign(sumP - sumQ)") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    val a = xs.filter(_._1 == "A").map(_._2); val b = xs.filter(_._1 == "R").map(_._2)
    // ×2 placements
    val p2 = a.map(v => 2L * b.count(_ < v) + b.count(_ == v))
    val q2 = b.map(v => 2L * a.count(_ < v) + a.count(_ == v))
    val sp2 = p2.map(BigInt(_)).sum; val sq2 = q2.map(BigInt(_)).sum
    val spp4 = p2.map(x => BigInt(x) * BigInt(x)).sum
    val sqq4 = q2.map(x => BigInt(x) * BigInt(x)).sum
    val n1 = a.length; val n2 = b.length
    val u = (sp2.toDouble - sq2.toDouble) / (2 * math.sqrt(
      (spp4.toDouble - sp2.toDouble * sp2.toDouble / n1)
        + (sqq4.toDouble - sq2.toDouble * sq2.toDouble / n2)
        + (sp2.toDouble / n1) * (sq2.toDouble / n2)))
    val row = queries.Extras195.statFlignerPolicello(spark, sf).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(2) - u) < 1e-5)
    assert(math.signum(row.getDouble(2)) == math.signum(sp2.toDouble - sq2.toDouble) || u == 0)
    assert(math.abs(row.getDouble(3) - sp2.toDouble / n1 / 2 / n2) < 1e-6)
  }
}
