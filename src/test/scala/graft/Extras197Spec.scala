package graft

/** Wave-97 properties: spectral flatness, Little's law, Yuen trimmed
  * t, exact median CI vs brute force at sf0.001.
  */
class Extras197Spec extends SparkSpec {

  test("time_spectral_flatness: AM-GM bound 0 < flatness <= 1; replay") {
    val hourly = Tables.events(spark, sf).select("ts").collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).withMinute(0).withSecond(0).withNano(0))
      .groupBy(identity).toSeq.sortBy(_._1.toString).map(_._2.size.toLong)
    val n = hourly.size
    val sc = hourly.map(BigInt(_)).sum
    val x = hourly.map(c => BigInt(n) * c - sc)
    val es = (2 to 24).map { p =>
      var a = BigInt(0); var b = BigInt(0)
      x.zipWithIndex.foreach { case (xv, t0) =>
        val t = t0 + 1
        a += xv * BigInt(math.floor(math.cos(2 * math.Pi * t / p) * 1e6 + 0.5).toLong)
        b += xv * BigInt(math.floor(math.sin(2 * math.Pi * t / p) * 1e6 + 0.5).toLong)
      }
      a.toDouble * a.toDouble + b.toDouble * b.toDouble
    }
    val tot = es.sum
    val flat = if (es.exists(_ <= 0)) 0.0
      else math.exp(es.map(math.log).sum / es.size) / (tot / es.size)
    val row = queries.Extras197.timeSpectralFlatness(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - flat) < 1e-4)
    assert(row.getDouble(0) > 0 && row.getDouble(0) <= 1 + 1e-9)
    assert(math.abs(row.getDouble(1) - es.max / tot) < 1e-4)
  }

  test("analytics_little_law_audit: sweep-line replay; ratio near 1") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay))
    val ords = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay))
      .toMap
    val spans = li.groupBy(_._1).toSeq.collect { case (ok, g) if ords.contains(ok) =>
      val a = ords(ok); val e = math.max(g.map(_._2).max, a); (a, e)
    }
    val nOrders = spans.size
    val sw = spans.map(s => s._2 - s._1 + 1).sum
    val amin = spans.map(_._1).min; val emax = spans.map(_._2).max
    val deltas = (spans.map(s => (s._1, 1L)) ++ spans.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
    var wip = 0L; var area = BigInt(0)
    deltas.sliding(2).foreach { pair =>
      wip += pair.head._2
      if (pair.size == 2) area += BigInt(wip) * (pair(1)._1 - pair.head._1)
    }
    val span = (emax - amin + 1).toDouble
    val l = area.toDouble / span
    val lam = nOrders / span; val w = sw.toDouble / nOrders
    val row = queries.Extras197.analyticsLittleLawAudit(spark, sf).collect().head
    assert(row.getLong(0) == nOrders.toLong)
    assert(math.abs(row.getDouble(1) - w) < 1e-5)
    assert(math.abs(row.getDouble(2) - lam) < 1e-5)
    assert(math.abs(row.getDouble(3) - l) < 1e-4)
    assert(math.abs(row.getDouble(4) - l / (lam * w)) < 1e-4)
    assert(row.getDouble(4) > 0.9 && row.getDouble(4) < 1.1)
  }

  test("stat_yuen_trimmed_t: histogram trim/winsorize replay") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    def stats(v: Seq[Int]): (Double, Double, Long, Long) = {
      val s = v.sorted; val n = s.size; val g = n / 10
      val trimmed = s.slice(g, n - g)
      val m = trimmed.map(BigInt(_)).sum.toDouble / trimmed.size
      val wins = s.indices.map(i => if (i < g) s(g) else if (i >= n - g) s(n - g - 1) else s(i))
      val ws = wins.map(BigInt(_)).sum; val wq = wins.map(x => BigInt(x) * BigInt(x)).sum
      val sw = (wq.toDouble - ws.toDouble * ws.toDouble / n) / (n - 1)
      (m, sw, n.toLong, (n - 2 * g).toLong)
    }
    val (m1, sw1, n1, h1) = stats(xs.filter(_._1 == "A").map(_._2))
    val (m2, sw2, n2, h2) = stats(xs.filter(_._1 == "R").map(_._2))
    val t = (m1 - m2) / math.sqrt(sw1 * (n1 - 1) / (h1.toDouble * (h1 - 1))
      + sw2 * (n2 - 1) / (h2.toDouble * (h2 - 1)))
    val row = queries.Extras197.statYuenTrimmedT(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - m1) < 1e-5)
    assert(math.abs(row.getDouble(3) - m2) < 1e-5)
    assert(math.abs(row.getDouble(4) - t) < 1e-4)
  }

  test("stat_median_ci_exact: binomial order-statistic replay; lo <= median <= hi") {
    val cv = Tables.orders(spark, sf).select("o_totalprice", "o_orderkey").collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).map(_._1)
    val n = cv.length
    val lnq = (0L to n).map(i => if (i < 2) 0L
      else math.floor(math.log(i.toDouble) * 1e6 + 0.5).toLong)
    val lf = lnq.scanLeft(0L)(_ + _).drop(1)
    def pq(j: Int): Long = math.floor(math.exp((lf(n) - lf(j) - lf(n - j)).toDouble / 1e6
      - n * math.log(2.0)) * 1e12 + 0.5).toLong
    var cum = 0L; var k = -1L
    (0 to n).foreach { j =>
      if (cum <= math.floor(0.025 * 1e12).toLong) k = j
      cum += pq(j)
    }
    // k = max j with cum-before(j) <= 0.025e12
    val row = queries.Extras197.statMedianCiExact(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == k)
    val lo = cv(k.toInt - 1) / 100.0; val hi = cv(n - k.toInt) / 100.0
    assert(math.abs(row.getDouble(2) - lo) < 1e-9)
    assert(math.abs(row.getDouble(3) - hi) < 1e-9)
    val med = (cv(n / 2) + cv((n - 1) / 2)) / 2.0 / 100.0
    assert(row.getDouble(2) <= med && med <= row.getDouble(3))
  }
}
