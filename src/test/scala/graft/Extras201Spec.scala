package graft

/** Wave-101 properties: Gehan-Breslow, RMST, Ramsey RESET,
  * burstiness/memory vs brute force at sf0.001.
  */
class Extras201Spec extends SparkSpec {

  private def leadTimes(): Seq[(Long, Long)] = {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate)).toMap
    Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate", "l_discount").collect()
      .map { r =>
        val t = java.time.temporal.ChronoUnit.DAYS.between(
          od(r.getLong(0)), r.getAs[java.time.LocalDateTime](1).toLocalDate)
        (t, if (math.round(r.getDouble(2) * 100) >= 5) 1L else 0L)
      }.filter(_._1 >= 1)
  }

  test("stat_gehan_breslow: weighted at-risk replay") {
    val ev = leadTimes()
    val byT = ev.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) => (t, g.size.toLong, g.map(_._2).sum) }
    var swo = BigInt(0); var swe = BigInt(0); var sv6 = BigInt(0)
    val totals = byT.reverse
    var nt = 0L; var n1t = 0L
    val acc = totals.map { case (t, dt, d1t) =>
      nt += dt; n1t += d1t; (t, dt, d1t, nt, n1t)
    }
    acc.foreach { case (_, dt, d1t, ntv, n1tv) =>
      swo += BigInt(ntv) * d1t
      swe += BigInt(dt) * n1tv
      if (ntv > 1)
        sv6 += (BigInt(dt) * n1tv * (ntv - n1tv) * (ntv - dt) * ntv * 1000000) /
          (BigInt(ntv) * ntv * (ntv - 1))
    }
    val u = swo.toDouble - swe.toDouble
    val row = queries.Extras201.statGehanBreslow(spark, sf).collect().head
    assert(row.getLong(0) == byT.size.toLong)
    assert(math.abs(row.getDouble(1) - u) < 1e-6)
    assert(math.abs(row.getDouble(2) - u * u / (sv6.toDouble / 1e6)) < 1e-2)
  }

  test("stat_rmst: KM step-integral replay; 0 < RMST <= tau") {
    val ev = leadTimes().map(_._1)
    val byT = ev.groupBy(identity).toSeq.sortBy(_._1).map { case (t, g) => (t, g.size.toLong) }
    val n = ev.size.toLong
    var atRisk = n; var cum = 0L; var prev = 0L; var body = 0L; var zed = false
    byT.foreach { case (t, dt) =>
      val width = math.min(t, 60L) - math.min(prev, 60L)
      body += math.floor(math.exp(cum / 1e9) * width * 1e6 + 0.5).toLong
      if (dt == atRisk) zed = true
      else cum += math.floor(math.log(1 - dt.toDouble / atRisk) * 1e9 + 0.5).toLong
      atRisk -= dt; prev = t
    }
    val tail = if (zed) 0L else math.floor(math.exp(cum / 1e9) *
      math.max(60L - math.min(byT.last._1, 60L), 0L) * 1e6 + 0.5).toLong
    val rmst = (body.toDouble + tail) / 1e6
    val row = queries.Extras201.statRmst(spark, sf).collect().head
    assert(row.getLong(0) == byT.size.toLong && row.getLong(1) == 60L)
    assert(math.abs(row.getDouble(2) - rmst) < 1e-4)
    assert(row.getDouble(2) > 0 && row.getDouble(2) <= 60)
  }

  test("stat_ramsey_reset: polynomial-moment Cramer replay; F >= 0") {
    val xs = Tables.lineitem(spark, sf).select("l_quantity", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100)))
    val n = xs.length
    val m = (0 to 6).map(k => xs.map(t => BigInt(t._1).pow(k)).sum.toDouble)
    val sy = (0 to 3).map(k => xs.map(t => BigInt(t._2) * BigInt(t._1).pow(k)).sum.toDouble)
    val syy = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
    def det3(a: Array[Array[Double]]): Double =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    def det4(mm: Array[Array[Double]]): Double = {
      def minor(r: Int, c: Int): Array[Array[Double]] =
        (0 until 4).filter(_ != r).map(i =>
          (0 until 4).filter(_ != c).map(j => mm(i)(j)).toArray).toArray
      mm(0)(0) * det3(minor(0, 0)) - mm(0)(1) * det3(minor(0, 1)) +
        mm(0)(2) * det3(minor(0, 2)) - mm(0)(3) * det3(minor(0, 3))
    }
    val h = Array.tabulate(4, 4)((i, j) => m(i + j))
    val d0 = det4(h)
    val beta = (0 until 4).map { c =>
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) sy(i) else m(i + j))) / d0
    }
    val ssr3 = syy - (0 until 4).map(c => beta(c) * sy(c)).sum
    val ssr1 = syy - ((m(2) * sy(0) - m(1) * sy(1)) * sy(0) +
      (m(0) * sy(1) - m(1) * sy(0)) * sy(1)) / (m(0) * m(2) - m(1) * m(1))
    val f = (ssr1 - ssr3) / 2 / (ssr3 / (n - 4))
    val row = queries.Extras201.statRamseyReset(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - f) / math.max(math.abs(f), 1) < 1e-3)
    assert(row.getDouble(1) >= 0)
    assert(math.abs(row.getDouble(2) - (1 - ssr3 / ssr1)) < 1e-4)
  }

  test("time_burstiness_memory: gap-moment replay; B in (-1,1)") {
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_id").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000,
          r.getLong(2))
      }
    val gapPairs = evs.groupBy(_._1).values.flatMap { g =>
      val ts = g.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map(p => p._2 - p._1)
      gaps.zipWithIndex.map { case (gp, i) =>
        (gp, if (i + 1 < gaps.size) Some(gaps(i + 1)) else None) }
    }.toSeq
    val gaps = gapPairs.map(_._1)
    val n = gaps.size
    val sg = gaps.map(BigInt(_)).sum; val qg = gaps.map(x => BigInt(x) * BigInt(x)).sum
    val mu = sg.toDouble / n
    val sig = math.sqrt((qg.toDouble - sg.toDouble * sg.toDouble / n) / n)
    val b = (sig - mu) / (sig + mu)
    val pairs = gapPairs.collect { case (gp, Some(nx)) => (gp, nx) }
    val np = pairs.size
    val s1 = pairs.map(p => BigInt(p._1)).sum; val s2 = pairs.map(p => BigInt(p._2)).sum
    val q1 = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val q2 = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val sp = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val mcoef = (np.toDouble * sp.toDouble - s1.toDouble * s2.toDouble) /
      math.sqrt((np.toDouble * q1.toDouble - s1.toDouble * s1.toDouble) *
        (np.toDouble * q2.toDouble - s2.toDouble * s2.toDouble))
    val row = queries.Extras201.timeBurstinessMemory(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - b) < 1e-5)
    assert(row.getDouble(1) > -1 && row.getDouble(1) < 1)
    assert(math.abs(row.getDouble(2) - mcoef) < 1e-5)
  }
}
