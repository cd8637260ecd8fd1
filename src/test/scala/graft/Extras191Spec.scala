package graft

/** Wave-91 properties: CUPED, partial correlation, Hoeffding's D, and
  * circular correlation replayed against brute force at sf0.001.
  */
class Extras191Spec extends SparkSpec {

  test("stat_ab_cuped: pooled-theta replay; var_reduction = rho^2 in [0,1]") {
    val evs = Tables.events(spark, sf).select("user_id", "ts", "value").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0),
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000,
          math.round(r.getDouble(2) * 100))
      }
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val users = evs.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._2 <= mid).map(_._3).sum, g.filter(_._2 > mid).map(_._3).sum)
    }.toSeq
    val n = users.size
    val sx = users.map(u => BigInt(u._2)).sum; val sy = users.map(u => BigInt(u._3)).sum
    val sxx = users.map(u => BigInt(u._2) * BigInt(u._2)).sum
    val syy = users.map(u => BigInt(u._3) * BigInt(u._3)).sum
    val sxy = users.map(u => BigInt(u._2) * BigInt(u._3)).sum
    val covn = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val varxn = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val varyn = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val theta = covn / varxn
    val row = queries.Extras191.statAbCuped(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - theta) < 1e-5)
    val vr = row.getDouble(4)
    assert(math.abs(vr - covn * covn / (varxn * varyn)) < 1e-5)
    assert(vr >= 0 && vr <= 1)
    // CUPED shifts the estimate by theta * (pre-period imbalance)
    val g1 = users.filter(_._1 % 2 == 1); val g0 = users.filter(_._1 % 2 == 0)
    def mean(xs: Seq[Long]): Double = xs.map(BigInt(_)).sum.toDouble / xs.size / 100
    val exp = (mean(g1.map(_._3)) - theta * mean(g1.map(_._2))) -
      (mean(g0.map(_._3)) - theta * mean(g0.map(_._2)))
    assert(math.abs(row.getDouble(3) - exp) < 1e-4)
  }

  test("stat_partial_corr: three-moment replay; |r_partial| <= 1") {
    val xs = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2) * 100)))
    val n = xs.length
    def corr(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long): Double = {
      val sa = xs.map(t => BigInt(f(t))).sum; val sb = xs.map(t => BigInt(g(t))).sum
      val saa = xs.map(t => BigInt(f(t)) * BigInt(f(t))).sum
      val sbb = xs.map(t => BigInt(g(t)) * BigInt(g(t))).sum
      val sab = xs.map(t => BigInt(f(t)) * BigInt(g(t))).sum
      (n.toDouble * sab.toDouble - sa.toDouble * sb.toDouble) /
        math.sqrt((n.toDouble * saa.toDouble - sa.toDouble * sa.toDouble) *
          (n.toDouble * sbb.toDouble - sb.toDouble * sb.toDouble))
    }
    val rxy = corr(_._1, _._2); val rxz = corr(_._1, _._3); val ryz = corr(_._2, _._3)
    val rp = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val row = queries.Extras191.statPartialCorr(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rxy) < 1e-5)
    assert(math.abs(row.getDouble(4) - rp) < 1e-5)
    assert(math.abs(row.getDouble(4)) <= 1)
  }

  test("stat_hoeffding_d: 25-point integer replay; D in [-0.5, 1]") {
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    val ords = Tables.orders(spark, sf).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val natOf = cust.map(c => (c._1, c._2)).toMap
    val x = cust.groupBy(_._2).view.mapValues(_.map(c => BigInt(c._3)).sum).toMap
    val y = ords.filter(o => natOf.contains(o._1))
      .groupBy(o => natOf(o._1)).view.mapValues(_.map(o => BigInt(o._2)).sum).toMap
    val pts = x.keySet.intersect(y.keySet).toSeq.map(k => (x(k), y(k)))
    val n = pts.size
    val stats = pts.map { case (xi, yi) =>
      val r = pts.count(p => p._1 < xi).toLong
      val ss = pts.count(p => p._2 < yi).toLong
      val q = pts.count(p => p._1 < xi && p._2 < yi).toLong
      (r, ss, q)
    }
    val d1 = stats.map(t => t._3 * (t._3 - 1)).sum
    val d2 = stats.map(t => t._1 * (t._1 - 1) * t._2 * (t._2 - 1)).sum
    val d3 = stats.map(t => (t._1 - 1) * (t._2 - 1) * t._3).sum
    val dd = 30.0 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3) /
      (n.toDouble * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    val row = queries.Extras191.statHoeffdingD(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == d1 && row.getLong(2) == d2 && row.getLong(3) == d3)
    assert(math.abs(row.getDouble(4) - dd) < 1e-5)
    assert(row.getDouble(4) >= -0.5 && row.getDouble(4) <= 1.0)
  }

  test("stat_circular_corr: quantized J-S replay; |r| <= 1") {
    val evs = Tables.events(spark, sf).select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2).getHour))
      .filter(e => e._2 == "click" || e._2 == "purchase")
    def qsin(h: Int) = math.floor(math.sin(h * math.Pi / 12) * 1e9 + 0.5).toLong
    def qcos(h: Int) = math.floor(math.cos(h * math.Pi / 12) * 1e9 + 0.5).toLong
    val ang = evs.groupBy(e => (e._1, e._2)).map { case ((u, t), g) =>
      ((u, t), math.atan2(g.map(e => qsin(e._3)).sum.toDouble, g.map(e => qcos(e._3)).sum.toDouble))
    }
    val paired = ang.keys.map(_._1).toSeq.distinct.sorted.flatMap { u =>
      for (a <- ang.get((u, "click")); b <- ang.get((u, "purchase"))) yield (a, b)
    }
    val abar = math.atan2(
      paired.map(p => math.floor(math.sin(p._1) * 1e9 + 0.5).toLong).sum.toDouble,
      paired.map(p => math.floor(math.cos(p._1) * 1e9 + 0.5).toLong).sum.toDouble)
    val bbar = math.atan2(
      paired.map(p => math.floor(math.sin(p._2) * 1e9 + 0.5).toLong).sum.toDouble,
      paired.map(p => math.floor(math.cos(p._2) * 1e9 + 0.5).toLong).sum.toDouble)
    val sp = paired.map(p => math.floor(math.sin(p._1 - abar) * math.sin(p._2 - bbar) * 1e9 + 0.5).toLong).sum
    val sa = paired.map(p => math.floor(math.sin(p._1 - abar) * math.sin(p._1 - abar) * 1e9 + 0.5).toLong).sum
    val sb = paired.map(p => math.floor(math.sin(p._2 - bbar) * math.sin(p._2 - bbar) * 1e9 + 0.5).toLong).sum
    val r = sp.toDouble / math.sqrt(sa.toDouble * sb.toDouble)
    val row = queries.Extras191.statCircularCorr(spark, sf).collect().head
    assert(row.getLong(0) == paired.size.toLong)
    assert(math.abs(row.getDouble(1) - r) < 1e-5)
    assert(math.abs(row.getDouble(1)) <= 1)
  }
}
