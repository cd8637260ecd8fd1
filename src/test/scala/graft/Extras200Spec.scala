package graft

/** Wave-100 properties: tail dependence, lognormal fit, event
  * coincidence, capture ratio vs brute force at sf0.001.
  */
class Extras200Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("stat_tail_dependence: rank-cut replay; 0 <= lambda <= 1") {
    val daily = Tables.orders(spark, sf).select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, cents(r.getDouble(1))))
      .groupBy(_._1).toSeq
      .map { case (day, g) => (day, g.map(_._2).sum, g.size.toLong) }
    val n = daily.size
    val k = n / 20
    val topRev = daily.sortBy(t => (-t._2, t._1.toString)).take(k).map(_._1).toSet
    val topCnt = daily.sortBy(t => (-t._3, t._1.toString)).take(k).map(_._1).toSet
    val joint = topRev.intersect(topCnt).size.toLong
    val row = queries.Extras200.statTailDependence(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == k.toLong && row.getLong(2) == joint)
    assert(math.abs(row.getDouble(3) - joint.toDouble / k) < 1e-6)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
    assert(math.abs(row.getDouble(4) - joint.toDouble * n / (k.toDouble * k)) < 1e-5)
  }

  test("stat_lognormal_fit: quantized log-moment replay; mean >= median") {
    val cv = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0))).filter(_ > 0)
    val n = cv.length
    val lq = cv.map(c => math.floor(math.log(c.toDouble / 100) * 1e9 + 0.5).toLong)
    val sl = lq.map(BigInt(_)).sum; val ql = lq.map(x => BigInt(x) * BigInt(x)).sum
    val mu = sl.toDouble / n / 1e9
    val sig = math.sqrt((ql.toDouble - sl.toDouble * sl.toDouble / n) / (n - 1)) / 1e9
    val actual = cv.map(BigInt(_)).sum.toDouble / n / 100
    val row = queries.Extras200.statLognormalFit(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mu) < 1e-5)
    assert(math.abs(row.getDouble(2) - sig) < 1e-5)
    assert(math.abs(row.getDouble(3) - math.exp(mu)) < 1e-2)
    assert(math.abs(row.getDouble(4) - math.exp(mu + sig * sig / 2)) < 1e-2)
    assert(row.getDouble(4) >= row.getDouble(3)) // lognormal mean >= median
    assert(math.abs(row.getDouble(5) - actual / math.exp(mu + sig * sig / 2)) < 1e-4)
  }

  test("time_event_coincidence: window-join replay; rates in [0,1]") {
    val evs = Tables.events(spark, sf).select("user_id", "event_type", "ts", "event_id").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](2)
        (r.getLong(0), r.getString(1),
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000, r.getLong(3))
      }
    val clicks = evs.filter(_._2 == "click"); val purch = evs.filter(_._2 == "purchase")
    val byUserP = purch.groupBy(_._1)
    val trigC = clicks.count { c =>
      byUserP.getOrElse(c._1, Array.empty[(Long, String, Long, Long)])
        .exists(p => p._3 > c._3 && p._3 - c._3 <= 3600000000L) }
    val byUserC = clicks.groupBy(_._1)
    val trigP = purch.count { p =>
      byUserC.getOrElse(p._1, Array.empty[(Long, String, Long, Long)])
        .exists(c => p._3 > c._3 && p._3 - c._3 <= 3600000000L) }
    val row = queries.Extras200.timeEventCoincidence(spark, sf).collect().head
    assert(row.getLong(0) == clicks.length.toLong && row.getLong(1) == purch.length.toLong)
    assert(math.abs(row.getDouble(2) - trigC.toDouble / clicks.length) < 1e-6)
    assert(math.abs(row.getDouble(3) - trigP.toDouble / purch.length) < 1e-6)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
  }

  test("win_capture_ratio: monthly log-return replay") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_shipdate", "l_extendedprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), (dt.getYear, dt.getMonthValue), cents(r.getDouble(2)))
      }
    val brandOf = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val monthly = li.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (mon, g) =>
        (mon, g.map(_._3).sum, g.filter(x => brandOf(x._1) == "Brand#11").map(_._3).sum)
      }.filter(_._3 > 0)
    val rets = monthly.sliding(2).filter(_.size == 2).map { p =>
      (math.floor(math.log(p(1)._2.toDouble / p(0)._2) * 1e9 + 0.5).toLong,
        math.floor(math.log(p(1)._3.toDouble / p(0)._3) * 1e9 + 0.5).toLong)
    }.toSeq
    val mu = rets.filter(_._1 > 0).map(_._1).sum; val bu = rets.filter(_._1 > 0).map(_._2).sum
    val md = rets.filter(_._1 < 0).map(_._1).sum; val bd = rets.filter(_._1 < 0).map(_._2).sum
    val row = queries.Extras200.winCaptureRatio(spark, sf).collect().head
    assert(row.getLong(0) == rets.size.toLong)
    if (mu != 0) assert(math.abs(row.getDouble(1) - bu.toDouble / mu) < 1e-5)
    if (md != 0) assert(math.abs(row.getDouble(2) - bd.toDouble / md) < 1e-5)
  }
}
