package graft

/** Wave-92 properties: Buishand range, SNHT, MOSUM, and Hjorth
  * parameters replayed against brute force on the daily/hourly
  * series at sf0.001.
  */
class Extras192Spec extends SparkSpec {

  /** (day-ordered daily revenue cents). */
  private def dailyCents(): Array[Long] = {
    Tables.orders(spark, sf).select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).toSeq.sortBy(_._1.toString)
      .map(_._2.map(_._2).sum).toArray
  }

  test("stat_buishand_range: exact n·S_k replay; R >= Q >= 0") {
    val v = dailyCents()
    val n = v.length
    val sn = v.map(BigInt(_)).sum
    val qn = v.map(x => BigInt(x) * BigInt(x)).sum
    val p = v.scanLeft(BigInt(0))(_ + _).drop(1)
    val nsk = p.zipWithIndex.map { case (pk, i) => BigInt(n) * pk - BigInt(i + 1) * sn }
    val sigma = math.sqrt((qn.toDouble - sn.toDouble * sn.toDouble / n) / n)
    val r = (nsk.max.toDouble - nsk.min.toDouble) / n / sigma / math.sqrt(n.toDouble)
    val q = nsk.map(_.abs).max.toDouble / n / sigma / math.sqrt(n.toDouble)
    val row = queries.Extras192.statBuishandRange(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(2) - r) < 1e-5)
    assert(math.abs(row.getDouble(3) - q) < 1e-5)
    assert(row.getDouble(2) >= row.getDouble(3) && row.getDouble(3) >= 0)
  }

  test("stat_snht: T_k replay; T_max > 0 at the replayed argmax") {
    val v = dailyCents()
    val n = v.length
    val sn = v.map(BigInt(_)).sum
    val qn = v.map(x => BigInt(x) * BigInt(x)).sum
    val p = v.scanLeft(BigInt(0))(_ + _).drop(1)
    val denom = qn.toDouble - sn.toDouble * sn.toDouble / n
    val ts = (1 until n).map { k =>
      val d = n.toDouble * p(k - 1).toDouble - k.toDouble * sn.toDouble
      d * d / (k.toDouble * (n - k)) / denom
    }
    val row = queries.Extras192.statSnht(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(2) - ts.max) < 1e-5)
    assert(row.getDouble(2) > 0)
  }

  test("stat_mosum: 90-day moving-sum replay") {
    val v = dailyCents()
    val n = v.length; val h = 90
    val sn = v.map(BigInt(_)).sum
    val qn = v.map(x => BigInt(x) * BigInt(x)).sum
    val p = v.scanLeft(BigInt(0))(_ + _).drop(1)
    val nm = (h until n).map(t => (BigInt(n) * (p(t) - p(t - h)) - BigInt(h) * sn).abs)
    val sigma = math.sqrt((qn.toDouble - sn.toDouble * sn.toDouble / n) / n)
    val stat = nm.max.toDouble / n / sigma / math.sqrt(h.toDouble)
    val row = queries.Extras192.statMosum(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getInt(1) == h)
    assert(math.abs(row.getDouble(3) - stat) < 1e-5)
    assert(row.getDouble(3) >= 0)
  }

  test("time_hjorth_parameters: moment replay; complexity >= 1 bound check") {
    val hourly = Tables.events(spark, sf).select("ts").collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).withMinute(0).withSecond(0).withNano(0))
      .groupBy(identity).toSeq.sortBy(_._1.toString).map(_._2.size.toLong).toArray
    def popVar(xs: Array[Long]): Double = {
      val n = xs.length
      val s = xs.map(BigInt(_)).sum; val q = xs.map(x => BigInt(x) * BigInt(x)).sum
      (q.toDouble - s.toDouble * s.toDouble / n) / n
    }
    val dx = hourly.sliding(2).map(a => a(1) - a(0)).toArray
    val d2x = hourly.sliding(3).map(a => a(2) - 2 * a(1) + a(0)).toArray
    val vx = popVar(hourly); val vd = popVar(dx); val vd2 = popVar(d2x)
    val row = queries.Extras192.timeHjorthParameters(spark, sf).collect().head
    assert(row.getLong(0) == hourly.length.toLong)
    assert(math.abs(row.getDouble(1) - vx) < 1e-4)
    assert(math.abs(row.getDouble(2) - math.sqrt(vd / vx)) < 1e-5)
    assert(math.abs(row.getDouble(3) - math.sqrt(vd2 / vd) / math.sqrt(vd / vx)) < 1e-5)
    assert(row.getDouble(2) > 0 && row.getDouble(3) > 0)
  }
}
