package graft

/** Wave-104 properties: PRESS R², PI coverage backtest, GPD PWM fit,
  * Fisher index vs brute force at sf0.001.
  */
class Extras204Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("stat_press_r2: closed-form deleted residuals; r2_pred <= r2") {
    val xs = Tables.lineitem(spark, sf).select("l_quantity", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, cents(r.getDouble(1))))
    val n = xs.length
    val sx = xs.map(t => BigInt(t._1)).sum; val sy = xs.map(t => BigInt(t._2)).sum
    val sxx = xs.map(t => BigInt(t._1) * BigInt(t._1)).sum
    val sxy = xs.map(t => BigInt(t._1) * BigInt(t._2)).sum
    val syy = xs.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val xbar = sx.toDouble / n; val ybar = sy.toDouble / n
    val sxxc = sxx.toDouble - sx.toDouble * sx.toDouble / n
    val syyc = syy.toDouble - sy.toDouble * sy.toDouble / n
    val b = (sxy.toDouble - sx.toDouble * sy.toDouble / n) / sxxc
    var press = BigInt(0); var ssr = BigInt(0)
    xs.foreach { case (x, y) =>
      val e = y - (ybar + b * (x - xbar))
      val h = 1.0 / n + (x - xbar) * (x - xbar) / sxxc
      press += BigInt(math.floor(math.pow(e / (1 - h), 2) + 0.5).toLong)
      ssr += BigInt(math.floor(e * e + 0.5).toLong)
    }
    val row = queries.Extras204.statPressR2(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - (1 - ssr.toDouble / syyc)) < 1e-5)
    assert(math.abs(row.getDouble(2) - (1 - press.toDouble / syyc)) < 1e-5)
    assert(row.getDouble(2) <= row.getDouble(1) + 1e-9)
    assert(math.abs(row.getDouble(3) - press.toDouble / ssr.toDouble) < 1e-5)
  }

  test("stat_pi_coverage_backtest: 80/20 split replay") {
    val daily = Tables.orders(spark, sf).select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, cents(r.getDouble(1))))
      .groupBy(_._1).toSeq.sortBy(_._1.toString).map(_._2.map(_._2).sum)
    val n = daily.size; val cut = n * 8 / 10
    val train = daily.take(cut)
    val sv = train.map(BigInt(_)).sum; val qv = train.map(x => BigInt(x) * BigInt(x)).sum
    val mu = sv.toDouble / cut
    val sig = math.sqrt((qv.toDouble - sv.toDouble * sv.toDouble / cut) / (cut - 1))
    val test = daily.drop(cut)
    val covered = test.count(v => math.abs(v - mu) <= 1.959964 * sig)
    val row = queries.Extras204.statPiCoverageBacktest(spark, sf).collect().head
    assert(row.getLong(0) == cut.toLong && row.getLong(1) == test.size.toLong)
    assert(math.abs(row.getDouble(2) - covered.toDouble / test.size) < 1e-6)
    assert(math.abs(row.getDouble(3) - (covered.toDouble / test.size - 0.95)) < 1e-6)
  }

  test("stat_gpd_pwm_fit: Hosking-Wallis PWM replay; sigma > 0") {
    val cv = Tables.orders(spark, sf).select("o_totalprice", "o_orderkey").collect()
      .map(r => (cents(r.getDouble(0)), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).map(_._1)
    val n = cv.length
    val kth = (n * 95 + 99) / 100
    val u = cv(kth - 1)
    val exc = cv.drop(kth).map(_ - u)
    val m = exc.length
    val b0 = exc.map(BigInt(_)).sum.toDouble / m / 100
    val b1 = exc.zipWithIndex.map { case (y, j0) => BigInt(y) * j0 }.sum.toDouble / (m - 1) / m / 100
    val xi = 2 - b0 / (2 * b1 - b0)
    val sg = 2 * b0 * (b0 - b1) / (2 * b1 - b0)
    val row = queries.Extras204.statGpdPwmFit(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - u / 100.0) < 1e-9)
    assert(math.abs(row.getDouble(2) - xi) < 1e-5)
    assert(math.abs(row.getDouble(3) - sg) < 1e-3)
    assert(row.getDouble(3) > 0)
  }

  test("analytics_fisher_price_index: L >= F >= P or L <= F <= P") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).getYear,
        cents(r.getDouble(2)), r.getDouble(3).toLong))
    def yr(y: Int) = li.filter(_._2 == y).groupBy(_._1)
      .view.mapValues(g => (g.map(x => BigInt(x._3)).sum, g.map(_._4).sum)).toMap
    val a = yr(1995); val b = yr(1996)
    val common = a.keySet.intersect(b.keySet).toSeq
    var s00 = BigInt(0); var s11 = BigInt(0); var s10 = BigInt(0); var s01 = BigInt(0)
    common.foreach { pk =>
      val (r95, q95) = a(pk); val (r96, q96) = b(pk)
      s00 += r95; s11 += r96
      s10 += BigInt(math.floor(r96.toDouble / q96 * q95 * 1e3 + 0.5).toLong)
      s01 += BigInt(math.floor(r95.toDouble / q95 * q96 * 1e3 + 0.5).toLong)
    }
    val l = s10.toDouble / 1e3 / s00.toDouble
    val p = s11.toDouble / (s01.toDouble / 1e3)
    val row = queries.Extras204.analyticsFisherPriceIndex(spark, sf).collect().head
    assert(row.getLong(0) == common.size.toLong)
    assert(math.abs(row.getDouble(1) - l) < 1e-5)
    assert(math.abs(row.getDouble(2) - p) < 1e-5)
    val f = math.sqrt(l * p)
    assert(math.abs(row.getDouble(3) - f) < 1e-5)
    assert((f - l) * (f - p) <= 1e-9) // Fisher lies between L and P
  }
}
