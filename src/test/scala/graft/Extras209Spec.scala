package graft

/** Wave-109 properties: harmonic-spine Savage scores, gravity OLS,
  * DCCA boxes, and pinball losses replayed brute-force at sf0.001.
  */
class Extras209Spec extends SparkSpec {

  private lazy val ordRows: Array[(Long, Long, String)] =
    Tables.orders(spark, sf).selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)",
        "o_orderkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("stat_savage_scores: harmonic-spine z replay") {
    val n = ordRows.length.toLong
    val hq = new Array[Long](n.toInt + 1) // hq(k) = sum_{i<=k} 1e12 div i
    var acc = 0L
    for (i <- 1 to n.toInt) { acc += 1000000000000L / i; hq(i) = acc }
    val ranked = ordRows.sortBy(r => (r._1, r._2)).zipWithIndex
    val scored = ranked.map { case ((_, _, prio), idx) =>
      val r = idx + 1L
      val s6 = (hq(n.toInt) - hq((n - r).toInt)) / 1000000L
      (prio == "1-URGENT", s6)
    }
    val t = scored.filter(_._1).map(r => BigInt(r._2)).sum
    val sw = scored.map(r => BigInt(r._2)).sum
    val ss = scored.map(r => BigInt(r._2) * r._2).sum
    val na = scored.count(_._1).toLong
    val z = (t.toDouble - na.toDouble * sw.toDouble / n) /
      math.sqrt(na.toDouble * (n - na) *
        (ss.toDouble - sw.toDouble * sw.toDouble / n) / (n.toDouble * (n - 1)))
    val row = queries.Extras209.statSavageScores(spark, sf).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == n - na)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
  }

  test("analytics_gravity_model: log-log OLS replay; beta near 1 for product flows") {
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toMap
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toMap
    val oc = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toMap
    val flows = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "l_orderkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
      .collect()
      .map(r => ((sup(r.getAs[Number](0).longValue), cust(oc(r.getAs[Number](1).longValue))),
        BigInt(r.getLong(2))))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val outM = flows.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val inM = flows.groupBy(_._1._2).map { case (k, g) => k -> g.values.sum }
    val pts = flows.filter(_._2 > 0).map { case ((ns, nc), f) =>
      (math.round(math.floor(math.log(f.toDouble) * 1e9 + 0.5)),
        math.round(math.floor(math.log(outM(ns).toDouble * inM(nc).toDouble) * 1e9 + 0.5)))
    }.toSeq
    val np = pts.length.toLong
    val sx = pts.map(p => BigInt(p._2)).sum; val sy = pts.map(p => BigInt(p._1)).sum
    val sxx = pts.map(p => BigInt(p._2) * p._2).sum
    val sxy = pts.map(p => BigInt(p._2) * p._1).sum
    val beta = (np.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (np.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val row = queries.Extras209.analyticsGravityModel(spark, sf).collect().head
    assert(row.getLong(0) == np)
    assert(math.abs(row.getDouble(1) - beta) < 1e-4)
    assert(row.getDouble(1) > 0.5 && row.getDouble(1) < 1.5, "mass-product elasticity sanity")
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }

  test("time_dcca: per-box detrended residual replay; |rho| <= 1") {
    val byDay = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getAs[java.sql.Date](0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.map(_._2).sum, g.length.toLong) }
    val boxes = byDay.zipWithIndex.map { case ((x, y), t) => (t / 16, (t.toLong, x, y)) }
      .groupBy(_._1).values.filter(_.size == 16).map(_.map(_._2))
    var fxy = BigInt(0); var fxx = BigInt(0); var fyy = BigInt(0)
    boxes.foreach { pts =>
      val m = pts.size.toDouble
      val st = pts.map(_._1.toDouble).sum; val sx = pts.map(_._2.toDouble).sum
      val sy = pts.map(_._3.toDouble).sum
      val stt = pts.map(p => p._1.toDouble * p._1).sum
      val stx = pts.map(p => p._1.toDouble * p._2).sum
      val sty = pts.map(p => p._1.toDouble * p._3).sum
      val sxx = pts.map(p => p._2.toDouble * p._2).sum
      val sxy = pts.map(p => p._2.toDouble * p._3).sum
      val syy = pts.map(p => p._3.toDouble * p._3).sum
      def cen(ab: Double, a: Double, b: Double) = ab - a * b / m
      val ctt = cen(stt, st, st)
      def res(ab: Double, ta: Double, tb: Double) = ab - ta * tb / ctt
      fxy += BigInt(math.floor(res(cen(sxy, sx, sy), cen(stx, st, sx), cen(sty, st, sy)) / 1e3).toLong)
      fxx += BigInt(math.floor(res(cen(sxx, sx, sx), cen(stx, st, sx), cen(stx, st, sx)) / 1e6).toLong)
      fyy += BigInt(math.floor(res(cen(syy, sy, sy), cen(sty, st, sy), cen(sty, st, sy)) * 1e3).toLong)
    }
    val rho = fxy.toDouble * 1e3 / math.sqrt(fxx.toDouble * 1e6 * (fyy.toDouble / 1e3))
    val row = queries.Extras209.timeDcca(spark, sf).collect().head
    assert(row.getLong(0) == boxes.size.toLong)
    assert(math.abs(row.getDouble(1) - rho) < 1e-4)
    assert(math.abs(row.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("stat_pinball_loss: exact quantile forecasts minimize their own loss") {
    val cvs = ordRows.sortBy(r => (r._1, r._2)).map(_._1)
    val n = cvs.length
    def q(tau: Double): Long = cvs(math.ceil(tau * n).toInt - 1)
    def pinball(tau100: Int, f: Long): Double =
      cvs.map(x => if (x > f) tau100.toDouble * (x - f) else (100.0 - tau100) * (f - x))
        .sum / n / 100 / 100
    val rows = queries.Extras209.statPinballLoss(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val tau100 = math.round(r.getDouble(0) * 100).toInt
      val f = math.round(r.getDouble(1) * 100)
      assert(f == q(tau100 / 100.0), s"tau=$tau100 forecast")
      assert(math.abs(r.getDouble(2) - pinball(tau100, f)) < 1e-3)
      // the exact quantile minimizes its own pinball loss vs the other forecasts
      rows.foreach { other =>
        val of = math.round(other.getDouble(1) * 100)
        assert(pinball(tau100, f) <= pinball(tau100, of) + 1e-9)
      }
    }
  }
}
