package graft

/** Wave-132 properties: the four causal/information estimators vs
  * driver-side replays — at sf0.001.
  */
class Extras232Spec extends SparkSpec {

  test("stat_iv_wald: matches exact cell algebra; LATE = ITT / first-stage") {
    val base = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderpriority"),
        Seq("l_orderkey"))
      .selectExpr("o_orderpriority = '1-URGENT' AS z", "l_discount >= 0.05 AS dd",
        "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    val (g1, g0) = base.partition(_._1)
    val d1 = g1.count(_._2).toDouble / g1.length; val d0 = g0.count(_._2).toDouble / g0.length
    val y1 = g1.count(_._3).toDouble / g1.length; val y0 = g0.count(_._3).toDouble / g0.length
    val itt = y1 - y0; val fs = d1 - d0
    val row = queries.Extras232.statIvWald(spark, sf).collect().head
    assert(row.getLong(0) == g1.length.toLong && row.getLong(1) == g0.length.toLong)
    assert(math.abs(row.getDouble(2) - itt) < 1e-6, "ITT")
    assert(math.abs(row.getDouble(3) - fs) < 1e-6, "first stage")
    assert(math.abs(row.getDouble(5) - itt / fs) < math.abs(itt / fs) * 1e-3 + 1e-4, "Wald")
    val fsse = math.sqrt(d1 * (1 - d1) / g1.length + d0 * (1 - d0) / g0.length)
    assert(math.abs(row.getDouble(4) - fs / fsse) < 1e-2)
  }

  test("stat_regression_discontinuity: matches the two-sided local-linear replay") {
    val pts = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.expr(
        "(sum(CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END) * 1000000000L) div count(*)").as("yq"))
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) - 15000000L AS x"),
        Seq("l_orderkey"))
      .filter("x >= -5000000L AND x <= 5000000L")
      .selectExpr("x", "yq")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def icept(xs: Array[(Long, Long)]): Double = {
      val n = xs.length.toLong
      val sx = xs.map(p => BigInt(p._1)).sum; val sxx = xs.map(p => BigInt(p._1) * p._1).sum
      val sy = xs.map(p => BigInt(p._2)).sum; val sxy = xs.map(p => BigInt(p._1) * p._2).sum
      (sy.toDouble / n - (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) * sx.toDouble / n) / 1e9
    }
    val (r, l) = pts.partition(_._1 >= 0)
    val row = queries.Extras232.statRegressionDiscontinuity(spark, sf).collect().head
    assert(row.getLong(0) == l.length.toLong && row.getLong(1) == r.length.toLong)
    assert(math.abs(row.getDouble(2) - icept(l)) < 1e-5, "left intercept")
    assert(math.abs(row.getDouble(3) - icept(r)) < 1e-5, "right intercept")
    assert(math.abs(row.getDouble(4) - (icept(r) - icept(l))) < 1e-5, "jump")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1, "return share is a proportion")
  }

  test("stat_diff_in_diff: matches the four-cell replay; DiD = cell algebra") {
    val cells = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_nationkey"),
        Seq("o_custkey"))
      .selectExpr("c_nationkey < 12 AS tr", "o_orderdate >= DATE '1998-01-01' AS post",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => ((r.getBoolean(0), r.getBoolean(1)), BigInt(r.getLong(2))))
      .groupBy(_._1).map { case (k, xs) =>
        val n = xs.length
        val s1 = xs.map(_._2).sum; val s2 = xs.map(x => x._2 * x._2).sum
        k -> (n.toLong, s1.toDouble / n,
          (n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / (n.toDouble * (n - 1)) / n)
      }
    val did = (cells((true, true))._2 - cells((true, false))._2) -
      (cells((false, true))._2 - cells((false, false))._2)
    val se = math.sqrt(cells.values.map(_._3).sum)
    val row = queries.Extras232.statDiffInDiff(spark, sf).collect().head
    assert(row.getLong(0) == cells.values.map(_._1).sum)
    assert(math.abs(row.getDouble(1) - cells((true, false))._2 / 100) < 0.02)
    assert(math.abs(row.getDouble(2) - cells((false, false))._2 / 100) < 0.02)
    assert(math.abs(row.getDouble(3) - did / 100) < 0.02, "DiD")
    assert(math.abs(row.getDouble(4) - did / se) < 1e-2, "t")
  }

  test("time_transfer_entropy: matches the trigram replay; TE >= 0") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) => (xs.map(x => BigInt(x._2)).sum, xs.length.toLong) }
    val ups = days.sliding(2).map { case Seq((v0, c0), (v1, c1)) =>
      (if (v1 > v0) 1 else 0, if (c1 > c0) 1 else 0)
    }.toSeq
    val tri = ups.sliding(2).map { case Seq((yp, xp), (yn, xn)) => (yn, yp, xp, xn) }.toSeq
    def te(sel: ((Int, Int, Int, Int)) => (Int, Int, Int)): Double = {
      val cells = tri.map(sel).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val nn = tri.length.toLong
      val nbe = cells.toSeq.groupBy(k => (k._1._2, k._1._3)).map { case (k, v) => k -> v.map(_._2).sum }
      val nab = cells.toSeq.groupBy(k => (k._1._1, k._1._2)).map { case (k, v) => k -> v.map(_._2).sum }
      val nb = cells.toSeq.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
      cells.map { case ((a, b, e), n) =>
        math.floor(n.toDouble / nn *
          math.log(n.toDouble * nb(b) / (nbe((b, e)).toDouble * nab((a, b)))) * 1e12 + 0.5).toLong
      }.sum / 1e12
    }
    val teXY = te { case (yn, yp, xp, _) => (yn, yp, xp) }
    val teYX = te { case (_, yp, xp, xn) => (xn, xp, yp) }
    val row = queries.Extras232.timeTransferEntropy(spark, sf).collect().head
    assert(row.getLong(0) == tri.length.toLong)
    assert(math.abs(row.getDouble(1) - teXY) < 1e-6, s"TE x->y ${row.getDouble(1)} vs $teXY")
    assert(math.abs(row.getDouble(2) - teYX) < 1e-6, "TE y->x")
    assert(math.abs(row.getDouble(3) - (teXY - teYX)) < 1e-6)
    assert(row.getDouble(1) > -1e-9 && row.getDouble(2) > -1e-9, "TE non-negative")
    val verdict = if (teXY > teYX) "count_leads_revenue"
    else if (teYX > teXY) "revenue_leads_count" else "symmetric"
    assert(row.getString(4) == verdict)
  }
}
