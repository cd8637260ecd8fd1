package graft

/** Wave-111 properties: coherence bounds, chain-ladder replay,
  * Holt–Winters recursion replay, Breusch–Godfrey closed form —
  * brute-forced at sf0.001.
  */
class Extras211Spec extends SparkSpec {

  test("time_cross_coherence: 8 harmonics, each coherence2 in [0, 1]") {
    val rows = queries.Extras211.timeCrossCoherence(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0 + 1e-9,
        s"k=${r.getInt(0)} coherence2=${r.getDouble(2)}")
      assert(r.getLong(1) >= 1)
    }
  }

  test("analytics_chain_ladder: link ratios >= 1 (cumulative never shrinks); replay lag 0") {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1))).toMap
    val cells = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_shipdate",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
      .collect().map { r =>
        val o = od(r.getLong(0))
        val sdt = r.getAs[java.time.LocalDateTime](1)
        val lag = (sdt.getYear - o.getYear) * 12 + (sdt.getMonthValue - o.getMonthValue)
        ((o.getYear, o.getMonthValue), lag, r.getLong(2))
      }.filter(c => c._2 >= 0 && c._2 <= 24)
    def cum(lag: Int): Map[(Int, Int), BigInt] =
      cells.filter(_._2 <= lag).groupBy(_._1)
        .map { case (k, g) => k -> g.map(c => BigInt(c._3)).sum }
    val rows = queries.Extras211.analyticsChainLadder(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 7)
    rows.foreach(r => assert(r.getDouble(2) >= 1.0 - 1e-9, s"lag=${r.getInt(0)}"))
    val c0 = cum(0); val c1 = cum(1)
    // query semantics: a cohort contributes to f_0 only if it has an
    // OBSERVED increment cell at lag 0 AND at lag 1
    val has0 = cells.filter(_._2 == 0).map(_._1).toSet
    val has1 = cells.filter(_._2 == 1).map(_._1).toSet
    val both = has0.intersect(has1)
    val f0 = both.toSeq.map(c1).sum.toDouble / both.toSeq.map(c0).sum.toDouble
    val r0 = rows.find(_.getInt(0) == 0).get
    assert(r0.getLong(1) == both.size.toLong)
    assert(math.abs(r0.getDouble(2) - f0) < 1e-6)
  }

  test("time_holt_winters: Scala recursion replay matches the query's loop exactly") {
    val monthly = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).cast("long").as("v"))
      .orderBy("m").collect().map(_.getLong(1))
    val n = monthly.length
    assert(n >= 24, "needs two full seasons")
    val m1 = monthly.slice(0, 12).map(_.toDouble).sum / 12
    val m2 = monthly.slice(12, 24).map(_.toDouble).sum / 12
    var level = m1; var trend = (m2 - m1) / 12
    val seas = monthly.slice(0, 12).map(_.toDouble - m1)
    var sae = 0.0
    for (t <- 12 until n) {
      val x = monthly(t).toDouble
      sae += math.abs(x - (level + trend + seas(t % 12)))
      val nl = 0.3 * (x - seas(t % 12)) + (1 - 0.3) * (level + trend)
      val nt = 0.1 * (nl - level) + (1 - 0.1) * trend
      seas(t % 12) = 0.2 * (x - nl) + (1 - 0.2) * seas(t % 12)
      level = nl; trend = nt
    }
    val row = queries.Extras211.timeHoltWinters(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == (n - 12).toLong)
    assert(math.abs(row.getDouble(2) - level / 100) < 0.01)
    assert(math.abs(row.getDouble(4) - sae / (n - 12) / 100) < 0.01)
  }

  test("stat_breusch_godfrey: closed-form LM replay; LM in [0, n)") {
    val daily = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getAs[java.sql.Date](0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) => g.map(_._2).sum }
    val n = daily.length
    val t = (0 until n).map(_.toDouble)
    val x = daily.map(_.toDouble)
    val st = t.sum; val sx = x.sum
    val stt = t.map(v => v * v).sum
    val stx = t.zip(x).map { case (a, b) => a * b }.sum
    val b = (n * stx - st * sx) / (n * stt - st * st)
    val a = (sx - b * st) / n
    val eq = (0 until n).map(i => math.floor((x(i) - a - b * i) * 1e3).toLong)
    val zs = (1 until n).map(i => (i.toDouble, eq(i - 1).toDouble, eq(i).toDouble))
    val m = zs.length.toDouble
    def s1(f: ((Double, Double, Double)) => Double) = zs.map(f).sum
    val (zt, zl, zy) = (s1(_._1), s1(_._2), s1(_._3))
    val ztt = s1(v => v._1 * v._1); val ztl = s1(v => v._1 * v._2)
    val zty = s1(v => v._1 * v._3); val zll = s1(v => v._2 * v._2)
    val zly = s1(v => v._2 * v._3); val zyy = s1(v => v._3 * v._3)
    val ctt = m * ztt - zt * zt; val cll = m * zll - zl * zl
    val ctl = m * ztl - zt * zl; val cty = m * zty - zt * zy
    val cly = m * zly - zl * zy; val cyy = m * zyy - zy * zy
    val det = ctt * cll - ctl * ctl
    val r2 = (cty * (cll * cty - ctl * cly) + cly * (ctt * cly - ctl * cty)) / (det * cyy)
    val lm = m * r2
    val row = queries.Extras211.statBreuschGodfrey(spark, sf).collect().head
    assert(row.getLong(0) == zs.length.toLong)
    assert(math.abs(row.getDouble(1) - lm) < 0.05, s"lm spark=${row.getDouble(1)} replay=$lm")
    assert(row.getDouble(1) >= 0 && row.getDouble(1) < zs.length)
  }
}
