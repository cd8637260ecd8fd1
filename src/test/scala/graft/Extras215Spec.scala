package graft

/** Wave-115 properties: CMS replay + never-underestimates guarantee,
  * Theta-method smoothing replay, the Oaxaca–Blinder identity
  * E+C+I = gap, and edge gradients vs the raw byte stream — at
  * sf0.001.
  */
class Extras215Spec extends SparkSpec {

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("agg_count_min_sketch: matches a full sketch replay; never underestimates") {
    val keys = Tables.orders(spark, sf).select("o_custkey").collect().map(_.getLong(0))
    val exact = keys.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    def bucket(i: Int, k: Long): Int =
      (java.lang.Long.parseLong(md5hex(s"cms$i:$k").substring(0, 6), 16) % 64).toInt
    val cells = Array.ofDim[Long](5, 64)
    keys.foreach { k => (1 to 4).foreach(i => cells(i)(bucket(i, k)) += 1) }
    val rows = queries.Extras215.aggCountMinSketch(spark, sf).collect()
    assert(rows.length == 10)
    val top = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    rows.zip(top).foreach { case (r, (k, c)) =>
      assert(r.getLong(0) == k && r.getLong(1) == c)
      val est = (1 to 4).map(i => cells(i)(bucket(i, k))).min
      assert(r.getLong(2) == est, s"estimate for $k")
      assert(r.getLong(3) == est - c)
      assert(r.getLong(3) >= 0, "CMS never underestimates")
    }
  }

  test("time_theta_method: matches the OLS + SES replay") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val n = ms.length
    val sx = ms.map(BigInt(_)).sum.toDouble
    val st = (0 until n).map(_.toLong).sum.toDouble
    val stt = (0 until n).map(t => t.toLong * t).sum.toDouble
    val stx = ms.zipWithIndex.map { case (v, t) => BigInt(v) * t }.sum.toDouble
    val b = (n * stx - st * sx) / (n * stt - st * st)
    val a = (sx - b * st) / n
    var lvl = 2.0 * ms(0) - a
    for (t <- 1 until n) lvl = 0.3 * (2.0 * ms(t) - (a + b * t)) + 0.7 * lvl
    val fc = 0.5 * lvl + 0.5 * (a + b * n)
    val row = queries.Extras215.timeThetaMethod(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - b / 100) < 1e-3)
    assert(math.abs(row.getDouble(2) - lvl / 100) < 1e-2)
    assert(math.abs(row.getDouble(3) - fc / 100) < 1e-2)
  }

  test("analytics_oaxaca_blinder: threefold identity E+C+I = gap; OLS replay") {
    val rows0 = Tables.customer(spark, sf)
      .filter("c_mktsegment IN ('AUTOMOBILE','FURNITURE')")
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("c_custkey = o_custkey"))
      .selectExpr("c_mktsegment = 'AUTOMOBILE' AS ga",
        "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS x",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    def ols(g: Array[(Boolean, Long, Long)]): (Double, Double, Double, Double) = {
      val n = g.length.toDouble
      val sx = g.map(v => BigInt(v._2)).sum.toDouble
      val sy = g.map(v => BigInt(v._3)).sum.toDouble
      val sxy = g.map(v => BigInt(v._2) * v._3).sum.toDouble
      val sxx = g.map(v => BigInt(v._2) * v._2).sum.toDouble
      val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (beta, sx / n, sy / n, sy / n - beta * (sx / n))
    }
    val (ba, xa, ya, aa) = ols(rows0.filter(_._1))
    val (bb, xb, yb, ab) = ols(rows0.filterNot(_._1))
    val row = queries.Extras215.analyticsOaxacaBlinder(spark, sf).collect().head
    assert(row.getLong(0) == rows0.count(_._1).toLong)
    assert(row.getLong(1) == rows0.count(!_._1).toLong)
    val gap = row.getDouble(2)
    assert(math.abs(gap - (ya - yb) / 100) < 1e-3)
    assert(math.abs(row.getDouble(3) - (xa - xb) * bb / 100) < 1e-3, "endowments")
    assert(math.abs(row.getDouble(4) - (xb * (ba - bb) + (aa - ab)) / 100) < 1e-3,
      "coefficients")
    assert(math.abs(row.getDouble(5) - (xa - xb) * (ba - bb) / 100) < 1e-3,
      "interaction")
    assert(math.abs(row.getDouble(3) + row.getDouble(4) + row.getDouble(5) - gap) < 3e-4,
      "threefold identity")
  }

  test("multimodal_image_edge_density: matches the raw byte-stream gradients") {
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val np = Array.fill(3)(0L); val sg = Array.fill(3)(0L)
    val ne = Array.fill(3)(0L); val mg = Array.fill(3)(0L)
    docs.foreach { t =>
      val b = t.getBytes("UTF-8")
      var i = 0
      while (i + 3 < b.length) {
        val ch = i % 3
        val g = math.abs((b(i + 3) & 0xff) - (b(i) & 0xff)).toLong
        np(ch) += 1; sg(ch) += g
        if (g >= 32) ne(ch) += 1
        if (g > mg(ch)) mg(ch) = g
        i += 1
      }
    }
    val rows = queries.Extras215.multimodalImageEdgeDensity(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val ch = r.getInt(0)
      assert(r.getLong(1) == np(ch))
      assert(math.abs(r.getDouble(2) - sg(ch).toDouble / np(ch)) < 1e-5)
      assert(math.abs(r.getDouble(3) - ne(ch).toDouble / np(ch)) < 1e-6)
      assert(r.getLong(4) == mg(ch))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(2) <= mg(ch).toDouble)
    }
  }
}
