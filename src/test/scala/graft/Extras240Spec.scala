package graft

/** Wave-140 properties at sf0.001: Woolf vs a stratum replay, ridits
  * vs exact cumulative algebra, Poisson Newton vs an independent
  * driver fit, Palma vs a sorted-spend replay.
  */
class Extras240Spec extends SparkSpec {

  test("stat_woolf_test: matches the stratum replay; chi2 >= 0") {
    val xs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        Seq("l_orderkey"))
      .selectExpr("year(o_orderdate) AS yr", "l_returnflag = 'R' AS r", "l_quantity > 25 AS hq")
      .collect().map(x => (x.getInt(0), x.getBoolean(1), x.getBoolean(2)))
      .groupBy(_._1)
    var s1 = 0L; var s2 = BigInt(0); val cells = xs.map { case (yr, g) =>
      val a = g.count(x => x._2 && x._3) + 0.5
      val b = g.count(x => x._2 && !x._3) + 0.5
      val c = g.count(x => !x._2 && x._3) + 0.5
      val dd = g.count(x => !x._2 && !x._3) + 0.5
      val wq = math.floor(1 / (1 / a + 1 / b + 1 / c + 1 / dd) * 1e6 + 0.5).toLong
      val lq = math.floor(math.log(a * dd / (b * c)) * 1e12 + 0.5).toLong
      s1 += wq; s2 += BigInt(wq) * BigInt(lq)
      (wq, lq)
    }
    val pool = s2.toDouble / s1 / 1e12
    val chi2 = cells.map { case (wq, lq) =>
      math.floor(wq * (lq / 1e12 - pool) * (lq / 1e12 - pool) + 0.5).toLong
    }.sum / 1e6
    val row = queries.Extras240.statWoolfTest(spark, sf).collect().head
    assert(row.getLong(0) == xs.size.toLong && row.getLong(1) == xs.size.toLong - 1)
    assert(math.abs(row.getDouble(2) - pool) < 1e-5, "pooled log OR")
    assert(math.abs(row.getDouble(3) - chi2) < 1e-3, s"chi2 ${row.getDouble(3)} vs $chi2")
    assert(row.getDouble(3) >= 0)
  }

  test("stat_ridit_analysis: ridits from exact cumulative algebra; grand mean 0.5") {
    val rows = queries.Extras240.statRiditAnalysis(spark, sf).collect()
    assert(rows.length == 5)
    val xs = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_mktsegment"),
        Seq("o_custkey"))
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j", "c_mktsegment AS seg")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nn = xs.length.toLong
    val cj = xs.groupBy(_._1).map { case (j, g) => j -> g.length.toLong }
    val sorted = cj.keys.toArray.sorted
    var cum = 0L
    val rq = scala.collection.mutable.Map[Long, Long]()
    sorted.foreach { j =>
      rq(j) = math.floor((cum.toDouble + cj(j).toDouble / 2) / nn * 1e12 + 0.5).toLong
      cum += cj(j)
    }
    // grand mean ridit is 0.5 by construction
    val grand = xs.map(x => BigInt(rq(x._1))).sum.toDouble / nn / 1e12
    assert(math.abs(grand - 0.5) < 1e-9, "grand mean ridit")
    rows.foreach { r =>
      val members = xs.filter(_._2 == r.getString(0))
      val mr = members.map(x => BigInt(rq(x._1))).sum.toDouble / members.length / 1e12
      assert(r.getLong(1) == members.length.toLong)
      assert(math.abs(r.getDouble(2) - mr) < 1e-5, s"${r.getString(0)} mean ridit")
      assert(math.abs(r.getDouble(3) - (mr - 0.5) * math.sqrt(12.0 * members.length)) < 1e-3)
    }
  }

  test("stat_poisson_regression: Newton converged to the score-zero point") {
    val row = queries.Extras240.statPoissonRegression(spark, sf).collect().head
    val g = Tables.lineitem(spark, sf)
      .selectExpr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS xq",
        "CAST(l_quantity AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (x, ys) => (x, ys.length.toLong, ys.map(_._2).sum) }
    val (b0, b1) = (row.getDouble(1), row.getDouble(2))
    // at the MLE the score is ~0: Σ(y - n·μ) ≈ 0 and Σ(y - n·μ)x ≈ 0
    val sc1 = g.map { case (x, n, sy) => sy - n * math.exp(b0 + b1 * (x / 100.0)) }.sum
    val sc2 = g.map { case (x, n, sy) => (sy - n * math.exp(b0 + b1 * (x / 100.0))) * x }.sum
    val scale = g.map(_._3).sum.toDouble
    assert(math.abs(sc1) / scale < 1e-4, s"score1 $sc1")
    assert(math.abs(sc2) / scale < 1e-2, s"score2 $sc2")
    assert(row.getLong(0) == g.map(_._2).sum)
    assert(row.getDouble(3) > 0, "rate ratio positive")
  }

  test("analytics_palma_ratio: matches a sorted-spend replay; shares in (0,1)") {
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2).sum) }.toArray
      .sortBy(x => (x._2, x._1))
    val n = spend.length
    val tot = spend.map(x => BigInt(x._2)).sum
    val k10 = math.floor(n / 10.0).toInt
    val k40 = math.floor(n * 4 / 10.0).toInt
    val top = spend.takeRight(k10).map(x => BigInt(x._2)).sum
    val bot = spend.take(k40).map(x => BigInt(x._2)).sum
    val row = queries.Extras240.analyticsPalmaRatio(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - top.toDouble / tot.toDouble) < 1e-5, "top share")
    assert(math.abs(row.getDouble(2) - bot.toDouble / tot.toDouble) < 1e-5, "bottom share")
    assert(math.abs(row.getDouble(3) - top.toDouble / bot.toDouble) < 1e-3, "palma")
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 1 && row.getDouble(2) > 0 && row.getDouble(2) < 1)
  }
}
