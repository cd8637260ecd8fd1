package graft

/** Wave-137 properties at sf0.001: CvM vs a direct pooled-ECDF replay,
  * Siegel vs a repeated-median replay, LAD vs brute-force enumeration,
  * HL vs a per-stratum χ² replay.
  */
class Extras237Spec extends SparkSpec {

  private lazy val months: Array[Long] = Tables.orders(spark, sf)
    .selectExpr("date_trunc('month', o_orderdate) AS m",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
    .collect().map(r => (r.get(0).toString, r.getLong(1)))
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  test("stat_cvm_two_sample: matches the pooled-ECDF replay; T >= 0") {
    val xs = Tables.events(spark, sf)
      .filter("event_type IN ('click', 'view')")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n1 = xs.count(_._1 == "click").toLong
    val n2 = xs.count(_._1 == "view").toLong
    val byV = xs.groupBy(_._2).toSeq.sortBy(_._1)
    var cum1 = 0L; var cum2 = 0L; var sq = BigInt(0)
    byV.foreach { case (_, g) =>
      cum1 += g.count(_._1 == "click"); cum2 += g.count(_._1 == "view")
      val dd = (n2 * cum1 - n1 * cum2).toDouble / (n1.toDouble * n2)
      sq += BigInt(g.length) * BigInt(math.floor(dd * dd * 1e12 + 0.5).toLong)
    }
    val t = n1.toDouble * n2 / ((n1 + n2).toDouble * (n1 + n2)) * (sq.toDouble / 1e12)
    val row = queries.Extras237.statCvmTwoSample(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - t) < 1e-4, s"T ${row.getDouble(2)} vs $t")
    assert(row.getDouble(2) >= 0)
    assert(row.getBoolean(3) == (row.getDouble(2) > 0.461))
  }

  test("stat_siegel_slopes: matches the repeated-median replay") {
    val n = months.length
    def med(a: Array[Double]): Double = {
      val so = a.sorted; val k = so.length
      if (k % 2 == 1) so(k / 2) else (so(k / 2 - 1) + so(k / 2)) / 2
    }
    val perI = (0 until n).map(i => med((0 until n).filter(_ != i)
      .map(j => (months(j) - months(i)).toDouble / (j - i)).toArray)).toArray
    val b = med(perI)
    val a = med(months.indices.map(i => months(i) - b * (i + 1)).toArray)
    val row = queries.Extras237.statSiegelSlopes(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - b / 100) < 1e-4, "slope")
    assert(math.abs(row.getDouble(2) - a / 100) < 0.02, "intercept")
  }

  test("stat_lad_regression: beats or ties every other basic line; loss >= 0") {
    val n = months.length
    var best = (Long.MaxValue, 0, 0)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val b = (months(j) - months(i)).toDouble / (j - i)
      val a = months(i) - b * (i + 1)
      var loss = 0L
      for (t <- 0 until n)
        loss += math.floor(math.abs(months(t) - a - b * (t + 1)) + 0.5).toLong
      if (loss < best._1) best = (loss, i, j)
    }
    val bb = (months(best._3) - months(best._2)).toDouble / (best._3 - best._2)
    val aa = months(best._2) - bb * (best._2 + 1)
    val row = queries.Extras237.statLadRegression(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(3) - best._1 / 100.0) < 0.02, "minimal loss")
    assert(math.abs(row.getDouble(1) - bb / 100) < 1e-4, "slope of the argmin line")
    assert(math.abs(row.getDouble(2) - aa / 100) < 0.02, "intercept")
  }

  test("stat_hosmer_lemeshow: matches the per-stratum replay; dof = g-2") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount", "l_returnflag = 'R' AS y").collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
      .groupBy(_._1)
    var sq = 0L
    g.foreach { case (x, xs) =>
      val ng = xs.length.toLong; val og = xs.count(_._2).toLong
      val p = math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5) / 1e12
      val term = (og - ng * p) * (og - ng * p) / (ng * p * (1 - p))
      sq += math.floor(term * 1e6 + 0.5).toLong
    }
    val row = queries.Extras237.statHosmerLemeshow(spark, sf).collect().head
    assert(row.getLong(0) == g.size.toLong)
    assert(row.getLong(1) == g.size.toLong - 2)
    assert(math.abs(row.getDouble(2) - sq / 1e6) < 1e-3, "HL chi2")
    assert(row.getBoolean(3) == (sq / 1e6 > 16.919))
  }
}
