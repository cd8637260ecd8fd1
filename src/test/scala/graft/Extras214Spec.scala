package graft

/** Wave-114 properties: Wasserstein area vs the brute-force CDF
  * Riemann sum and its mean-gap lower bound, DTW vs an independent DP
  * replay and the lockstep upper bound, Brown–Forsythe vs the
  * unquantized textbook F, Croston vs a from-scratch smoothing replay
  * — all at sf0.001.
  */
class Extras214Spec extends SparkSpec {

  test("stat_wasserstein_1d: matches the brute-force CDF area; >= mean gap") {
    val rows = Tables.customer(spark, sf)
      .filter("c_mktsegment IN ('BUILDING','MACHINERY')")
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("c_custkey = o_custkey"))
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv",
        "c_mktsegment = 'BUILDING' AS a")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val xa = rows.filter(_._2).map(_._1).sorted
    val xb = rows.filterNot(_._2).map(_._1).sorted
    val support = (xa ++ xb).distinct.sorted
    var area = BigInt(0)
    support.sliding(2).foreach {
      case Array(v, nxt) =>
        val ca = xa.count(_ <= v).toLong
        val cb = xb.count(_ <= v).toLong
        area += (BigInt(ca) * xb.length - BigInt(cb) * xa.length).abs * (nxt - v)
      case _ => ()
    }
    val w1 = area.toDouble / (xa.length.toDouble * xb.length) / 100
    val row = queries.Extras214.statWasserstein1d(spark, sf).collect().head
    assert(row.getLong(0) == xa.length.toLong)
    assert(row.getLong(1) == xb.length.toLong)
    assert(row.getLong(2) == support.length.toLong)
    assert(math.abs(row.getDouble(3) - w1) < 1e-5, s"W1 ${row.getDouble(3)} vs $w1")
    val meanGap = math.abs(xa.map(BigInt(_)).sum.toDouble / xa.length -
      xb.map(BigInt(_)).sum.toDouble / xb.length) / 100
    assert(row.getDouble(3) >= meanGap - 1e-6, "W1 dominates the mean gap")
  }

  test("time_dtw_months: matches an independent DP replay; <= lockstep L1") {
    val monthly = Tables.orders(spark, sf)
      .filter("year(o_orderdate) IN (1995, 1996)")
      .selectExpr("year(o_orderdate) AS y", "month(o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(x => BigInt(x._2)).sum.toLong) }
    val a = (1 to 12).map(m => monthly.getOrElse((1995, m), 0L))
    val b = (1 to 12).map(m => monthly.getOrElse((1996, m), 0L))
    // replay with an explicit +inf border instead of the impl's match
    val inf = Long.MaxValue / 4
    val dp = Array.fill(13, 13)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to 12; j <- 1 to 12) {
      val c = math.abs(a(i - 1) - b(j - 1))
      dp(i)(j) = c + math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
    }
    val row = queries.Extras214.timeDtwMonths(spark, sf).collect().head
    assert(row.getLong(0) == 12L)
    assert(math.abs(row.getDouble(1) - dp(12)(12) / 100.0) < 1e-6)
    val lockstep = (0 until 12).map(i => math.abs(a(i) - b(i))).sum / 100.0
    assert(row.getDouble(1) <= lockstep + 1e-9, "diagonal path bounds DTW")
    assert(math.abs(row.getDouble(2) - a.sum / 100.0) < 1e-6)
    assert(math.abs(row.getDouble(3) - b.sum / 100.0) < 1e-6)
  }

  test("stat_levene_bf: matches the unquantized textbook Brown-Forsythe F") {
    val rows = Tables.customer(spark, sf)
      .selectExpr("c_mktsegment AS seg",
        "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).map { case (s0, g) => (s0, g.map(_._2).sorted) }
    val zs = groups.toSeq.flatMap { case (_, xs) =>
      val n = xs.length
      val med2 = xs((n + 1) / 2 - 1) + xs(n / 2)
      xs.map(x => (math.abs(2 * x - med2).toDouble, xs.length))
    }
    val byG = rows.groupBy(_._1).map { case (s0, g) =>
      val xs = g.map(_._2).sorted
      val med2 = xs((xs.length + 1) / 2 - 1) + xs(xs.length / 2)
      (s0, g.map(x => math.abs(2 * x._2 - med2).toDouble))
    }
    val k = byG.size
    val n = rows.length
    val grand = byG.values.flatten.sum / n
    val ssb = byG.values.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = byG.values.map(g => {
      val m = g.sum / g.length; g.map(z => (z - m) * (z - m)).sum
    }).sum
    val f = ((n - k).toDouble * ssb) / ((k - 1).toDouble * ssw)
    val row = queries.Extras214.statLeveneBf(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(row.getLong(2) == (k - 1).toLong && row.getLong(3) == (n - k).toLong)
    assert(math.abs(row.getDouble(4) - f) / f < 1e-3, s"F ${row.getDouble(4)} vs $f")
    assert(zs.nonEmpty)
  }

  test("time_croston_demand: matches a from-scratch smoothing replay; SBA = 0.95x") {
    val wk = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .filter("p_brand = 'Brand#11'")
      .selectExpr(
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01') div 7 AS BIGINT) AS w",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (w, g) => (w, g.map(_._2).sum) }.sortBy(_._1)
    var z = wk.head._2 / 100.0
    var x = 1.0
    wk.sliding(2).foreach {
      case Seq((w0, _), (w1, q1)) =>
        z = 0.1 * (q1 / 100.0) + 0.9 * z
        x = 0.1 * (w1 - w0).toDouble + 0.9 * x
      case _ => ()
    }
    val row = queries.Extras214.timeCrostonDemand(spark, sf).collect().head
    assert(row.getLong(0) == wk.length.toLong)
    assert(row.getLong(1) == wk.last._1 - wk.head._1 + 1)
    assert(math.abs(row.getDouble(2) - z) < 1e-6)
    assert(math.abs(row.getDouble(3) - x) < 1e-6)
    assert(math.abs(row.getDouble(4) - z / x) < 1e-6)
    assert(math.abs(row.getDouble(5) - 0.95 * row.getDouble(4)) < 1e-5)
    assert(row.getDouble(3) >= 1.0, "smoothed interval at least one week")
  }
}
