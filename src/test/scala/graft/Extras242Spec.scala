package graft

/** Wave-142 properties at sf0.001: ACF vs a centered-moment replay,
  * influence identities, growth accounting reconciliation, median
  * polish decomposition identity.
  */
class Extras242Spec extends SparkSpec {

  private lazy val months: Array[Long] = Tables.orders(spark, sf)
    .selectExpr("date_trunc('month', o_orderdate) AS m",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
    .collect().map(r => (r.get(0).toString, r.getLong(1)))
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  test("time_acf_bartlett: matches the centered replay; SE grows with lag") {
    val n = months.length
    val sv = months.map(BigInt(_)).sum
    val w = months.map(v => BigInt(n) * BigInt(v) - sv)
    val sww = w.map(x => x * x).sum
    val rows = queries.Extras242.timeAcfBartlett(spark, sf).collect()
    assert(rows.length == 12)
    var cum2 = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val k = r.getLong(0).toInt
      val num = (k until n).map(t => w(t) * w(t - k)).sum
      val rho = num.toDouble / sww.toDouble
      assert(math.abs(r.getDouble(1) - rho) < 1e-5, s"lag $k acf")
      val se = math.sqrt((1 + 2 * cum2.toDouble / 1e12) / n)
      assert(math.abs(r.getDouble(2) - se) < 1e-5, s"lag $k SE")
      assert(r.getBoolean(3) == (math.abs(rho) > 1.96 * se))
      cum2 += math.floor(rho * rho * 1e12 + 0.5).toLong
    }
    val ses = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(ses.sliding(2).forall { case Array(a, b) => b >= a - 1e-12 }, "SE non-decreasing")
  }

  test("stat_influence_battery: 5 rows; dffits consistent with its parts") {
    val rows = queries.Extras242.statInfluenceBattery(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h > 0 && h < 1, "leverage in (0,1)")
      // |dffits| should be sorted descending
    }
    val adf = rows.map(r => math.abs(r.getDouble(3)))
    assert(adf.sliding(2).forall { case Array(a, b) => a >= b - 1e-9 }, "sorted by |dffits|")
    // sign agreement: dffits and resid share sign (sqrt(h), s>0)
    rows.foreach { r =>
      if (math.abs(r.getDouble(1)) > 0.01)
        assert(r.getDouble(3) * r.getDouble(1) >= 0, "dffits sign = resid sign")
    }
  }

  test("analytics_growth_accounting: net reconciles to the MoM revenue delta") {
    val rows = queries.Extras242.analyticsGrowthAccounting(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val monthly = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (m, g) => m -> g.map(x => BigInt(x._2)).sum }
    val sortedM = monthly.keys.toSeq.sorted
    rows.foreach { case (m, nw, res, ex, con, chu, net) =>
      assert(math.abs(nw + res + ex + con + chu - net) < 0.05, s"$m components sum to net")
      assert(nw >= 0 && res >= 0 && ex >= 0 && con <= 0 && chu <= 0, s"$m signs")
      val idx = sortedM.indexOf(m)
      if (idx > 0) {
        val delta = (monthly(m) - monthly(sortedM(idx - 1))).toDouble / 100
        assert(math.abs(net - delta) < 0.05, s"$m net $net vs MoM delta $delta")
      } else if (idx == 0) {
        assert(math.abs(net - monthly(m).toDouble / 100) < 0.05, "first month net = total")
      }
    }
  }

  test("stat_median_polish_full: effects + grand reproduce cell medians structure") {
    val rows = queries.Extras242.statMedianPolish(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size == 14, s"5 cols + 7 rows + grand + max_abs_resid = 14, got ${rows.size}")
    assert(rows.contains("grand") && rows.contains("max_abs_resid"))
    // median polish effects are centered: median of row effects ~ 0
    val rowEffs = rows.filter(_._1.startsWith("row:")).values.toArray.sorted
    val colEffs = rows.filter(_._1.startsWith("col:")).values.toArray.sorted
    def med(a: Array[Double]) =
      if (a.length % 2 == 1) a(a.length / 2) else (a(a.length / 2 - 1) + a(a.length / 2)) / 2
    assert(math.abs(med(rowEffs)) < 0.02, "row effects centered")
    assert(math.abs(med(colEffs)) < 0.02, "col effects centered")
    assert(rows("max_abs_resid") >= 0)
    // grand is near the overall median cell value scale
    val grid = Tables.orders(spark, sf)
      .selectExpr("year(o_orderdate) AS yr", "o_orderpriority AS grp",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (_, g) => g.map(x => BigInt(x._2)).sum.toDouble / 100 }
      .toArray.sorted
    assert(rows("grand") > grid.head - 0.01 && rows("grand") < grid.last + 0.01,
      "grand within cell range")
  }
}
