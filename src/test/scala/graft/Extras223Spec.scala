package graft

/** Wave-123 properties: Dunnett contrasts vs exact group moments, the
  * von Neumann ratio vs a sequential replay, ABC×XYZ vs a driver-side
  * classification, and the C-index vs a brute-force O(n²) pair count —
  * at sf0.001.
  */
class Extras223Spec extends SparkSpec {

  test("stat_dunnett_control: matches exact group-moment replay; control excluded") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(x => BigInt(x._2)) }
    def mom(g: String) = {
      val x = vs(g); val n = x.length
      val s1 = x.sum; val s2 = x.map(v => v * v).sum
      (n, s1.toDouble / n,
        (n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / (n.toDouble * (n - 1)))
    }
    val (nc, mc, vc) = mom("1-URGENT")
    val rows = queries.Extras223.statDunnettControl(spark, sf).collect()
    assert(rows.length == 4, "4 treatment arms vs control")
    assert(!rows.exists(_.getString(0) == "1-URGENT"))
    rows.foreach { r =>
      val (n, m, v) = mom(r.getString(0))
      val diff = m - mc
      val se = math.sqrt(v / n + vc / nc)
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - diff / 100) < 0.02, s"${r.getString(0)} diff")
      assert(math.abs(r.getDouble(4) - diff / se) < 1e-3, s"${r.getString(0)} t")
      assert(math.abs(r.getDouble(5) - 2.4977) < 1e-3, "Bonferroni z for alpha/4")
      assert(r.getLong(6) == (if (math.abs(diff / se) > r.getDouble(5)) 1L else 0L))
    }
  }

  test("time_von_neumann: matches a sequential replay; iid synthetic near 2") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum)
    val n = days.length
    val s1 = days.sum; val s2 = days.map(v => v * v).sum
    val sd2 = days.sliding(2).map { case Seq(a, b) => (b - a) * (b - a) }.sum
    val vn = n.toDouble * (n - 1) * sd2.toDouble /
      (n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / n
    val z = (vn - 2) / math.sqrt(4.0 * (n - 2) / ((n.toDouble + 1) * (n - 1)))
    val row = queries.Extras223.timeVonNeumann(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - vn) < 1e-5, s"vn ${row.getDouble(1)} vs $vn")
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
    val expected = if (z < -1.959964) "trending" else if (z > 1.959964) "alternating" else "random"
    assert(row.getString(3) == expected)
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 4, "VN in its support")
  }

  test("analytics_abc_xyz: matches a driver-side exact classification") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "CAST(date_trunc('month', l_shipdate) AS STRING) AS m",
        "CAST(l_quantity AS BIGINT) AS q",
        """CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          | * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS r""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), BigInt(r.getLong(3))))
    val mm = li.map(_._2).distinct.length
    val pm = li.groupBy(x => (x._1, x._2)).map { case (k, xs) =>
      (k._1, xs.map(x => BigInt(x._3)).sum, xs.map(_._4).sum) }.toSeq
    val per = pm.groupBy(_._1).map { case (p, xs) =>
      (p, xs.map(_._2).sum, xs.map(x => x._2 * x._2).sum, xs.map(_._3).sum) }.toSeq
    val trev = per.map(_._4).sum
    val sorted = per.sortWith((a, b) => a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
    var cum = BigInt(0)
    val classed = sorted.map { case (p, s1, s2, rev) =>
      cum += rev
      val abc = if (cum * 5 <= trev * 4) "A" else if (cum * 20 <= trev * 19) "B" else "C"
      val lhs = BigInt(mm) * (BigInt(mm) * s2 - s1 * s1)
      val rhs = BigInt(mm - 1) * s1 * s1
      val xyz = if (4 * lhs < rhs) "X" else if (lhs < rhs) "Y" else "Z"
      ((abc, xyz), rev)
    }
    val expect = classed.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._2).sum) }
    val rows = queries.Extras223.analyticsAbcXyz(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    rows.foreach { r =>
      val (n, grev) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n, s"${r.getString(0)}${r.getString(1)} count")
      val pct = 100 * grev.toDouble / trev.toDouble
      assert(math.abs(r.getDouble(3) - pct) < 1e-3)
    }
    assert(rows.map(_.getLong(2)).sum == per.length.toLong, "every part classified once")
  }

  test("stat_harrell_cindex: matches a brute-force O(n^2) pair count") {
    val base = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        Seq("l_orderkey"))
      .selectExpr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS t",
        "least(greatest(CAST(floor(CAST(l_extendedprice AS DOUBLE) / 1000) AS BIGINT), 0L), 127L) AS rb",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS e")
      .filter("t >= 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var num2 = BigInt(0); var den = BigInt(0)
    for (i <- base.indices; j <- base.indices if i != j) {
      val (ti, ri, ei) = base(i); val (tj, rj, _) = base(j)
      if (ti < tj && ei == 1L) {
        den += 1
        if (ri > rj) num2 += 2 else if (ri == rj) num2 += 1
      }
    }
    val row = queries.Extras223.statHarrellCindex(spark, sf).collect().head
    assert(row.getLong(0) == den.toLong, s"comparable pairs ${row.getLong(0)} vs $den")
    val c = num2.toDouble / 2 / den.toDouble
    assert(math.abs(row.getDouble(1) - c) < 1e-5, s"c-index ${row.getDouble(1)} vs $c")
    assert(math.abs(row.getDouble(2) - (2 * c - 1)) < 1e-5, "Somers' D = 2C-1")
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1)
  }
}
