package graft

/** Wave-136 properties: every rank statistic re-derived from a
  * collected midrank replay at sf0.001 — MWU's U/z, Page's L against
  * its exact moments, Dunn z's vs a direct pooled-variance replay, and
  * Nemenyi mean ranks + CD.
  */
class Extras236Spec extends SparkSpec {

  private def midranks(vs: Array[Double]): Map[Double, Double] = {
    val sorted = vs.sorted
    sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1.0).sum / xs.length) }
  }

  private def eventVals(types: Set[String]): Array[(String, Double)] =
    Tables.events(spark, sf).selectExpr("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .filter(x => types.isEmpty || types(x._1))

  test("stat_mann_whitney_u: matches the midrank replay; U within [0, n1*n2]") {
    val xs = eventVals(Set("click", "view"))
    val mr = midranks(xs.map(_._2))
    val r1 = xs.filter(_._1 == "click").map(x => mr(x._2)).sum
    val n1 = xs.count(_._1 == "click").toLong
    val n2 = xs.count(_._1 == "view").toLong
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val n = n1 + n2
    val tie = xs.map(_._2).groupBy(identity).values
      .map(g => g.length.toDouble * g.length * g.length - g.length).sum
    val varu = n1.toDouble * n2 / 12 * (n + 1 - tie / (n.toDouble * (n - 1)))
    val z = (u1 - n1.toDouble * n2 / 2) / math.sqrt(varu)
    val row = queries.Extras236.statMannWhitneyU(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - u1) < 1e-6, s"U ${row.getDouble(2)} vs $u1")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= n1.toDouble * n2)
    assert(math.abs(row.getDouble(3) - z) < 1e-3, s"z ${row.getDouble(3)} vs $z")
    assert(row.getBoolean(4) == (math.abs(z) > 1.96))
  }

  test("stat_page_l: matches the blocked-rank replay and exact moments") {
    val cells = Tables.orders(spark, sf)
      .selectExpr("year(o_orderdate) AS yr", "o_orderpriority AS grp",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case ((yr, grp), xs) =>
        (yr, grp, xs.map(x => BigInt(x._3)).sum.toDouble / xs.length) }
      .toSeq
    val byYear = cells.groupBy(_._1).filter(_._2.size == 5)
    var l = 0L
    byYear.foreach { case (_, ys) =>
      ys.sortBy(x => (x._3, x._2)).zipWithIndex.foreach { case ((_, grp, _), i0) =>
        l += grp.substring(0, 1).toLong * (i0 + 1)
      }
    }
    val b = byYear.size.toLong
    val row = queries.Extras236.statPageL(spark, sf).collect().head
    assert(row.getLong(0) == b && row.getLong(1) == 5L)
    assert(row.getLong(2) == l, s"L ${row.getLong(2)} vs $l")
    val z = (l - 45.0 * b) / (5 * math.sqrt(b.toDouble))
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
    // exact moments: L is always between its min b*k(k+1)(k+2)/6... sanity band
    assert(row.getLong(2) >= 35 * b && row.getLong(2) <= 55 * b, "L within the k=5 attainable band")
  }

  test("stat_conover_iman: 10 pairs match the rank-variance replay") {
    val xs = eventVals(Set.empty)
    val mr = midranks(xs.map(_._2))
    val groups = xs.groupBy(_._1)
    val n = xs.length.toLong
    val k = groups.size
    val ranks = xs.map(x => mr(x._2))
    val cT = n * (n + 1.0) * (n + 1.0) / 4
    val s2 = (ranks.map(r => r * r).sum - cT) / (n - 1)
    val meanr = groups.map { case (g, ys) => g -> ys.map(y => mr(y._2)).sum / ys.length }
    val aStat = groups.values.map(ys => math.pow(ys.map(y => mr(y._2)).sum, 2) / ys.length).sum
    val h = (aStat - cT) / s2
    val rows = queries.Extras236.statConoverIman(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (g1, g2) = (r.getString(0), r.getString(1))
      assert(g1 < g2, "pairs R1-ordered")
      val diff = meanr(g1) - meanr(g2)
      val t = diff / math.sqrt(s2 * (n - 1 - h) / (n - k) *
        (1.0 / groups(g1).length + 1.0 / groups(g2).length))
      assert(math.abs(r.getDouble(2) - diff) < 1e-3, s"$g1/$g2 diff")
      assert(math.abs(r.getDouble(3) - t) < 1e-2, s"$g1/$g2 t ${r.getDouble(3)} vs $t")
      assert(r.getBoolean(4) == (math.abs(t) > 2.807) ||
        math.abs(math.abs(t) - 2.807) < 1e-2)
    }
  }

  test("stat_nemenyi_test: mean ranks sum to b*k(k+1)/2; CD matches") {
    val rows = queries.Extras236.statNemenyiTest(spark, sf).collect()
    assert(rows.length == 10)
    val b = rows.head.getLong(2)
    val cd = 2.728 * math.sqrt(5.0 / b)
    rows.foreach { r =>
      assert(r.getLong(2) == b)
      assert(math.abs(r.getDouble(4) - math.floor(cd * 1e4 + 0.5) / 1e4) < 1e-9)
      assert(r.getBoolean(5) == (r.getDouble(3) > cd)
        || math.abs(r.getDouble(3) - cd) < 1e-3, "significance consistent with CD")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 4.0, "rank diffs within k-1 band")
    }
    // replay the densified grid mean ranks
    val cells = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS mon", "o_orderpriority AS grp",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    val months = cells.map(_._1).distinct
    val prios = cells.map(_._2).distinct.sorted
    val sums = cells.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> xs.map(x => BigInt(x._3)).sum }
    val rankSum = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    months.foreach { m =>
      prios.map(p => (p, sums.getOrElse((m, p), BigInt(0))))
        .sortBy(x => (x._2, x._1)).zipWithIndex
        .foreach { case ((p, _), i0) => rankSum(p) += i0 + 1L }
    }
    val meanr = prios.map(p => p -> rankSum(p).toDouble / months.length).toMap
    rows.foreach { r =>
      val expect = math.abs(meanr(r.getString(0)) - meanr(r.getString(1)))
      assert(math.abs(r.getDouble(3) - expect) < 1e-3,
        s"${r.getString(0)}/${r.getString(1)} mean-rank diff")
    }
  }
}
