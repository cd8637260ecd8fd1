package graft

/** Wave-103 properties: Cox score, BWS, assortment overlap, tokens
  * Gini vs brute force at sf0.001.
  */
class Extras203Spec extends SparkSpec {

  test("stat_cox_score: at-risk covariate-moment replay; chi2 >= 0") {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate)).toMap
    val ev = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate", "l_discount").collect()
      .map { r =>
        val t = java.time.temporal.ChronoUnit.DAYS.between(
          od(r.getLong(0)), r.getAs[java.time.LocalDateTime](1).toLocalDate)
        (t, math.round(r.getDouble(2) * 100))
      }.filter(_._1 >= 1)
    val byT = ev.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (t, g) => (t, g.size.toLong, g.map(_._2).sum, g.map(x => x._2 * x._2).sum) }
    var nr = 0L; var sxr = 0L; var sxxr = 0L
    var su6 = BigInt(0); var sv6 = BigInt(0)
    byT.foreach { case (_, dt, sxd, sxxd) =>
      nr += dt; sxr += sxd; sxxr += sxxd
      su6 += BigInt(sxd) * 1000000 - (BigInt(dt) * sxr * 1000000) / nr
      if (nr > 1)
        sv6 += (BigInt(dt) * (BigInt(nr) * sxxr - BigInt(sxr) * sxr) * (nr - dt) * 1000000) /
          (BigInt(nr) * nr * (nr - 1))
    }
    val u = su6.toDouble / 1e6
    val row = queries.Extras203.statCoxScore(spark, sf).collect().head
    assert(row.getLong(0) == byT.size.toLong)
    assert(math.abs(row.getDouble(1) - u) < 1e-2)
    assert(math.abs(row.getDouble(2) - u * u / (sv6.toDouble / 1e6)) < 1e-2)
    assert(row.getDouble(2) >= 0)
  }

  test("stat_baumgartner_ws: exploded-rank replay; B > 0") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    val hist = xs.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.count(_._1 == "A").toLong, g.count(_._1 == "R").toLong) }
    val n1 = hist.map(_._2).sum; val n2 = hist.map(_._3).sum
    var c1 = 0L; var c2 = 0L; var s1 = 0L; var s2 = 0L
    hist.foreach { case (_, l1, l2) =>
      val r2 = 2 * (c1 + c2) + l1 + l2 + 1
      def term(i: Long, ns: Long, no: Long): Long = {
        val num = math.pow(r2 / 2.0 - (ns + no).toDouble / ns * i, 2)
        val den = (i.toDouble / (ns + 1)) * (1 - i.toDouble / (ns + 1)) *
          no.toDouble * (ns + no) / ns
        math.floor(num / den * 1e6 + 0.5).toLong
      }
      (c1 + 1 to c1 + l1).foreach(i => s1 += term(i, n1, n2))
      (c2 + 1 to c2 + l2).foreach(i => s2 += term(i, n2, n1))
      c1 += l1; c2 += l2
    }
    val row = queries.Extras203.statBaumgartnerWs(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - s1 / 1e6 / n1) < 1e-4)
    assert(math.abs(row.getDouble(3) - s2 / 1e6 / n2) < 1e-4)
    assert(math.abs(row.getDouble(4) - (s1 / 1e6 / n1 + s2 / 1e6 / n2) / 2) < 1e-4)
    assert(row.getDouble(4) > 0)
  }

  test("analytics_assortment_overlap: pairwise Jaccard replay") {
    val li = Tables.lineitem(spark, sf).select("l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val natOf = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val sets = li.map(l => (natOf(l._1), l._2)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = queries.Extras203.analyticsAssortmentOverlap(spark, sf).collect()
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).intersect(sets(b)).size if inter > 0
    } yield ((a, b), inter)).toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == expected(k).toLong)
      val j = expected(k).toDouble / (sets(k._1).size + sets(k._2).size - expected(k))
      assert(math.abs(r.getDouble(3) - j) < 1e-6)
    }
  }

  test("pipeline_tokens_gini: rank-weighted replay; 0 <= G < 1") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val sorted = docs.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length
    val st = sorted.map(BigInt(_)).sum
    val gnum = sorted.zipWithIndex.map { case (t, i0) =>
      BigInt(t) * (2L * (i0 + 1) - n - 1) }.sum
    val g = gnum.toDouble / (n.toDouble * st.toDouble)
    val topMass = sorted.drop(n - n / 10).map(BigInt(_)).sum
    val row = queries.Extras203.pipelineTokensGini(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - st.toDouble) < 1)
    assert(math.abs(row.getDouble(2) - g) < 1e-6)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) < 1)
    assert(math.abs(row.getDouble(3) - topMass.toDouble / st.toDouble) < 1e-6)
  }
}
