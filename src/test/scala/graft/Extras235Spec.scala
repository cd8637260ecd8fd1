package graft

/** Wave-135 properties: logDice vs a Counter replay, SPRT vs a
  * sequential walk, OBF looks vs cumulative cells, binseg vs an exact
  * BigInt argmax replay — at sf0.001.
  */
class Extras235Spec extends SparkSpec {

  test("text_log_dice: matches the Counter replay; scores bounded by 14") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("split(lower(text), ' ') AS t")
      .collect().map(_.getSeq[String](0).toArray)
    val bigs = docs.flatMap(t => t.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val f12 = bigs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 >= 5)
    val fu = bigs.flatMap(b => Seq(b._1, b._2)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val scored = f12.map { case ((w1, w2), f) =>
      (s"$w1 $w2", f,
        math.floor((14 + math.log(2.0 * f / (fu(w1).toDouble + fu(w2))) / math.log(2)) * 1e4 + 0.5) / 1e4)
    }.toSeq.sortBy(x => (-x._3, x._1)).take(10)
    val rows = queries.Extras235.textLogDice(spark, sf).collect()
    assert(rows.length == 10)
    rows.zip(scored).foreach { case (r, (bg, f, sc)) =>
      assert(r.getString(0) == bg, s"bigram ${r.getString(0)} vs $bg")
      assert(r.getLong(1) == f)
      assert(math.abs(r.getDouble(2) - sc) < 2e-4)
      assert(r.getDouble(2) <= 14 + 1e-9, "logDice bounded above by 14")
    }
  }

  test("stat_sprt_sequential: matches the sequential walk") {
    val ys = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(x => (x._1, x._2)).map(_._3)
    val incR = math.floor(math.log(0.26 / 0.24) * 1e12 + 0.5).toLong
    val incN = math.floor(math.log(0.74 / 0.76) * 1e12 + 0.5).toLong
    val bound = math.floor(math.log(19.0) * 1e12 + 0.5).toLong
    var cum = 0L; var hi = -1L; var lo = -1L
    ys.zipWithIndex.foreach { case (y, i0) =>
      cum += (if (y) incR else incN)
      if (hi < 0 && cum >= bound) hi = i0 + 1
      if (lo < 0 && cum <= -bound) lo = i0 + 1
    }
    val row = queries.Extras235.statSprtSequential(spark, sf).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    val dec = if (hi > 0 && (lo < 0 || hi < lo)) "accept_h1"
    else if (lo > 0 && (hi < 0 || lo < hi)) "accept_h0" else "no_decision"
    assert(row.getString(1) == dec, s"decision ${row.getString(1)} vs $dec")
    val nAt = if (hi > 0 && lo > 0) math.min(hi, lo) else math.max(hi, lo)
    if (dec != "no_decision") {
      assert(row.getLong(2) == nAt, s"stopping n ${row.getLong(2)} vs $nAt")
      assert(row.getDouble(4) < 1.0, "sequential test stopped early")
    }
    assert(math.abs(row.getDouble(3) - cum / 1e12) < 1e-6, "final LLR")
  }

  test("stat_group_sequential: matches cumulative cells; OBF criticals shrink") {
    val cells = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        Seq("l_orderkey"))
      .selectExpr("year(o_orderdate) AS yr", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getInt(0), r.getBoolean(1)))
    val rows = queries.Extras235.statGroupSequential(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val yr = r.getLong(1).toInt
      val upTo = cells.filter(_._1 <= yr)
      val n = upTo.length.toLong; val k = upTo.count(_._2).toLong
      assert(r.getLong(2) == n, s"n through $yr")
      val z = (k.toDouble / n - 0.25) / math.sqrt(0.25 * 0.75 / n)
      assert(math.abs(r.getDouble(3) - z) < 1e-3, s"z through $yr")
      assert(r.getLong(5) == (if (math.abs(z) > r.getDouble(4)) 1L else 0L))
    }
    val crits = rows.map(_.getDouble(4))
    assert(crits.sliding(2).forall { case Array(a, b) => b < a }, "OBF criticals decrease")
  }

  test("time_binseg_changepoints: matches the exact BigInt argmax replay") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val n = ms.length
    def best(lo: Int, hi: Int): (Long, BigInt) = {
      val seg = ms.slice(lo, hi + 1).map(BigInt(_))
      val k = seg.length; val sv = seg.sum
      var cum = BigInt(0); var bS = BigInt(-1); var bT = -1
      for (i <- 0 until k - 1) {
        cum += seg(i)
        val st = (cum * k - BigInt(i + 1) * sv).abs
        if (st > bS) { bS = st; bT = i }
      }
      ((lo + bT + 1).toLong, bS)
    }
    val (c1, s1) = best(0, n - 1)
    val (cl, _) = best(0, c1.toInt - 1)
    val (cr, _) = best(c1.toInt, n - 1)
    val row = queries.Extras235.timeBinsegChangepoints(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == c1, s"cp1 ${row.getLong(1)} vs $c1")
    assert(row.getLong(2) == (s1 / 1000000).toLong)
    assert(row.getLong(3) == cl && row.getLong(4) == cr)
    assert(row.getLong(3) < row.getLong(1) && row.getLong(1) < row.getLong(4),
      "second-level splits bracket the first")
    val m1 = ms.take(c1.toInt).map(BigInt(_)).sum.toDouble / c1 / 100
    assert(math.abs(row.getDouble(5) - m1) < 0.02)
  }
}
