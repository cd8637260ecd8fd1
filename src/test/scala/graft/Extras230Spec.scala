package graft

/** Wave-130 properties: attribution vs a journey replay, Qini identity
  * checks vs direct cumulative algebra, Törnqvist vs a driver replay,
  * SES grid vs the sequential recursion — at sf0.001.
  */
class Extras230Spec extends SparkSpec {

  test("analytics_markov_attribution: matches a full driver replay of the chain") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS STRING) AS tl", "event_id",
        """CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
          |WHEN 'cart' THEN 3 WHEN 'purchase' THEN 4 ELSE 1 END AS st""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val counts = Array.ofDim[Long](6, 6)
    ev.groupBy(_._1).values.foreach { xs =>
      val srt = xs.sortBy(x => (x._2, x._3)).map(_._4)
      val fp = srt.indexOf(4)
      val kept = if (fp >= 0) srt.take(fp + 1) else srt
      var prev = 0
      kept.foreach { s => counts(prev)(s) += 1; prev = s }
      if (kept.last != 4) counts(kept.last)(5) += 1
    }
    def conv(removed: Int): Double = {
      val c = Array.ofDim[Long](6, 6)
      for (f <- 0 until 6; t0 <- 0 until 6) {
        val t = if (removed > 0 && t0 == removed) 5 else t0
        c(f)(t) += counts(f)(t0)
      }
      val rs = c.map(_.sum)
      val tm = Array.tabulate(6, 6)((i, j) => if (rs(i) == 0) 0.0 else c(i)(j).toDouble / rs(i))
      var p = Array.tabulate(6)(i => if (i == 4) 1.0 else 0.0)
      for (_ <- 1 to 60) {
        p = Array.tabulate(6) { i =>
          if (i == 4) 1.0 else if (i == 5) 0.0
          else { var a = 0.0; for (j <- 0 until 6) a += tm(i)(j) * p(j); a }
        }
      }
      p(0)
    }
    val full = conv(0)
    val rows = queries.Extras230.analyticsMarkovAttribution(spark, sf).collect()
    assert(rows.length == 3)
    val reSum = Seq(1, 2, 3).map(k => 1 - conv(k) / full).sum
    rows.foreach { r =>
      val k = r.getString(0) match { case "view" => 1; case "click" => 2; case "cart" => 3 }
      val pk = conv(k); val re = 1 - pk / full
      assert(math.abs(r.getDouble(1) - full) < 1e-5, "full conv prob")
      assert(math.abs(r.getDouble(2) - pk) < 1e-5, s"${r.getString(0)} removed")
      assert(math.abs(r.getDouble(3) - re) < 1e-5)
      assert(math.abs(r.getDouble(4) - re / reSum) < 1e-5)
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-9, "removal cannot raise conversion")
    }
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4, "shares sum to 1")
  }

  test("analytics_qini_uplift: cumulative identities and monotone counts") {
    val rows = queries.Extras230.analyticsQiniUplift(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    var prevT = 0L; var prevC = 0L
    rows.foreach { r =>
      val (ntc, ncc, rtc, rcc) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ntc >= prevT && ncc >= prevC, "cumulative counts monotone")
      prevT = ntc; prevC = ncc
      assert(rtc <= ntc && rcc <= ncc, "responders bounded by arm size")
      val q = if (ncc == 0) rtc.toDouble else rtc - rcc.toDouble * ntc / ncc
      assert(math.abs(r.getDouble(6) - q) < 1e-3, s"decile ${r.getLong(0)} qini")
    }
    val last = rows.last
    assert(last.getLong(2) + last.getLong(3) == rows.map(_.getLong(1)).sum,
      "final cumulative covers every customer")
  }

  test("analytics_tornqvist_index: matches the driver replay; index positive") {
    val pm = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "CAST(date_trunc('month', l_shipdate) AS STRING) AS m",
        """CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
          | * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS r""".stripMargin,
        "CAST(l_quantity AS BIGINT) AS q")
      .collect().map(r => ((r.getLong(0), r.getString(1)), (BigInt(r.getLong(2)), r.getLong(3))))
      .groupBy(_._1).map { case (k, xs) =>
        k -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
    val months = pm.keys.map(_._2).toSeq.distinct.sorted
    val mt = months.map(m => m -> pm.filter(_._1._2 == m).values.map(_._1).sum).toMap
    var tot = BigInt(0); var links = 0; var mx = BigInt(0)
    months.sliding(2).foreach { case Seq(m0, m1) =>
      var lq = BigInt(0); var any = false
      pm.keys.filter(_._2 == m0).map(_._1).foreach { p =>
        pm.get((p, m1)).foreach { case (r1, q1) =>
          val (r0, q0) = pm((p, m0))
          val w = (r0.toDouble / mt(m0).toDouble + r1.toDouble / mt(m1).toDouble) / 2
          val t = math.floor(w * math.log(r1.toDouble * q0 / (r0.toDouble * q1)) * 1e12 + 0.5).toLong
          lq += t; any = true
        }
      }
      if (any) { links += 1; tot += lq; if (lq.abs > mx) mx = lq.abs }
    }
    val row = queries.Extras230.analyticsTornqvistIndex(spark, sf).collect().head
    assert(row.getLong(0) == links.toLong)
    assert(math.abs(row.getDouble(2) - math.exp(tot.toDouble / 1e12)) < 1e-5,
      s"index ${row.getDouble(2)}")
    assert(math.abs(row.getDouble(3) - mx.toDouble / 1e12) < 1e-6)
    assert(row.getDouble(2) > 0)
  }

  test("time_ses_grid: matches the sequential grid replay") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val n = ms.length
    val fits = (1 to 19).map { k =>
      val alpha = k / 20.0 // == CAST(k*DECIMAL 0.05 AS DOUBLE): correctly-rounded k/20
      var l = ms(0).toDouble; var sse = 0.0
      for (t <- 1 until n) { val e = ms(t) - l; sse += e * e; l = alpha * ms(t) + (1 - alpha) * l }
      (alpha, sse, l)
    }
    val best = fits.minBy(f => (f._2, f._1))
    val row = queries.Extras230.timeSesGrid(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - best._1) < 1e-9, s"alpha ${row.getDouble(1)} vs ${best._1}")
    assert(math.abs(row.getDouble(2) - math.sqrt(best._2 / (n - 1)) / 100) < 0.02)
    assert(math.abs(row.getDouble(3) - best._3 / 100) < 0.02)
    assert(row.getDouble(2) > 0 && row.getDouble(1) > 0 && row.getDouble(1) < 1)
  }
}
