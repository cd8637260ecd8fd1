package graft

/** Wave-77 properties: Cronbach α, one-way ICC, cluster design effect,
  * Box–Cox grid replayed against brute force on sf0.001.
  */
class Extras177Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_cronbach_alpha: brute-force item/total variance replay") {
    val rows = Tables.orders(spark, sf).select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        (r.getAs[java.time.LocalDateTime](1).getMonthValue - 1) / 3 + 1,
        cents(r.getDouble(2))))
    val per = rows.groupBy(_._1).view.mapValues { g =>
      (1 to 4).map(q => g.filter(_._2 == q).map(_._3).sum.toDouble).toArray
    }.values.toArray
    val n = per.length
    def varNum(xs: Array[Double]): Double = {
      val s = xs.sum; n * xs.map(x => x * x).sum - s * s
    }
    val itemNum = (0 until 4).map(i => varNum(per.map(_(i)))).sum
    val totNum = varNum(per.map(_.sum))
    val alpha = 4.0 / 3 * (1 - itemNum / totNum)
    val row = queries.Extras177.statCronbachAlpha(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getInt(1) == 4)
    assert(math.abs(row.getDouble(2) - itemNum / totNum) < 1e-5)
    assert(math.abs(row.getDouble(3) - alpha) < 1e-5)
  }

  /** Shared one-way ANOVA replay for ICC/DEFF. */
  private def anova(groups: Array[Array[Long]]): (Long, Long, Double, Double, Double) = {
    val g = groups.length
    val n = groups.map(_.length.toLong).sum
    val st = groups.flatten.map(BigInt(_)).sum
    val sbq = groups.map(gr => math.floor {
      val s = gr.map(BigInt(_)).sum.toDouble; s * s / gr.length + 0.5
    }).sum
    val qt = groups.flatten.map(x => BigInt(x) * BigInt(x)).sum
    val ssb = sbq - st.toDouble * st.toDouble / n
    val ssw = qt.toDouble - sbq
    val k0 = (n - groups.map(x => x.length.toDouble * x.length).sum / n) / (g - 1)
    (g.toLong, n, ssb / (g - 1), ssw / (n - g), k0)
  }

  test("stat_icc_oneway: ANOVA replay across suppliers") {
    val xs = Tables.lineitem(spark, sf).select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val groups = xs.groupBy(_._1).values.map(_.map(_._2)).toArray
    val (g, n, msb, msw, k0) = anova(groups)
    val icc = (msb - msw) / (msb + (k0 - 1) * msw)
    val row = queries.Extras177.statIccOneway(spark, sf).collect().head
    assert(row.getLong(0) == g && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - k0) < 1e-3)
    assert(math.abs(row.getDouble(3) - icc) < 1e-4)
  }

  test("sample_cluster_deff: DEFF = 1 + (k0-1)*ROH; n_eff = n/DEFF") {
    val xs = Tables.customer(spark, sf).select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), cents(r.getDouble(1))))
    val groups = xs.groupBy(_._1).values.map(_.map(_._2)).toArray
    val (g, n, msb, msw, k0r) = anova(groups)
    val roh = (msb - msw) / (msb + (k0r - 1) * msw)
    val row = queries.Extras177.sampleClusterDeff(spark, sf).collect().head
    assert(row.getLong(0) == g && row.getLong(1) == n)
    // the query rounds roh to 6dp before deff; replay the same rounding
    val rohR = math.floor(roh * 1e6 + 0.5) / 1e6  // positive here, floor+0.5 == half-up
    val k0R = math.floor(k0r * 1e4 + 0.5) / 1e4
    assert(math.abs(row.getDouble(3) - roh) < 1e-5)
    assert(math.abs(row.getDouble(4) - (1 + (k0R - 1) * rohR)) < 1e-4)
    assert(math.abs(row.getDouble(5) - n / (1 + (k0R - 1) * rohR)) < 0.5)
  }

  test("stat_box_cox_grid: 5-row grid, LL replay, best at the log-ish end") {
    val ys = Tables.orders(spark, sf).select("o_totalprice").collect().map(_.getDouble(0))
    val n = ys.length
    def ll(lam: Double): Double = {
      val scale = if (lam < 0) 1e12 else if (lam < 1) 1e9 else 1e6
      val t = ys.map(y => if (lam == 0.0) math.log(y) else (math.pow(y, lam) - 1) / lam)
      val q = t.map(x => BigInt(math.floor(x * scale + 0.5).toLong))
      val st = q.sum; val qt = q.map(x => x * x).sum
      val v = (BigInt(n) * qt - st * st).toDouble / (n.toDouble * n) / (scale * scale)
      -n / 2.0 * math.log(v) + (lam - 1) * t.map(_ => 0.0).sum +
        (lam - 1) * ys.map(y => math.floor(math.log(y) * 1e9 + 0.5) / 1e9).sum
    }
    val got = queries.Extras177.statBoxCoxGrid(spark, sf).collect()
    assert(got.length == 5)
    assert(got.map(_.getDouble(0)).toSeq == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - ll(r.getDouble(0))) < 0.01,
        s"lambda=${r.getDouble(0)}: got ${r.getDouble(2)}, want ${ll(r.getDouble(0))}")
    }
    assert(got.count(_.getBoolean(3)) >= 1)
    val best = got.filter(_.getBoolean(3)).map(_.getDouble(0))
    assert(got.filter(r => best.contains(r.getDouble(0))).forall(r =>
      got.forall(o => o.getDouble(2) <= r.getDouble(2) + 1e-9)))
  }
}
