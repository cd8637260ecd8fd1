package graft

/** Wave-133 properties: event-study path vs cell algebra, VAR IRF vs a
  * 2×2 driver solve, E-value closed form, synthetic control vs a full
  * donor-pool replay — at sf0.001.
  */
class Extras233Spec extends SparkSpec {

  test("analytics_event_study: normalized path is zero at k=-1; matches cells") {
    val rows = queries.Extras233.analyticsEventStudy(spark, sf).collect()
    assert(rows.length == 13)
    assert(rows.map(_.getLong(0)).toSeq == (-6L to 6L))
    val km1 = rows.find(_.getLong(0) == -1L).get
    assert(math.abs(km1.getDouble(3)) < 1e-9, "effect at k=-1 is exactly 0 by construction")
    rows.foreach { r =>
      val recon = r.getDouble(2) - km1.getDouble(2)
      assert(math.abs(r.getDouble(3) - recon) < 0.02,
        s"k=${r.getLong(0)}: effect = gap - gap(-1)")
      assert(r.getLong(1) > 0)
    }
  }

  test("time_var_irf: matches the 2x2 driver solve; IRF_1 equals a21") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) => (xs.length.toLong, xs.map(x => BigInt(x._2)).sum) }
    val n = ms.length
    def zq(vals: Seq[Double]): Seq[Long] = {
      val s1 = vals.sum; val s2 = vals.map(x => x * x).sum
      val mean = s1 / n
      val sd = math.sqrt((n * s2 - s1 * s1) / (n.toDouble * (n - 1)))
      vals.map(x => math.floor((x - mean) / sd * 1e9 + 0.5).toLong)
    }
    // replicate the engine's exact-moment standardization
    val us = ms.map(_._1.toDouble); val vs = ms.map(_._2.toDouble)
    val su = ms.map(x => BigInt(x._1)).sum; val suu = ms.map(x => BigInt(x._1) * x._1).sum
    val sv = ms.map(_._2).sum; val svv = ms.map(x => x._2 * x._2).sum
    val zu = ms.map { case (u, _) =>
      math.floor((u - su.toDouble / n) /
        math.sqrt((n.toDouble * suu.toDouble - su.toDouble * su.toDouble) / (n.toDouble * (n - 1))) * 1e9 + 0.5).toLong }
    val zv = ms.map { case (_, v) =>
      math.floor((v.toDouble - sv.toDouble / n) /
        math.sqrt((n.toDouble * svv.toDouble - sv.toDouble * sv.toDouble) / (n.toDouble * (n - 1))) * 1e9 + 0.5).toLong }
    var (g11, g12, g22, h11, h12, h21, h22) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    for (t <- 1 until n) {
      val (pu, pv, cu, cv) = (zu(t - 1), zv(t - 1), zu(t), zv(t))
      g11 += BigInt(pu) * pu; g12 += BigInt(pu) * pv; g22 += BigInt(pv) * pv
      h11 += BigInt(cu) * pu; h12 += BigInt(cu) * pv
      h21 += BigInt(cv) * pu; h22 += BigInt(cv) * pv
    }
    val det = g11.toDouble * g22.toDouble - g12.toDouble * g12.toDouble
    val a11 = (h11.toDouble * g22.toDouble - h12.toDouble * g12.toDouble) / det
    val a12 = (h12.toDouble * g11.toDouble - h11.toDouble * g12.toDouble) / det
    val a21 = (h21.toDouble * g22.toDouble - h22.toDouble * g12.toDouble) / det
    val a22 = (h22.toDouble * g11.toDouble - h21.toDouble * g12.toDouble) / det
    val row = queries.Extras233.timeVarIrf(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - a21) < 1e-5, s"IRF1 ${row.getDouble(0)} vs $a21")
    assert(math.abs(row.getDouble(1) - (a21 * a11 + a22 * a21)) < 1e-5, "IRF2")
    val i2 = a21 * a11 + a22 * a21; val i2b = a21 * a12 + a22 * a22
    assert(math.abs(row.getDouble(2) - (i2 * a11 + i2b * a21)) < 1e-5, "IRF3")
    val tr = a11 + a22; val dt = a11 * a22 - a12 * a21
    val disc = tr * tr - 4 * dt
    val mod = if (disc >= 0)
      math.max(math.abs((tr + math.sqrt(disc)) / 2), math.abs((tr - math.sqrt(disc)) / 2))
    else math.sqrt(dt)
    assert(math.abs(row.getDouble(3) - mod) < 1e-5, "stability modulus")
    assert(row.getString(4) == (if (mod < 1) "stable" else "explosive"))
    assert(mod < 1, "monthly series should be a stable VAR")
  }

  test("stat_e_value: closed form from exact 2x2; e-value >= RR* >= CI e-value") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount >= 0.05 AS dd", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val (g1, g0) = g.partition(_._1)
    val (n1, k1) = (g1.length.toLong, g1.count(_._2).toLong)
    val (n0, k0) = (g0.length.toLong, g0.count(_._2).toLong)
    val rr = (k1.toDouble / n1) / (k0.toDouble / n0)
    val selog = math.sqrt(1.0 / k1 - 1.0 / n1 + 1.0 / k0 - 1.0 / n0)
    val cil = math.exp(math.log(rr) - 1.959964 * selog)
    val ciu = math.exp(math.log(rr) + 1.959964 * selog)
    def ev(r: Double) = r + math.sqrt(r * (r - 1))
    val evp = if (rr >= 1) ev(rr) else ev(1 / rr)
    val evc = if (rr >= 1 && cil > 1) ev(cil)
    else if (rr < 1 && ciu < 1) ev(1 / ciu) else 1.0
    val row = queries.Extras233.statEValue(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n0)
    assert(math.abs(row.getDouble(2) - rr) < 1e-6)
    assert(math.abs(row.getDouble(3) - cil) < 1e-5)
    assert(math.abs(row.getDouble(4) - evp) < 1e-5, "point E-value")
    assert(math.abs(row.getDouble(5) - evc) < 1e-5, "CI E-value")
    assert(row.getDouble(4) >= math.max(rr, 1 / rr) - 1e-9, "E >= RR*")
    assert(row.getDouble(4) >= row.getDouble(5) - 1e-9, "point E >= CI E")
  }

  test("analytics_synthetic_control: matches the donor-pool replay") {
    val nm = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_nationkey"),
        Seq("o_custkey"))
      .selectExpr("CAST(c_nationkey AS BIGINT) AS nk", "CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => ((r.getLong(0), r.getString(1)), BigInt(r.getLong(2))))
      .groupBy(_._1).map { case (k, xs) => k -> (xs.map(_._2).sum.toDouble / xs.length) }
    val months = nm.keys.map(_._2).toSeq.distinct.sorted
    val pre = months.filter(_ < "1997-01")
    val y0 = months.flatMap(m => nm.get((0L, m)).map(m -> _)).toMap
    val donors = nm.keys.map(_._1).filter(_ != 0L).toSeq.distinct.sorted
    val wraw = donors.flatMap { d2 =>
      val terms = pre.flatMap(m => for (yd <- nm.get((d2, m)); yt <- y0.get(m))
        yield math.floor((yd - yt) * (yd - yt) / 1e4 + 0.5).toLong)
      if (terms.isEmpty) None
      else Some(d2 -> 1.0 / (terms.sum.toDouble * 1e4 / terms.length + 1))
    }.toMap
    val ws = wraw.values.sum
    val w = wraw.map { case (k, v) => k -> v / ws }
    val synth = months.map { m =>
      m -> donors.flatMap(d2 => for (yd <- nm.get((d2, m)); ww <- w.get(d2))
        yield math.floor(ww * yd * 1e6 + 0.5).toLong).sum / 1e6
    }.toMap
    val joined = months.filter(m => y0.contains(m) && synth.contains(m))
    val (preM, postM) = joined.partition(_ < "1997-01")
    val preq = preM.map(m => math.floor((y0(m) - synth(m)) * (y0(m) - synth(m)) / 1e4 + 0.5).toLong).sum
    val postg = postM.map(m => math.floor((y0(m) - synth(m)) * 1e2 + 0.5).toLong).sum
    val row = queries.Extras233.analyticsSyntheticControl(spark, sf).collect().head
    assert(row.getLong(0) == preM.length.toLong && row.getLong(1) == postM.length.toLong)
    val preRmse = math.sqrt(preq.toDouble * 1e4 / preM.length) / 100
    assert(math.abs(row.getDouble(2) - preRmse) < 0.02, s"pre RMSE ${row.getDouble(2)} vs $preRmse")
    assert(math.abs(row.getDouble(3) - postg.toDouble / 1e2 / postM.length / 100) < 0.02)
    assert(row.getDouble(2) > 0)
  }
}
