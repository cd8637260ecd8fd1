package graft

/** Wave-151 properties at sf0.001: driver replays of the decision
  * curve, NRI/IDI, Watson–Williams, Moses span, Phillips–Perron,
  * small-world sigma pieces, the Supertrend state machine, and the
  * z-order locality census.
  */
class Extras251Spec extends SparkSpec {

  private def score1(x: Double): Long =
    math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5).toLong

  private lazy val cells: Array[(Double, Double, Long, Long)] =
    Tables.lineitem(spark, sf)
      .selectExpr("l_discount", "l_quantity",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).toArray
      .map { case ((x, q), g) => (x, q, g.length.toLong, g.map(_._3).sum) }

  test("stat_decision_curve: matches a plain-Scala threshold replay") {
    val byX = cells.groupBy(_._1).map { case (x, g) =>
      (score1(x), g.map(_._3).sum, g.map(_._4).sum) }.toArray
    val n = byX.map(_._2).sum; val o = byX.map(_._3).sum
    val rows = queries.Extras251.statDecisionCurve(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val pt100 = math.round(r.getAs[Double]("pt") * 100)
      val tp = byX.filter(_._1 >= pt100 * 10000000000L).map(_._3).sum
      val fp = byX.filter(_._1 >= pt100 * 10000000000L).map(t => t._2 - t._3).sum
      assert(r.getAs[Long]("tp") == tp)
      assert(r.getAs[Long]("fp") == fp)
      val pt = pt100 / 100.0
      val nb = tp.toDouble / n - fp.toDouble / n * pt / (1 - pt)
      assert(math.abs(r.getAs[Double]("nb_model") - nb) < 1e-5)
      val nbAll = o.toDouble / n - (1 - o.toDouble / n) * pt / (1 - pt)
      assert(math.abs(r.getAs[Double]("nb_treat_all") - nbAll) < 1e-5)
    }
  }

  test("stat_nri_idi: matches a plain-Scala reclassification replay") {
    def score2(x: Double, q: Double): Long =
      math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x - 0.02 * (q - 25)))) + 0.5).toLong
    def cls(p: Long): Int =
      if (p >= 450000000000L) 2 else if (p >= 300000000000L) 1 else 0
    var o = 0L; var z = 0L
    var upE = 0L; var dnE = 0L; var upZ = 0L; var dnZ = 0L
    var de = BigInt(0); var dz = BigInt(0)
    for ((x, q, ng, og) <- cells) {
      val c1 = cls(score1(x)); val c2 = cls(score2(x, q))
      o += og; z += ng - og
      if (c2 > c1) { upE += og; upZ += ng - og }
      if (c2 < c1) { dnE += og; dnZ += ng - og }
      de += BigInt(og) * (score2(x, q) - score1(x))
      dz += BigInt(ng - og) * (score2(x, q) - score1(x))
    }
    val row = queries.Extras251.statNriIdi(spark, sf).collect().head
    assert(row.getAs[Long]("n_events") == o)
    assert(math.abs(row.getAs[Double]("nri_events") - (upE.toDouble - dnE) / o) < 1e-5)
    assert(math.abs(row.getAs[Double]("nri_nonevents") - (dnZ.toDouble - upZ) / z) < 1e-5)
    assert(math.abs(row.getAs[Double]("idi") -
      (de.toDouble / o / 1e12 - dz.toDouble / z / 1e12)) < 1e-5)
  }

  test("stat_watson_williams: matches a plain-Scala circular replay") {
    val byDay = Tables.lineitem(spark, sf)
      .selectExpr("l_linestatus AS g", "dayofyear(l_shipdate) AS doy")
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(t => (t._1, t._2)).map { case ((g, doy), l) => (g, doy, l.length.toLong) }
    val per = byDay.groupBy(_._1).map { case (_, l) =>
      val cx = l.map(t => math.floor(math.cos(2 * math.Pi * (t._2 - 1) / 365) * 1e12 + 0.5).toLong * t._3).sum / 1e12
      val cy = l.map(t => math.floor(math.sin(2 * math.Pi * (t._2 - 1) / 365) * 1e12 + 0.5).toLong * t._3).sum / 1e12
      (l.map(_._3).sum, math.sqrt(cx * cx + cy * cy), cx, cy)
    }.toArray
    val p = per.length; val nn = per.map(_._1).sum
    val sumr = per.map(_._2).sum
    val bigr = math.sqrt(math.pow(per.map(_._3).sum, 2) + math.pow(per.map(_._4).sum, 2))
    val row = queries.Extras251.statWatsonWilliams(spark, sf).collect().head
    assert(row.getAs[Long]("n_obs") == nn)
    assert(math.abs(row.getAs[Double]("resultant_pooled") - bigr) < 1e-2)
    val rbar = sumr / nn
    val kappa =
      if (rbar < 0.53) 2 * rbar + math.pow(rbar, 3) + 5 * math.pow(rbar, 5) / 6
      else if (rbar < 0.85) -0.4 + 1.39 * rbar + 0.43 / (1 - rbar)
      else 1 / (math.pow(rbar, 3) - 4 * rbar * rbar + 3 * rbar)
    val f = (1 + 3 / (8 * kappa)) * ((nn - p) * (sumr - bigr)) / ((p - 1) * (nn - sumr))
    assert(math.abs(row.getAs[Double]("ww_f") - f) < 1e-2)
  }

  test("stat_moses_extreme: matches a plain-Scala span replay") {
    val base = Tables.customer(spark, sf)
      .filter("c_mktsegment IN ('BUILDING', 'MACHINERY')")
      .selectExpr("c_mktsegment = 'BUILDING' AS ctl",
        "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS v", "c_custkey")
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._3)).zipWithIndex
      .map { case ((ctl, _, _), i) => (ctl, i + 1L) }
    val ctlRanks = base.filter(_._1).map(_._2)
    val nc = ctlRanks.length
    val rkLo = ctlRanks(2); val rkHi = ctlRanks(nc - 3)
    val exp = base.filter(!_._1).map(_._2)
    val inside = exp.count(r => r > rkLo && r < rkHi)
    val row = queries.Extras251.statMosesExtreme(spark, sf).collect().head
    assert(row.getAs[Long]("n_c") == nc)
    assert(row.getAs[Long]("n_e") == exp.length)
    assert(row.getAs[Long]("span_trimmed") == rkHi - rkLo + 1)
    assert(row.getAs[Long]("n_exp_inside") == inside)
  }

  test("time_phillips_perron: matches a plain-Scala OLS + NW replay") {
    val ys = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum).toArray
    val pairs = ys.sliding(2).map(a => (a(1), a(0))).toArray // (y, yl)
    val t = pairs.length
    val sy = pairs.map(p => BigInt(p._1)).sum.toDouble
    val sx = pairs.map(p => BigInt(p._2)).sum.toDouble
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
    val sxx = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
    val rho = (t * sxy - sx * sy) / (t * sxx - sx * sx)
    val dd = sxx - sx * sx / t
    val alpha = (sy - rho * sx) / t
    val eq = pairs.map { case (y, yl) => math.floor(y - alpha - rho * yl + 0.5).toLong }
    def gam(j: Int): Double =
      (j until t).map(i => BigInt(eq(i)) * eq(i - j)).sum.toDouble / t
    val g0 = gam(0)
    val l2 = g0 + 2 * (0.8 * gam(1) + 0.6 * gam(2) + 0.4 * gam(3) + 0.2 * gam(4))
    val zrho = t * (rho - 1) - (t.toDouble * t / dd) * (l2 - g0) / 2
    val row = queries.Extras251.timePhillipsPerron(spark, sf).collect().head
    assert(row.getAs[Long]("n_obs") == t)
    assert(math.abs(row.getAs[Double]("rho_hat") - rho) < 1e-4)
    assert(math.abs(row.getAs[Double]("z_rho") - zrho) < 0.05)
  }

  test("graph_small_world: matches a plain-Scala graph replay") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val n = users.length.toLong
    val edges = users.flatMap(u => Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n)
        .filter(_ != u).map(v => (math.min(u, v), math.max(u, v)))).distinct
    val adj = edges.flatMap(e => Seq(e, (e._2, e._1))).groupBy(_._1)
      .map { case (k, l) => (k, l.map(_._2).toSet) }
    // 5-round BFS from 0
    var visited = Map(0L -> 0L)
    var frontier = Set(0L)
    for (k <- 1 to 5) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- visited.keySet
      visited = visited ++ next.map(_ -> k.toLong)
      frontier = next
    }
    val lhat = visited.values.sum.toDouble / (visited.size - 1)
    val edgeSet = edges.toSet
    val tri = edges.flatMap { case (a, m) =>
      edges.filter(e2 => e2._1 == m).map(e2 => (a, m, e2._2)) }
      .count { case (a, _, c) => edgeSet.contains((a, c)) }
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(dv => dv * (dv - 1) / 2).sum
    val row = queries.Extras251.graphSmallWorld(spark, sf).collect().head
    assert(row.getAs[Long]("n_vertices") == n)
    assert(row.getAs[Long]("n_edges") == edges.length)
    assert(row.getAs[Long]("n_reached") == visited.size)
    assert(math.abs(row.getAs[Double]("c_global") - 3.0 * tri / wedges) < 1e-5)
    assert(math.abs(row.getAs[Double]("l_hat") - lhat) < 1e-3)
    assert(row.getAs[Double]("sigma") > 0)
  }

  test("win_supertrend: matches the driver state-machine replay") {
    val bars = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.maxBy(_._2)._3, g.map(_._3).max, g.map(_._3).min) }
      .toArray
    var atrq = (bars(0)._2 - bars(0)._3) * 1000L
    var fub2 = (bars(0)._2 + bars(0)._3) * 1000L + 6L * atrq
    var flb2 = (bars(0)._2 + bars(0)._3) * 1000L - 6L * atrq
    var dir = 1L; var pc = bars(0)._1; var nflips = 0L; var nup = 0L
    for (t <- 2 to bars.length) {
      val (c, h, l) = bars(t - 1)
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      atrq = math.floor((1.0 / 10 * tr + 9.0 / 10 * (atrq / 1e3)) * 1e3 + 0.5).toLong
      val ub2 = (h + l) * 1000L + 6L * atrq
      val lb2 = (h + l) * 1000L - 6L * atrq
      fub2 = if (ub2 < fub2 || 2000L * pc > fub2) ub2 else fub2
      flb2 = if (lb2 > flb2 || 2000L * pc < flb2) lb2 else flb2
      val nd = if (dir == 1L) { if (2000L * c < flb2) -1L else 1L }
        else { if (2000L * c > fub2) 1L else -1L }
      if (nd != dir) nflips += 1
      if (nd == 1L) nup += 1
      dir = nd; pc = c
    }
    val row = queries.Extras251.winSupertrend(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == bars.length)
    assert(row.getAs[Long]("n_flips") == nflips)
    assert(row.getAs[Long]("n_up_months") == nup)
    assert(row.getAs[Long]("final_dir") == dir)
  }

  test("scan_zorder_locality: z-buckets dominate single-axis layouts") {
    val row = queries.Extras251.scanZorderLocality(spark, sf).collect().head
    assert(row.getAs[Long]("n_events") > 0)
    val z = row.getAs[Double]("avg_bbox_zorder")
    val t = row.getAs[Double]("avg_bbox_timeonly")
    val v = row.getAs[Double]("avg_bbox_valueonly")
    // z-order bounds BOTH dims: its bbox area must beat both
    // single-axis layouts (each leaves one dim unconstrained at ~64)
    assert(z < t && z < v, s"z=$z t=$t v=$v")
    assert(row.getAs[Double]("zorder_gain_vs_time") > 1)
    // replay the z-value interleave for a spot value
    def inter(xb: Long, yb: Long): Long =
      (0 to 5).map(b => ((xb >> b) & 1) << (2 * b) | ((yb >> b) & 1) << (2 * b + 1))
        .map(_.toLong).sum
    assert(inter(63, 63) == 4095 && inter(1, 0) == 1 && inter(0, 1) == 2)
  }
}
