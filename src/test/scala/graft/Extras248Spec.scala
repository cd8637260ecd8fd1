package graft

/** Wave-148 properties at sf0.001: driver-side replays of the SPC
  * charts, the closed-form Procrustes alignment, the DuPont identity,
  * A-priori support recounts, brute-force DBSCAN classes, KDE mass,
  * and the exact-integer energy distance.
  */
class Extras248Spec extends SparkSpec {

  private def cents(d: Double): Long = math.round(d * 100)

  private lazy val dailyCents: Array[(String, Long)] = Tables.orders(spark, sf)
    .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c",
      "o_orderkey")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .groupBy(_._1).toArray.sortBy(_._1)
    .map { case (d, g) => (d, g.map(_._2).sum) }

  test("stat_xbar_s_chart: matches a plain-Scala subgroup replay") {
    val subs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c",
        "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
      .map(g => g.sortBy(_._3).take(5).map(_._2))
      .filter(_.length == 5).toArray
    val m = subs.length
    val row = queries.Extras248.statXbarSChart(spark, sf).collect().head
    assert(row.getAs[Long]("n_subgroups") == m)
    val sqs = subs.map { c =>
      val s5 = c.sum; val q5 = c.map(x => x * x).sum
      math.floor(math.sqrt((5 * q5 - s5 * s5) / 20.0) * 1e6 + 0.5).toLong
    }
    val cl = subs.map(_.sum).sum.toDouble / 5 / m
    val sbar = sqs.sum.toDouble / 1e6 / m
    assert(math.abs(row.getAs[Double]("cl_dollars") - math.rint(cl) / 100) < 0.02)
    assert(math.abs(row.getAs[Double]("ucl_dollars") -
      (math.rint((cl + 1.427 * sbar) * 1e0)) / 100) < 0.02)
    val ooc = subs.count(c => math.abs(c.sum.toDouble / 5 - cl) > 1.427 * sbar)
    assert(row.getAs[Long]("n_ooc_xbar") == ooc)
  }

  test("stat_nelson_rules: matches a plain-Scala rules replay") {
    val r = dailyCents.map(_._2)
    val mDays = r.length
    val t = r.sum
    val diffs = r.sliding(2).map(p => p(1) - p(0)).toArray
    val mrbar = diffs.map(math.abs).sum / 1.128 / (mDays - 1)
    val r1 = r.count(x => math.abs(x.toDouble - t.toDouble / mDays) > 3 * mrbar)
    val side = r.map(x =>
      if (x * mDays > t) 1L else if (x * mDays < t) -1L else 0L)
    val r2 = (8 until mDays).count(i =>
      math.abs(side.slice(i - 8, i + 1).sum) == 9)
    val up = diffs.map(d => if (d > 0) 1 else if (d < 0) -1 else 0)
    // up(i) is the diff ending at day i+1; run of 5 diffs same strict sign
    val r3 = (4 until up.length).count(i =>
      up.slice(i - 4, i + 1).forall(_ == 1) ||
        up.slice(i - 4, i + 1).forall(_ == -1))
    val alt = (1 until up.length).map(i =>
      if (up(i) * up(i - 1) == -1) 1 else 0)
    val r4 = (11 until alt.length).count(i =>
      alt.slice(i - 11, i + 1).sum == 12)
    val row = queries.Extras248.statNelsonRules(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == mDays)
    assert(row.getAs[Long]("n_rule1") == r1, "rule 1")
    assert(row.getAs[Long]("n_rule2") == r2, "rule 2")
    assert(row.getAs[Long]("n_rule3") == r3, "rule 3")
    assert(row.getAs[Long]("n_rule4") == r4, "rule 4")
  }

  test("embed_procrustes_2d: matches the closed-form replay; congruence in (0,1]") {
    val vs = Tables.embeddings(spark, sf)
      .selectExpr("embedding[0] AS x", "embedding[1] AS y",
        "embedding[2] AS xp", "embedding[3] AS yp")
      .collect().map(r => (
        math.floor(r.getFloat(0) * 1e9 + 0.5).toLong,
        math.floor(r.getFloat(1) * 1e9 + 0.5).toLong,
        math.floor(r.getFloat(2) * 1e9 + 0.5).toLong,
        math.floor(r.getFloat(3) * 1e9 + 0.5).toLong))
    val n = vs.length.toLong
    def s(f: ((Long, Long, Long, Long)) => Long): BigInt =
      vs.map(v => BigInt(f(v))).sum
    def sp(f: ((Long, Long, Long, Long)) => (Long, Long)): BigInt =
      vs.map { v => val (a, b) = f(v); BigInt(a) * BigInt(b) }.sum
    val (sx, sy, sxp, syp) = (s(_._1), s(_._2), s(_._3), s(_._4))
    val rnum = (BigInt(n) * sp(v => (v._1, v._4)) - sx * syp).toDouble -
      (BigInt(n) * sp(v => (v._2, v._3)) - sy * sxp).toDouble
    val rden = (BigInt(n) * sp(v => (v._1, v._3)) - sx * sxp).toDouble +
      (BigInt(n) * sp(v => (v._2, v._4)) - sy * syp).toDouble
    val na = (BigInt(n) * sp(v => (v._1, v._1)) - sx * sx).toDouble +
      (BigInt(n) * sp(v => (v._2, v._2)) - sy * sy).toDouble
    val nb = (BigInt(n) * sp(v => (v._3, v._3)) - sxp * sxp).toDouble +
      (BigInt(n) * sp(v => (v._4, v._4)) - syp * syp).toDouble
    val row = queries.Extras248.embedProcrustes2d(spark, sf).collect().head
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("theta_rad") -
      math.atan2(rnum, rden)) < 1e-5)
    val cong = math.sqrt(rnum * rnum + rden * rden) / math.sqrt(na * nb)
    assert(math.abs(row.getAs[Double]("congruence") - cong) < 1e-5)
    assert(row.getAs[Double]("congruence") > 0 &&
      row.getAs[Double]("congruence") <= 1.0)
  }

  test("analytics_dupont_decomposition: factors reconstruct revenue") {
    val rows = queries.Extras248.analyticsDupontDecomposition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rev = r.getAs[Double]("revenue_dollars")
      val prod = r.getAs[Double]("avg_order_value") *
        r.getAs[Double]("orders_per_customer") *
        r.getAs[Long]("active_customers")
      // identity up to the display rounding of the two factors
      assert(math.abs(prod - rev) / rev < 1e-3, s"${r.getString(0)}: $prod vs $rev")
    }
  }

  test("analytics_apriori_triples: top support recounts; conf/lift identities") {
    val rows = queries.Extras248.analyticsAprioriTriples(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val partBrand = Tables.part(spark, sf)
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val baskets = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), partBrand(r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = baskets.size
    val top = rows.head
    val (a, b, c) = (top.getAs[String]("a"), top.getAs[String]("b"), top.getAs[String]("c"))
    val suppAbc = baskets.values.count(s => s(a) && s(b) && s(c))
    val suppAb = baskets.values.count(s => s(a) && s(b))
    val suppC = baskets.values.count(_(c))
    assert(top.getAs[Long]("supp_abc") == suppAbc)
    assert(top.getAs[Long]("supp_ab") == suppAb)
    assert(top.getAs[Long]("supp_c") == suppC)
    assert(math.abs(top.getAs[Double]("conf_ab_c") -
      math.rint(suppAbc.toDouble / suppAb * 1e6) / 1e6) < 1e-9)
    rows.foreach(r => assert(r.getAs[Long]("supp_abc") >= 2))
    // sorted by support desc
    assert(rows.map(_.getAs[Long]("supp_abc")).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("embed_dbscan_cores: matches brute-force classes") {
    val all = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding[0] AS x", "embedding[1] AS y",
        "embedding[2] AS z")
      .collect().map(r => (r.getLong(0),
        math.floor(r.getFloat(1) * 1e6 + 0.5).toLong,
        math.floor(r.getFloat(2) * 1e6 + 0.5).toLong,
        math.floor(r.getFloat(3) * 1e6 + 0.5).toLong))
    val corpus = all.map(v => (v._2, v._3, v._4))
    // the graded census is panel-bounded: vec_id < 500 (at sf0.001 the
    // panel IS the whole corpus, so this also exercises the full census)
    val pts = all.filter(_._1 < 500L).map(v => (v._2, v._3, v._4))
    val eps2 = 10000000000L
    def d2(p: (Long, Long, Long), q: (Long, Long, Long)): Long = {
      val (dx, dy, dz) = (p._1 - q._1, p._2 - q._2, p._3 - q._3)
      dx * dx + dy * dy + dz * dz
    }
    val nbrs = pts.map(p => corpus.filter(q => d2(p, q) <= eps2))
    val core = pts.indices.map(i => nbrs(i).length >= 4)
    val coreSet = pts.indices.filter(core).map(pts).toSet
    val classes = pts.indices.map { i =>
      if (core(i)) "core"
      else if (nbrs(i).exists(coreSet)) "border"
      else "noise"
    }
    val want = classes.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = queries.Extras248.embedDbscanCores(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_points")).toMap
    assert(got == want.filter(_._2 > 0), s"got $got want $want")
  }

  test("stat_kde_silverman: 41 grid rows; exact grid-point replay") {
    val rows = queries.Extras248.statKdeSilverman(spark, sf).collect()
    assert(rows.length == 41)
    assert(rows.forall(_.getAs[Double]("density_per_dollar") >= 0))
    // full-precision driver replay of the quantized-kernel pipeline
    // (at sf0.001 h is smaller than the grid spacing, so the Riemann
    // mass-≈-1 heuristic is invalid; the exact replay is the check)
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toArray
    val n = spend.length
    val sv = spend.map(BigInt(_)).sum
    val qv = spend.map(x => BigInt(x) * BigInt(x)).sum
    val sigma = math.sqrt((BigInt(n) * qv - sv * sv).toDouble / n / (n - 1))
    val sorted = spend.sorted
    def qc(p: Double): Double = {
      val idx = p * (n - 1); val lo = idx.toInt
      val f = idx - lo
      if (lo + 1 < n) (1 - f) * sorted(lo) + f * sorted(lo + 1)
      else sorted(lo).toDouble
    }
    val h = 0.9 * math.min(sigma, (qc(0.75) - qc(0.25)) / 1.34) *
      math.pow(n, -0.2)
    val (vmin, vmax) = (sorted.head, sorted.last)
    val hist = spend.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (k <- Seq(0, 20, 40)) {
      val g = vmin.toDouble + k * (vmax.toDouble - vmin) / 40
      val sq = hist.map { case (v, cnt) =>
        math.floor(math.exp(-((g - v) / h) * ((g - v) / h) / 2) * 1e12 + 0.5)
          .toLong * cnt
      }.sum
      val want = math.rint(sq.toDouble / 1e12 / n / h * 100 * 1e8) / 1e8
      val got = rows(k).getAs[Double]("density_per_dollar")
      assert(math.abs(got - want) < 1e-7, s"k=$k got $got want $want")
    }
  }

  test("stat_energy_distance: matches the brute-force pairwise replay exactly") {
    val ev = Tables.events(spark, sf)
      .filter("event_type IN ('purchase', 'view')")
      .selectExpr("event_type",
        "least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0L), 100000L) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = ev.filter(_._1 == "purchase").map(_._2)
    val ys = ev.filter(_._1 == "view").map(_._2)
    def cross(a: Array[Long], b: Array[Long]): BigInt =
      (for (x <- a; y <- b) yield BigInt(math.abs(x - y))).sum
    val exy = cross(xs, ys).toDouble / xs.length / ys.length
    val exx = cross(xs, xs).toDouble / xs.length / xs.length
    val eyy = cross(ys, ys).toDouble / ys.length / ys.length
    val want = (2 * exy - exx - eyy) / 100
    val row = queries.Extras248.statEnergyDistance(spark, sf).collect().head
    assert(row.getAs[Long]("n") == xs.length && row.getAs[Long]("m") == ys.length)
    assert(math.abs(row.getAs[Double]("energy_dist_dollars") - want) < 1e-4,
      s"${row.getAs[Double]("energy_dist_dollars")} vs $want")
    assert(row.getAs[Double]("energy_dist_dollars") >= 0)
  }
}
