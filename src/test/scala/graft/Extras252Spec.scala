package graft

/** Wave-152 properties at sf0.001: driver replays of the two-sample
  * KS, average precision, exact quantile regression, Lomb–Scargle,
  * D4 wavelet energies, the ADX recursion, Peto pooling, and the
  * Chauvenet census.
  */
class Extras252Spec extends SparkSpec {

  test("stat_ks_two_sample: matches a plain-Scala EDF replay") {
    val vals = Tables.events(spark, sf)
      .filter("event_type IN ('purchase', 'view')")
      .selectExpr("event_type",
        "least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0L), 100000L) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = vals.filter(_._1 == "purchase").map(_._2).sorted
    val ys = vals.filter(_._1 == "view").map(_._2).sorted
    val grid = (xs ++ ys).distinct.sorted
    val dmax = grid.map { v =>
      math.abs(xs.count(_ <= v).toLong * ys.length - ys.count(_ <= v).toLong * xs.length)
    }.max
    val row = queries.Extras252.statKsTwoSample(spark, sf).collect().head
    assert(row.getAs[Long]("nx") == xs.length)
    assert(row.getAs[Long]("ny") == ys.length)
    val d = dmax.toDouble / (xs.length.toDouble * ys.length)
    assert(math.abs(row.getAs[Double]("d_stat") - d) < 1e-5)
    val lam2 = d * d * (xs.length.toDouble * ys.length / (xs.length + ys.length))
    val p = 2 * (math.exp(-2 * lam2) - math.exp(-8 * lam2) +
      math.exp(-18 * lam2) - math.exp(-32 * lam2))
    assert(math.abs(row.getAs[Double]("p_asymptotic") - p) < 1e-4)
  }

  test("stat_pr_auc: matches a plain-Scala AP replay") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount AS x", "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (x, rows) =>
        (math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5).toLong,
          rows.map(_._2).sum, rows.length - rows.map(_._2).sum)
      }.sortBy(-_._1) // descending score
    val o = g.map(_._2).sum; val z = g.map(_._3).sum
    var cumO = 0L; var cumZ = 0L; var ap = 0.0
    for ((_, og, zg) <- g) {
      cumO += og; cumZ += zg
      ap += math.floor(og.toDouble / o * (cumO.toDouble / (cumO + cumZ)) * 1e15 + 0.5) / 1e15
    }
    val row = queries.Extras252.statPrAuc(spark, sf).collect().head
    assert(row.getAs[Long]("n_items") == o + z)
    assert(math.abs(row.getAs[Double]("pr_auc") - ap) < 1e-5)
    // AP of any informative score beats the prevalence baseline here
    assert(row.getAs[Double]("pr_auc") > row.getAs[Double]("prevalence"))
  }

  test("stat_quantile_regression: exact check-loss minimum over candidates") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum).toArray
    val pts = vs.zipWithIndex.map { case (v, i) => (i + 1L, v) }
    var best = (Long.MaxValue, 0L, 0L, 0.0, 0.0)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (ti, vi) = pts(i); val (tj, vj) = pts(j)
      val b = (vj - vi).toDouble / (tj - ti)
      val a = vi - b * ti
      val loss = pts.map { case (t, v) =>
        val r = v - a - b * t
        if (r >= 0) math.floor(9 * r + 0.5).toLong else math.floor(-r + 0.5).toLong
      }.sum
      if (loss < best._1 || (loss == best._1 && (ti < best._2 || (ti == best._2 && tj < best._3))))
        best = (loss, ti, tj, a, b)
    }
    val row = queries.Extras252.statQuantileRegression(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == pts.length)
    assert(math.abs(row.getAs[Double]("slope_dollars_per_month") - best._5 / 100) < 1e-4)
    assert(math.abs(row.getAs[Double]("check_loss_dollars") - best._1 / 10.0 / 100) < 0.02)
    // the tau=0.9 line sits above most months: residuals below it dominate
    val (_, _, _, a, b) = best
    val above = pts.count { case (t, v) => v > a + b * t }
    assert(above.toDouble / pts.length < 0.5)
  }

  test("time_lomb_scargle: matches a plain-Scala two-pass replay") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_orderdate AS DATE) AS STRING) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (day, g) =>
        val d = java.time.LocalDate.parse(day).toEpochDay
        (d, g.map(_._2).sum)
      }.toArray
    val t0 = days.map(_._1).min
    val n = days.length.toLong
    val sy = days.map(x => BigInt(x._2)).sum
    val syy = days.map(x => BigInt(x._2) * x._2).sum
    val rows = queries.Extras252.timeLombScargle(spark, sf).collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val p = r.getAs[Double]("period_days")
      val om = 2 * math.Pi / p
      val s2 = days.map(x => math.floor(math.sin(2 * om * (x._1 - t0)) * 1e9 + 0.5).toLong).sum
      val c2 = days.map(x => math.floor(math.cos(2 * om * (x._1 - t0)) * 1e9 + 0.5).toLong).sum
      val tau = math.atan2(s2.toDouble, c2.toDouble) / (2 * om)
      var yc = BigInt(0); var ys = BigInt(0); var cc = BigInt(0); var ss = BigInt(0)
      for ((dd, y) <- days) {
        val t = dd - t0
        val cq = math.floor(math.cos(om * (t - tau)) * 1e9 + 0.5).toLong
        val sq = math.floor(math.sin(om * (t - tau)) * 1e9 + 0.5).toLong
        val ycn = BigInt(y) * n - sy
        yc += ycn * cq; ys += ycn * sq
        cc += BigInt(cq) * cq; ss += BigInt(sq) * sq
      }
      val power = 0.5 * ((yc.toDouble / n / 1e9) * (yc.toDouble / n / 1e9) / (cc.toDouble / 1e18)
        + (ys.toDouble / n / 1e9) * (ys.toDouble / n / 1e9) / (ss.toDouble / 1e18))
      val sig2 = (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble) / (n.toDouble * n)
      assert(math.abs(r.getAs[Double]("lomb_power_norm") - power / sig2) < 1e-4,
        s"period $p")
      assert(r.getAs[Long]("n_days") == n)
    }
  }

  test("time_db4_energy: shares sum to 1 and match a plain-Scala replay") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum).toArray
    val c0 = (1 + math.sqrt(3)) / (4 * math.sqrt(2))
    val c1 = (3 + math.sqrt(3)) / (4 * math.sqrt(2))
    val c2 = (3 - math.sqrt(3)) / (4 * math.sqrt(2))
    val c3 = (1 - math.sqrt(3)) / (4 * math.sqrt(2))
    def lvl(xs: Array[Long], scale: Double): (Array[Long], Array[Long]) = {
      val idx = xs.indices.filter(i => i >= 3 && (i + 1) % 2 == 0)
      (idx.map(i => math.floor(
        (c0 * xs(i - 3) + c1 * xs(i - 2) + c2 * xs(i - 1) + c3 * xs(i)) / scale + 0.5).toLong).toArray,
        idx.map(i => math.floor(
          (c3 * xs(i - 3) - c2 * xs(i - 2) + c1 * xs(i - 1) - c0 * xs(i)) / scale + 0.5).toLong).toArray)
    }
    val (a1, d1) = lvl(vs, 1e3)
    val (a2, d2) = lvl(a1, 1.0)
    val ed1 = d1.map(x => BigInt(x) * x).sum
    val ed2 = d2.map(x => BigInt(x) * x).sum
    val ea2 = a2.map(x => BigInt(x) * x).sum
    val tot = (ed1 + ed2 + ea2).toDouble
    val row = queries.Extras252.timeDb4Energy(spark, sf).collect().head
    assert(row.getAs[Long]("n_l1_coeffs") == d1.length)
    assert(row.getAs[Long]("n_l2_coeffs") == d2.length)
    assert(math.abs(row.getAs[Double]("share_detail1") - ed1.toDouble / tot) < 1e-4)
    assert(math.abs(row.getAs[Double]("share_approx2") - ea2.toDouble / tot) < 1e-4)
    val shares = row.getAs[Double]("share_detail1") +
      row.getAs[Double]("share_detail2") + row.getAs[Double]("share_approx2")
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("win_adx: matches the driver recursion replay") {
    val bars = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.maxBy(_._2)._3, g.map(_._3).max, g.map(_._3).min) }
      .toArray
    var strq = (bars(0)._2 - bars(0)._3) * 1000L
    var spq = 0L; var smq = 0L; var adxq = 0L; var nab = 0L
    for (t <- 2 to bars.length) {
      val (pc, hp, lp) = bars(t - 2)
      val (_, h, l) = bars(t - 1)
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      val pdm = if (h - hp > lp - l && h - hp > 0) h - hp else 0L
      val mdm = if (lp - l > h - hp && lp - l > 0) lp - l else 0L
      strq = math.floor((1.0 / 10 * tr + 9.0 / 10 * (strq / 1e3)) * 1e3 + 0.5).toLong
      spq = math.floor((1.0 / 10 * pdm + 9.0 / 10 * (spq / 1e3)) * 1e3 + 0.5).toLong
      smq = math.floor((1.0 / 10 * mdm + 9.0 / 10 * (smq / 1e3)) * 1e3 + 0.5).toLong
      val dxq = if (spq + smq == 0L) 0L
        else math.floor(math.abs(spq - smq).toDouble / (spq + smq) * 100 * 1e6 + 0.5).toLong
      adxq = math.floor((1.0 / 10 * (dxq / 1e6) + 9.0 / 10 * (adxq / 1e6)) * 1e6 + 0.5).toLong
      if (adxq > 25000000L) nab += 1
    }
    val row = queries.Extras252.winAdx(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == bars.length)
    assert(row.getAs[Long]("n_adx_above_25") == nab)
    assert(math.abs(row.getAs[Double]("adx") - adxq / 1e6) < 1e-3)
    assert(math.abs(row.getAs[Double]("plus_di") - 100.0 * spq / strq) < 1e-3)
  }

  test("stat_peto_odds: matches a plain-Scala stratified replay") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sf), org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("c_nationkey AS nk", "l_discount > 0.05 AS e",
        "l_returnflag = 'R' AS r")
      .collect().map(x => (x.getInt(0), x.getBoolean(1), x.getBoolean(2)))
    var soe = 0L; var sv = 0L; var k = 0
    for ((_, g) <- rows.groupBy(_._1)) {
      val nn = g.length.toLong
      val n1 = g.count(_._2).toLong
      val m1 = g.count(_._3).toLong
      val a = g.count(x => x._2 && x._3).toLong
      if (n1 > 0 && n1 < nn && m1 > 0 && m1 < nn) {
        k += 1
        soe += math.floor((a - n1.toDouble * m1 / nn) * 1e9 + 0.5).toLong
        sv += math.floor(n1.toDouble * (nn - n1) * m1 * (nn - m1) /
          (nn.toDouble * nn * (nn - 1)) * 1e9 + 0.5).toLong
      }
    }
    val row = queries.Extras252.statPetoOdds(spark, sf).collect().head
    assert(row.getAs[Long]("n_strata") == k)
    assert(math.abs(row.getAs[Double]("peto_lnor") - soe.toDouble / sv) < 1e-5)
    assert(math.abs(row.getAs[Double]("chi2") -
      (soe / 1e9) * (soe / 1e9) / (sv / 1e9)) < 1e-3)
  }

  test("stat_chauvenet: matches a plain-Scala criterion replay") {
    def bigPhi(z: Double): Double = {
      val phi = math.exp(-(z * z) / 2) / math.sqrt(2 * math.Pi)
      def poly(t: Double): Double =
        t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
          t * (-1.821255978 + t * 1.330274429))))
      if (z >= 0) 1 - phi * poly(1 / (1 + 0.2316419 * z))
      else phi * poly(1 / (1 - 0.2316419 * z))
    }
    val vs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(_.getLong(0))
    val n = vs.length
    val mu = vs.map(BigInt(_)).sum.toDouble / n
    val svv = vs.map(x => BigInt(x) * x).sum.toDouble
    val sv = vs.map(BigInt(_)).sum.toDouble
    val sig = math.sqrt((n * svv - sv * sv) / (n.toDouble * (n - 1)))
    val rejected = vs.filter { v =>
      val az = math.abs((v - mu) / sig)
      math.floor(n * 2 * (1 - bigPhi(az)) * 1e6 + 0.5) < 500000
    }
    val row = queries.Extras252.statChauvenet(spark, sf).collect().head
    assert(row.getAs[Long]("n_obs") == n)
    assert(row.getAs[Long]("n_rejected") == rejected.length)
    if (rejected.nonEmpty) {
      val minZ = rejected.map(v => math.abs((v - mu) / sig)).min
      assert(math.abs(row.getAs[Double]("min_rejected_absz") - minZ) < 1e-3)
    }
  }
}
