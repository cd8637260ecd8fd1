package graft

/** Wave-119 properties: ridge path vs the normal equations, logistic
  * Newton replay + sign check, adstock recursion replay, and the
  * WLS≡order-level-OLS identity — at sf0.001.
  */
class Extras219Spec extends SparkSpec {

  private def perCustomer(): Array[(Long, Long, Long)] = {
    val o = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => (k, (g.length.toLong, g.map(_._2).sum)) }
    Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS x")
      .collect().map { r =>
        val (w, tot) = o.getOrElse(r.getLong(0), (0L, 0L))
        (r.getLong(1), w, tot)
      }
  }

  test("stat_ridge_regression: lambda=0 solves the normal equations; norm shrinks") {
    val per = perCustomer()
    def std(v: Array[Double]): Array[Double] = {
      val m = v.sum / v.length
      val d = math.sqrt(v.map(x => (x - m) * (x - m)).sum / v.length)
      v.map(x => (x - m) / d)
    }
    val z1 = std(per.map(_._1.toDouble))
    val z2 = std(per.map(_._2.toDouble))
    val zy = std(per.map(_._3.toDouble))
    val n = per.length
    val r12 = z1.zip(z2).map { case (a, b) => a * b }.sum / n
    val r1y = z1.zip(zy).map { case (a, b) => a * b }.sum / n
    val r2y = z2.zip(zy).map { case (a, b) => a * b }.sum / n
    val rows = queries.Extras219.statRidgeRegression(spark, sf).collect()
      .sortBy(_.getDouble(1))
    assert(rows.length == 3 && rows.head.getDouble(1) == 0.0)
    val b1 = (r1y - r12 * r2y) / (1 - r12 * r12)
    val b2 = (r2y - r12 * r1y) / (1 - r12 * r12)
    assert(math.abs(rows.head.getDouble(3) - b1) < 1e-4, "OLS beta1 at lambda=0")
    assert(math.abs(rows.head.getDouble(4) - b2) < 1e-4, "OLS beta2 at lambda=0")
    val norms = rows.map(r => math.sqrt(r.getDouble(3) * r.getDouble(3)
      + r.getDouble(4) * r.getDouble(4)))
    assert(norms(0) >= norms(1) - 1e-9 && norms(1) >= norms(2) - 1e-9,
      "coefficient norm shrinks along the ridge path")
  }

  test("stat_logistic_newton: matches the binned Newton replay; slope sign sane") {
    val ys = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv",
        "o_orderpriority = '1-URGENT' AS u")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n = ys.length
    val mu = ys.map(v => BigInt(v._1)).sum.toDouble / n
    val sd = math.sqrt(ys.map(v => BigInt(v._1) * v._1).sum.toDouble / n - mu * mu)
    val bins = ys.groupBy { case (cv, _) =>
      math.min(math.max(math.floor(((cv - mu) / sd + 3) / 0.12).toLong, 0L), 49L)
    }.map { case (b, g) =>
      (-3.0 + 0.12 * b + 0.06, g.length.toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val pbar = bins.map(_._3).sum.toDouble / bins.map(_._2).sum
    var b0 = math.log(pbar / (1 - pbar)); var b1 = 0.0
    for (_ <- 1 to 2) {
      var g0 = BigInt(0); var g1 = BigInt(0)
      var h00 = BigInt(0); var h01 = BigInt(0); var h11 = BigInt(0)
      bins.foreach { case (x, nb, ub) =>
        val p = 1.0 / (1.0 + math.exp(-b0 - b1 * x))
        val w = nb * p * (1 - p)
        def q(v: Double) = BigInt(math.floor(v * 1e9 + 0.5).toLong)
        g0 += q(ub - nb * p); g1 += q((ub - nb * p) * x)
        h00 += q(w); h01 += q(w * x); h11 += q(w * x * x)
      }
      val (gd0, gd1) = (g0.toDouble / 1e9, g1.toDouble / 1e9)
      val (a, bq, c) = (h00.toDouble / 1e9, h01.toDouble / 1e9, h11.toDouble / 1e9)
      val det = a * c - bq * bq
      b0 += (c * gd0 - bq * gd1) / det
      b1 += (-bq * gd0 + a * gd1) / det
    }
    val row = queries.Extras219.statLogisticNewton(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - pbar) < 1e-6)
    assert(math.abs(row.getDouble(2) - b0) < 1e-5, s"beta0 ${row.getDouble(2)} vs $b0")
    assert(math.abs(row.getDouble(3) - b1) < 1e-5, s"beta1 ${row.getDouble(3)} vs $b1")
    // sign agreement with the raw point-biserial direction
    val corrSign = math.signum(
      ys.map(v => (if (v._2) 1.0 else 0.0) * ((v._1 - mu) / sd)).sum)
    if (math.abs(row.getDouble(3)) > 1e-4)
      assert(math.signum(row.getDouble(3)) == corrSign, "slope sign matches correlation")
  }

  test("analytics_adstock_grid: matches the recursion replay; corr in [-1,1]") {
    val rows = queries.Extras219.analyticsAdstockGrid(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.2, 0.5, 0.8))
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    // independent replay for lambda = 0.5 (plain double arithmetic)
    val hours = Tables.events(spark, sf)
      .selectExpr("date_trunc('hour', ts) AS m", "event_type",
        "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS vc")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
        (g.count(_._2 == "view").toLong,
          g.filter(_._2 == "purchase").map(_._3).sum)
      }
    var a = 0.0
    val pts = hours.map { case (x, y) => a = x + 0.5 * a; (a, y.toDouble) }
    val nn = pts.length
    val ma = pts.map(_._1).sum / nn; val my = pts.map(_._2).sum / nn
    val c = pts.map { case (av, yv) => (av - ma) * (yv - my) }.sum /
      math.sqrt(pts.map(p => (p._1 - ma) * (p._1 - ma)).sum *
        pts.map(p => (p._2 - my) * (p._2 - my)).sum)
    assert(math.abs(rows(1).getDouble(2) - c) < 1e-4, "lambda=0.5 correlation")
    assert(rows.head.getLong(1) == nn.toLong)
  }

  test("stat_wls_inverse_variance: equals the order-level OLS slope exactly") {
    val per = perCustomer().filter(_._2 > 0)
    // order-level OLS: each order contributes (x_c, its own value) — but the
    // weighted mean regression is equivalent when y is the customer MEAN,
    // i.e. order-level regression of the mean-imputed response
    val n = per.map(_._2).sum.toDouble
    val sx = per.map(p => BigInt(p._2) * p._1).sum.toDouble
    val sy = per.map(p => BigInt(p._3)).sum.toDouble
    val sxy = per.map(p => BigInt(p._3) * p._1).sum.toDouble
    val sxx = per.map(p => BigInt(p._2) * p._1 * p._1).sum.toDouble
    val betaW = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = queries.Extras219.statWlsInverseVariance(spark, sf).collect().head
    assert(row.getLong(0) == per.length.toLong)
    assert(math.abs(row.getDouble(1) - betaW) / math.abs(betaW) < 1e-6,
      s"WLS ${row.getDouble(1)} vs order-level $betaW")
    // unweighted per-customer-mean OLS replay
    val m = per.length.toDouble
    val ux = per.map(p => BigInt(p._1)).sum.toDouble
    val uy2 = per.map(p => p._3.toDouble / p._2).sum
    val uxy2 = per.map(p => p._3.toDouble / p._2 * p._1).sum
    val uxx = per.map(p => BigInt(p._1) * p._1).sum.toDouble
    val betaO = (m * uxy2 - ux * uy2) / (m * uxx - ux * ux)
    assert(math.abs(row.getDouble(2) - betaO) / math.abs(betaO) < 1e-3,
      "unweighted per-customer OLS")
    assert(row.getDouble(1) != row.getDouble(2), "weights change the slope")
  }
}
