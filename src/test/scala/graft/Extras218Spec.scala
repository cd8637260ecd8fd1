package graft

/** Wave-118 properties: Erlang recursion vs the factorial-series form,
  * James–Stein shrinkage bounds + dominance direction, negative-binomial
  * moment identities, and Cornish–Fisher vs the exact empirical tail —
  * at sf0.001.
  */
class Extras218Spec extends SparkSpec {

  test("analytics_erlang_c: recursion matches the a^k/k! series; monotone in c") {
    val rows = queries.Extras218.analyticsErlangC(spark, sf).collect()
    assert(rows.length == 3)
    val a = rows.head.getDouble(1)
    def erlangCSeries(c: Long): Double = {
      // direct series in log space (safe at this magnitude)
      val terms = (0L until c).map(k =>
        (0 until k.toInt).map(i => math.log(a) - math.log(i + 1.0)).sum)
      val top = (0 until c.toInt).map(i => math.log(a) - math.log(i + 1.0)).sum +
        math.log(c / (c - a))
      val mx = math.max(terms.max, top)
      math.exp(top - mx) / (terms.map(t => math.exp(t - mx)).sum + math.exp(top - mx))
    }
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(c > a, "grid stays above the offered load")
      val pw = r.getDouble(2)
      assert(math.abs(pw - erlangCSeries(c)) < 1e-6, s"Erlang C at c=$c")
      assert(pw > 0 && pw < 1)
      assert(r.getDouble(3) > 0, "positive ASA")
    }
    assert(rows(0).getDouble(2) > rows(1).getDouble(2) &&
      rows(1).getDouble(2) > rows(2).getDouble(2), "P(wait) decreases with agents")
  }

  test("stat_james_stein: shrunk means between raw and grand; lambda in [0,1]") {
    val rows = queries.Extras218.statJamesStein(spark, sf).collect()
    assert(rows.length == 25)
    val lam = rows.head.getDouble(4)
    assert(lam >= 0 && lam <= 1, s"lambda $lam")
    assert(rows.forall(r => math.abs(r.getDouble(4) - lam) < 1e-12), "common factor")
    // weighted grand mean from raw means and counts
    val grand = rows.map(r => r.getDouble(2) * r.getLong(1)).sum /
      rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val raw = r.getDouble(2); val shrunk = r.getDouble(3)
      val lo = math.min(raw, grand) - 2e-3
      val hi = math.max(raw, grand) + 2e-3
      assert(shrunk >= lo && shrunk <= hi, s"${r.getString(0)}: $shrunk not in [$lo,$hi]")
      assert(math.abs((shrunk - grand) - lam * (raw - grand)) < 5e-3,
        "linear shrinkage toward the grand mean")
    }
  }

  test("stat_negbin_fit_mom: matches the moment replay; fitted zero mass sane") {
    val counts = {
      val orders = Tables.orders(spark, sf).select("o_custkey").collect()
        .map(_.getLong(0)).groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
      Tables.customer(spark, sf).select("c_custkey").collect()
        .map(r => orders.getOrElse(r.getLong(0), 0L))
    }
    val n = counts.length.toDouble
    val m = counts.sum / n
    val v = (n * counts.map(c => c.toDouble * c).sum - counts.sum.toDouble * counts.sum) /
      (n * (n - 1))
    val row = queries.Extras218.statNegbinFitMom(spark, sf).collect().head
    assert(row.getLong(0) == counts.length.toLong)
    assert(math.abs(row.getDouble(1) - m) < 1e-5)
    assert(math.abs(row.getDouble(2) - v) < 1e-4)
    val r0 = m * m / (v - m)
    assert(math.abs(row.getDouble(3) - r0) < 1e-3)
    assert(math.abs(row.getDouble(4) - m / v) < 1e-6)
    assert(v > m, "order counts are overdispersed on this fixture")
    val p0 = math.pow(r0 / (r0 + m), r0)
    assert(math.abs(row.getDouble(5) - p0) < 1e-4)
    val emp0 = counts.count(_ == 0L).toDouble / n
    assert(math.abs(row.getDouble(6) - emp0) < 1e-6)
    assert(row.getDouble(5) >= 0 && row.getDouble(5) <= 1)
  }

  test("stat_cornish_fisher_var: empirical quantiles exact; CF ordering holds") {
    val xs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2)).map(_._1)
    val n = xs.length
    val e95 = xs(math.ceil(0.95 * n).toInt - 1) / 100.0
    val e99 = xs(math.ceil(0.99 * n).toInt - 1) / 100.0
    val row = queries.Extras218.statCornishFisherVar(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(4) - e95) < 1e-6, "exact empirical 95%")
    assert(math.abs(row.getDouble(6) - e99) < 1e-6, "exact empirical 99%")
    assert(row.getDouble(5) > row.getDouble(3), "CF 99% above CF 95%")
    // CF with positive skew pushes the upper tail out beyond the normal quantile
    val mu = xs.map(BigInt(_)).sum.toDouble / n / 100
    val sd = math.sqrt(xs.map(x => BigInt(x) * x).sum.toDouble / n / 1e4 - mu * mu)
    if (row.getDouble(1) > 0.1)
      assert(row.getDouble(3) > mu + 1.6448536269514722 * sd - 1e-9,
        "positive skew widens the upper tail")
  }
}
