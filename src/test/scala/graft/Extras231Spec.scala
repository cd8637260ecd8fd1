package graft

/** Wave-131 properties: Erlang-B vs the scalar recursion, Holm vs a
  * sequential step-down, Gompertz vs a quantized OLS replay, ES vs a
  * sorted-tail replay — at sf0.001.
  */
class Extras231Spec extends SparkSpec {

  test("analytics_erlang_b: matches the recursion; blocking decreasing in k") {
    val (n, h) = {
      val r = Tables.events(spark, sf)
        .selectExpr("count(*) AS n", "count(DISTINCT date_trunc('hour', ts)) AS h")
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    val a = n.toDouble / h
    val bs = new Array[Double](33)
    bs(0) = 1.0
    for (k <- 1 to 32) bs(k) = a * bs(k - 1) / (k + a * bs(k - 1))
    val row = queries.Extras231.analyticsErlangB(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - a) < 1e-3)
    assert(math.abs(row.getDouble(2) - bs(8)) < 1e-6)
    assert(math.abs(row.getDouble(5) - bs(32)) < 1e-6)
    assert(row.getDouble(2) >= row.getDouble(3) && row.getDouble(3) >= row.getDouble(4)
      && row.getDouble(4) >= row.getDouble(5), "blocking monotone decreasing in servers")
    val kStar = (1 to 32).find(k => bs(k) < 0.01).getOrElse(33).toLong
    assert(row.getLong(6) == kStar)
  }

  test("stat_holm_bonferroni: matches a sequential step-down; holm >= bonferroni") {
    val vs = Tables.part(spark, sf)
      .selectExpr("p_brand", "CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    val byB = vs.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2) }
    val tn = vs.length.toLong
    val ts1 = vs.map(_._2).sum; val ts2 = vs.map(x => x._2 * x._2).sum
    def qnorm(p: Double): Double = { // Acklam (same coefficients as QNorm.sql)
      val (ql, qu) = (math.sqrt(-2 * math.log(p)), math.sqrt(-2 * math.log(1 - p)))
      val r = (p - 0.5) * (p - 0.5); val q = p - 0.5
      if (p < 0.02425)
        (((((-7.784894002430293e-03 * ql - 3.223964580411365e-01) * ql - 2.400758277161838e+00) * ql - 2.549732539343734e+00) * ql + 4.374664141464968e+00) * ql + 2.938163982698783e+00) /
          ((((7.784695709041462e-03 * ql + 3.224671290700398e-01) * ql + 2.445134137142996e+00) * ql + 3.754408661907416e+00) * ql + 1)
      else if (p > 1 - 0.02425)
        -((((((-7.784894002430293e-03 * qu - 3.223964580411365e-01) * qu - 2.400758277161838e+00) * qu - 2.549732539343734e+00) * qu + 4.374664141464968e+00) * qu + 2.938163982698783e+00) /
          ((((7.784695709041462e-03 * qu + 3.224671290700398e-01) * qu + 2.445134137142996e+00) * qu + 3.754408661907416e+00) * qu + 1))
      else
        (((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r - 2.759285104469687e+02) * r + 1.383577518672690e+02) * r - 3.066479806614716e+01) * r + 2.506628277459239e+00) * q /
          (((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r - 1.556989798598866e+02) * r + 6.680131188771972e+01) * r - 1.328068155288572e+01) * r + 1)
    }
    val zs = byB.toSeq.map { case (b, xs) =>
      val n = xs.length.toLong
      val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      val m1 = s1.toDouble / n; val m2 = (ts1 - s1).toDouble / (tn - n)
      val v1 = (n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / (n.toDouble * (n - 1))
      val v2 = ((tn - n).toDouble * (ts2 - s2).toDouble - (ts1 - s1).toDouble * (ts1 - s1).toDouble) /
        ((tn - n).toDouble * ((tn - n) - 1))
      (b, math.abs((m1 - m2) / math.sqrt(v1 / n + v2 / (tn - n))))
    }.sortBy(x => (-x._2, x._1))
    val m = zs.length
    val unadj = zs.count(_._2 >= qnorm(0.975))
    val bonf = zs.count(_._2 >= qnorm(1 - 0.025 / m))
    var holm = 0
    var going = true
    zs.zipWithIndex.foreach { case ((_, az), i) =>
      if (going && az >= qnorm(1 - 0.025 / (m - i))) holm += 1 else going = false
    }
    val row = queries.Extras231.statHolmBonferroni(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(row.getLong(1) == unadj.toLong, "unadjusted")
    assert(row.getLong(2) == bonf.toLong, "bonferroni")
    assert(row.getLong(3) == holm.toLong, s"holm ${row.getLong(3)} vs $holm")
    assert(row.getLong(3) >= row.getLong(2), "Holm rejects at least as much as Bonferroni")
    assert(row.getLong(1) >= row.getLong(3), "unadjusted rejects the most")
    assert(math.abs(row.getDouble(4) - zs.head._2) < 1e-3)
  }

  test("analytics_gompertz_fit: matches the quantized OLS replay") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum)
    val tv = ms.sum
    var cum = BigInt(0)
    val pts = ms.zipWithIndex.map { case (v, i) =>
      cum += v
      val y = cum.toDouble * 50 / (51 * tv.toDouble)
      ((i + 1).toLong, math.floor(math.log(-math.log(y)) * 1e9 + 0.5).toLong)
    }
    val k = pts.length
    val st = pts.map(_._1).sum; val stt = pts.map(p => p._1 * p._1).sum
    val sx = pts.map(p => BigInt(p._2)).sum
    val stx = pts.map(p => BigInt(p._1) * p._2).sum
    val slope = (k.toDouble * stx.toDouble - st.toDouble * sx.toDouble) /
      (k.toDouble * stt - st.toDouble * st) / 1e9
    val icept = sx.toDouble / 1e9 / k - slope * st / k
    val row = queries.Extras231.analyticsGompertzFit(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(math.abs(row.getDouble(1) - (-slope)) < 1e-5, "c rate")
    assert(math.abs(row.getDouble(2) - math.exp(icept)) < 1e-3 * math.exp(icept), "b shape")
    assert(math.abs(row.getDouble(3) - icept / (-slope)) < 0.1, "inflection month")
    assert(row.getDouble(1) > 0, "growth rate positive for a cumulative curve")
    assert(row.getDouble(3) > 0 && row.getDouble(3) < 2 * k, "inflection inside a sane horizon")
  }

  test("win_expected_shortfall: matches the sorted-tail replay; ES <= VaR") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val rets = days.sliding(2).map { case Seq(a, b) =>
      math.floor((b.toDouble - a) / a * 1e9 + 0.5).toLong
    }.toSeq.sorted
    val n = rets.length
    val k = math.ceil(0.05 * n).toInt
    val tail = rets.take(k)
    val varQ = tail.max; val es = tail.sum.toDouble / k
    val row = queries.Extras231.winExpectedShortfall(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == k.toLong)
    assert(math.abs(row.getDouble(2) - varQ / 1e9) < 1e-6, "VaR")
    assert(math.abs(row.getDouble(3) - es / 1e9) < 1e-6, "ES")
    assert(row.getDouble(3) <= row.getDouble(2) + 1e-12, "ES at least as severe as VaR")
    assert(row.getDouble(4) >= 1, "ES/VaR ratio >= 1 for a loss tail")
  }
}
