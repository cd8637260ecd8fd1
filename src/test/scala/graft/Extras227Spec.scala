package graft

/** Wave-127 properties: forecast metrics vs a sequential replay,
  * Cp/Cpk vs exact moments, Cohen's h vs direct arithmetic, Mood's
  * median χ² vs a counted table — at sf0.001.
  */
class Extras227Spec extends SparkSpec {

  private def monthly(): Array[Long] =
    Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  test("time_forecast_accuracy: matches the sequential seasonal-naive replay") {
    val v = monthly()
    val idx = (12 until v.length)
    val m = idx.length
    var sae = BigInt(0); var sv = BigInt(0); var se = BigInt(0)
    var smq = 0L; var u2n = 0L; var u2d = 0L
    idx.foreach { t =>
      val f = v(t - 12); val vp = v(t - 1); val e = v(t) - f
      sae += e.abs; sv += v(t); se += e
      smq += math.floor(2.0 * math.abs(e) / (v(t).toDouble + f) * 1e9 + 0.5).toLong
      val rn = (f.toDouble - v(t)) / vp
      val rd = (v(t).toDouble - vp) / vp
      u2n += math.floor(rn * rn * 1e9 + 0.5).toLong
      u2d += math.floor(rd * rd * 1e9 + 0.5).toLong
    }
    val row = queries.Extras227.timeForecastAccuracy(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - smq.toDouble / m / 1e9) < 1e-6, "sMAPE")
    assert(math.abs(row.getDouble(2) - sae.toDouble / sv.toDouble) < 1e-6, "WAPE")
    assert(math.abs(row.getDouble(3) - math.sqrt(u2n.toDouble / u2d)) < 1e-5, "U2")
    assert(math.abs(row.getDouble(4) - m * se.toDouble / sae.toDouble) < 1e-3, "tracking signal")
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 2, "sMAPE support")
  }

  test("stat_process_capability: matches exact moments; Cpk <= Cp") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) => (d, xs.map(x => BigInt(x._2)).sum.toLong) }
    val y94 = days.filter(_._1.startsWith("1995")).map(_._2)
    val m0 = y94.map(BigInt(_)).sum.toDouble / y94.length
    val n = days.length
    val s1 = days.map(x => BigInt(x._2)).sum; val s2 = days.map(x => BigInt(x._2) * x._2).sum
    val mu = s1.toDouble / n
    val sd = math.sqrt((n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / (n.toDouble * (n - 1)))
    val beyond = days.count(x => x._2 < 0.7 * m0 || x._2 > 1.3 * m0)
    val row = queries.Extras227.statProcessCapability(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - 0.6 * m0 / (6 * sd)) < 1e-3, "Cp")
    assert(math.abs(row.getDouble(2) - math.min(1.3 * m0 - mu, mu - 0.7 * m0) / (3 * sd)) < 1e-3, "Cpk")
    assert(math.abs(row.getDouble(3) - beyond.toDouble / n) < 1e-6)
    assert(row.getDouble(2) <= row.getDouble(1) + 1e-9, "Cpk <= Cp always")
    assert(math.abs(row.getDouble(4) - mu / m0) < 1e-5)
  }

  test("stat_cohen_h: matches direct arithmetic; band consistent") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount >= 0.05 AS grp", "l_returnflag = 'R' AS r")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val (g1, g2) = g.partition(_._1)
    val p1 = g1.count(_._2).toDouble / g1.length
    val p2 = g2.count(_._2).toDouble / g2.length
    val h = 2 * math.asin(math.sqrt(p1)) - 2 * math.asin(math.sqrt(p2))
    val row = queries.Extras227.statCohenH(spark, sf).collect().head
    assert(row.getLong(0) == g1.length.toLong && row.getLong(1) == g2.length.toLong)
    assert(math.abs(row.getDouble(2) - p1) < 1e-6 && math.abs(row.getDouble(3) - p2) < 1e-6)
    assert(math.abs(row.getDouble(4) - h) < 1e-5, s"h ${row.getDouble(4)} vs $h")
    val z = h / math.sqrt(1.0 / g1.length + 1.0 / g2.length)
    assert(math.abs(row.getDouble(5) - z) < 1e-3)
    val mag = if (math.abs(h) < 0.2) "negligible" else if (math.abs(h) < 0.5) "small"
    else if (math.abs(h) < 0.8) "medium" else "large"
    assert(row.getString(6) == mag)
  }

  test("stat_mood_median_test: matches the counted 5x2 table") {
    val o = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sorted = o.sortBy(x => (x._3, x._2))
    val n = o.length
    val gm = sorted(math.ceil(n / 2.0).toInt - 1)._3
    val byG = o.groupBy(_._1)
    val aa = o.count(_._3 > gm).toLong
    var chi = 0.0
    byG.values.foreach { xs =>
      val ng = xs.length.toDouble; val ag = xs.count(_._3 > gm).toDouble
      val ea = ng * aa / n; val eb = ng * (n - aa) / n
      chi += math.floor(((ag - ea) * (ag - ea) / ea
        + ((ng - ag) - eb) * ((ng - ag) - eb) / eb) * 1e9 + 0.5) / 1e9
    }
    val row = queries.Extras227.statMoodMedianTest(spark, sf).collect().head
    assert(row.getLong(0) == byG.size.toLong)
    assert(math.abs(row.getDouble(1) - gm / 100.0) < 1e-6)
    assert(row.getLong(2) == aa)
    assert(math.abs(row.getDouble(3) - chi) < 1e-3, s"chi2 ${row.getDouble(3)} vs $chi")
    assert(row.getString(4) == (if (chi > 9.487729036781154) "reject_equal_medians" else "consistent"))
    assert(aa <= n / 2 + 1, "above-median count near half")
  }
}
