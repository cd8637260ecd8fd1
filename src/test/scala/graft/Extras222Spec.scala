package graft

/** Wave-122 properties: Ledoit–Wolf identities on the replayed Gram,
  * Western Electric rules vs a sequential scan, PSIS k̂ vs the PWM
  * replay, and damped Holt vs its recursion — at sf0.001.
  */
class Extras222Spec extends SparkSpec {

  test("embed_ledoit_wolf: matches the driver-side replay; lambda in [0,1]") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val n = vecs.length
    val dDim = 64
    val gram = Array.ofDim[Double](dDim, dDim)
    vecs.foreach { v =>
      var i = 0
      while (i < dDim) {
        var j = 0
        while (j < dDim) { gram(i)(j) += v(i).toDouble * v(j); j += 1 }
        i += 1
      }
    }
    val sMat = gram.map(_.map(_ / n / 1e12))
    // replicate the per-entry quantization
    var sf2 = BigInt(0); var str = 0L
    for (i <- 0 until dDim; j <- 0 until dDim) {
      sf2 += BigInt(math.floor(sMat(i)(j) * sMat(i)(j) * 1e9 + 0.5).toLong)
      if (i == j) str += math.floor(sMat(i)(j) * 1e9 + 0.5).toLong
    }
    val frob2 = sf2.toDouble / 1e9
    val mu = str.toDouble / 1e9 / dDim
    val sq4 = vecs.map { v =>
      val nq = v.map(x => x * x).sum
      BigInt(nq) * nq
    }.sum
    val beta2 = sq4.toDouble / 1e24 / n / n - frob2 / n
    val delta2 = frob2 - dDim * mu * mu
    val lam = math.min(1.0, math.max(0.0, beta2 / delta2))
    val row = queries.Extras222.embedLedoitWolf(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == 64L)
    assert(math.abs(row.getDouble(2) - mu) < 1e-6)
    assert(math.abs(row.getDouble(3) - frob2) < 1e-4, "Frobenius norm of S")
    assert(math.abs(row.getDouble(4) - delta2) < 1e-4)
    assert(math.abs(row.getDouble(5) - lam) < 1e-4, s"lambda ${row.getDouble(5)} vs $lam")
    assert(row.getDouble(5) >= 0 && row.getDouble(5) <= 1)
    assert(row.getDouble(4) > 0, "S is not already spherical")
  }

  test("time_control_rules: matches a sequential rule scan") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val n = days.length
    val s1 = days.map(BigInt(_)).sum
    val s2 = days.map(x => BigInt(x) * x).sum
    val c = s1.toDouble / n
    val sd = math.sqrt((n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) /
      (n.toDouble * (n - 1)))
    var (r1, r2, r3, r4, any) = (0L, 0L, 0L, 0L, 0L)
    for (t <- days.indices) {
      def win(k: Int) = days.slice(math.max(0, t - k + 1), t + 1)
      val f1 = days(t) > c + 3 * sd || days(t) < c - 3 * sd
      val f2 = win(3).count(_ > c + 2 * sd) >= 2 || win(3).count(_ < c - 2 * sd) >= 2
      val f3 = win(5).count(_ > c + sd) >= 4 || win(5).count(_ < c - sd) >= 4
      val f4 = win(8).count(_ > c) >= 8 || win(8).count(_ < c) >= 8
      if (f1) r1 += 1
      if (f2) r2 += 1
      if (f3) r3 += 1
      if (f4) r4 += 1
      if (f1 || f2 || f3 || f4) any += 1
    }
    val row = queries.Extras222.timeControlRules(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == r1 && row.getLong(2) == r2)
    assert(row.getLong(3) == r3 && row.getLong(4) == r4)
    assert(row.getLong(5) == any)
    assert(any <= n.toLong)
  }

  test("sample_psis_khat: matches the GPD-PWM tail replay; verdict consistent") {
    val ws = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS w",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2)).map(_._1)
    val n = ws.length
    val u = ws(math.ceil(0.8 * n).toInt - 1)
    val tail = ws.drop(math.ceil(0.8 * n).toInt).map(_ - u)
    val m = tail.length
    val b0 = tail.map(BigInt(_)).sum.toDouble / m
    val b1 = tail.zipWithIndex.map { case (y, i0) => BigInt(i0.toLong) * y }.sum.toDouble /
      (m.toDouble * (m - 1))
    val khat = 2 - b0 / (2 * b1 - b0)
    val row = queries.Extras222.samplePsisKhat(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - khat) < 1e-5, s"khat ${row.getDouble(1)} vs $khat")
    val expected = if (khat < 0.5) "reliable" else if (khat < 0.7) "usable" else "unreliable"
    assert(row.getString(3) == expected)
    assert(row.getDouble(2) > 0, "positive GPD scale")
  }

  test("time_holt_damped: matches the recursion; damped forecasts stay bounded") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    var l = ms(0).toDouble
    var b = ms(1).toDouble - ms(0)
    for (t <- 1 until ms.length) {
      val lp = l
      l = 0.3 * ms(t) + 0.7 * (lp + 0.9 * b)
      b = 0.1 * (l - lp) + 0.9 * 0.9 * b
    }
    val row = queries.Extras222.timeHoltDamped(spark, sf).collect().head
    assert(row.getLong(0) == ms.length.toLong)
    assert(math.abs(row.getDouble(1) - l / 100) < 1e-2)
    assert(math.abs(row.getDouble(2) - b / 100) < 1e-3)
    assert(math.abs(row.getDouble(3) - (l + 0.9 * b) / 100) < 1e-2)
    assert(math.abs(row.getDouble(4) - (l + (0.9 + 0.81 + 0.729) * b) / 100) < 1e-2)
    // damping: the 3-step-ahead increment is strictly less than 3x the 1-step
    val inc1 = row.getDouble(3) - row.getDouble(1)
    val inc3 = row.getDouble(4) - row.getDouble(1)
    if (math.abs(inc1) > 1e-6)
      assert(math.abs(inc3) < 3 * math.abs(inc1), "damped trend grows sub-linearly")
  }
}
