package graft

/** Wave-141 properties at sf0.001: Viterbi vs an exact integer DP
  * replay, absorption times vs the fixed-point equation, Rényi
  * monotonicity + replay, probit vs the score-zero condition.
  */
class Extras241Spec extends SparkSpec {

  test("time_viterbi_hmm: matches an exact integer DP replay") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
    val bits = days.sliding(2).map(p => p(1) > p(0)).toArray
    def lq(p: Double): Long = math.floor(math.log(p) * 1e12).toLong
    var s0 = lq(0.5) + (if (bits(0)) lq(0.4) else lq(0.6))
    var s1 = lq(0.5) + (if (bits(0)) lq(0.6) else lq(0.4))
    var c1 = if (s1 > s0) 1L else 0L
    bits.drop(1).foreach { b =>
      val n0 = math.max(s0 + lq(0.9), s1 + lq(0.1)) + (if (b) lq(0.4) else lq(0.6))
      val n1 = math.max(s0 + lq(0.1), s1 + lq(0.9)) + (if (b) lq(0.6) else lq(0.4))
      s0 = n0; s1 = n1; if (s1 > s0) c1 += 1
    }
    val row = queries.Extras241.timeViterbiHmm(spark, sf).collect().head
    assert(row.getLong(0) == bits.length.toLong)
    assert(math.abs(row.getDouble(1) - math.max(s0, s1) / 1e12) < 1e-6) // query rounds to 6dp
    assert(row.getLong(2) == (if (s1 > s0) 1L else 0L))
    assert(row.getLong(3) == c1, s"prefix-bull count ${row.getLong(3)} vs $c1")
    // log-score of an L-step binary sequence is bounded by L*ln(0.9*0.6)
    assert(row.getDouble(1) < 0)
  }

  test("analytics_absorbing_time: satisfies t = 1 + Q t; all times >= 1") {
    val row = queries.Extras241.analyticsAbsorbingTime(spark, sf).collect().head
    val states = Seq("click", "error", "signup", "view")
    val t = Map("click" -> row.getDouble(1), "error" -> row.getDouble(2),
      "signup" -> row.getDouble(3), "view" -> row.getDouble(4))
    t.values.foreach(v => assert(v >= 1.0, "at least one step to absorb"))
    // rebuild Q and check the fixed point within quantization tolerance
    val trans = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))).filter(_._1 != "purchase")
      }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    states.foreach { c =>
      val out = states.map(n => trans.getOrElse((c, n), 0L)).sum +
        trans.getOrElse((c, "purchase"), 0L)
      val rhs = 1.0 + states.map(n =>
        trans.getOrElse((c, n), 0L).toDouble / math.max(out, 1L) * t(n)).sum
      assert(math.abs(t(c) - rhs) < 1e-3, s"fixed point at $c: ${t(c)} vs $rhs")
    }
  }

  test("text_renyi_entropy: profile is monotone decreasing in alpha") {
    val rows = queries.Extras241.textRenyiEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size == 5)
    // Renyi entropy is non-increasing in alpha
    assert(rows("a0_richness") >= rows("a05_sqrt") - 1e-6)
    assert(rows("a05_sqrt") >= rows("a1_shannon") - 1e-6)
    assert(rows("a1_shannon") >= rows("a2_collision") - 1e-6)
    assert(rows("a2_collision") >= rows("ainf_min") - 1e-6)
    // Shannon replay
    val toks = Tables.documents(spark, sf)
      .selectExpr("explode(split(lower(text), ' ')) AS w").filter("length(w) > 0")
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).map(_._2.length.toLong)
    val n = toks.length.toDouble
    val clnc = counts.filter(_ > 1)
      .map(c => math.floor(c * math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
    val shannon = math.log(n) - clnc / 1e6 / n
    assert(math.abs(rows("a1_shannon") - shannon) < 1e-4, "Shannon replay")
    assert(math.abs(rows("a0_richness") - math.log(counts.size.toDouble)) < 1e-6)
  }

  test("stat_probit_regression: score is ~0 at the fitted point") {
    val row = queries.Extras241.statProbitRegression(spark, sf).collect().head
    val (b0, b1) = (row.getDouble(1), row.getDouble(2))
    def phi(z: Double): Double = math.exp(-(z * z) / 2) / math.sqrt(2 * math.Pi)
    def bigPhi(z: Double): Double = {
      val p = 0.2316419
      def poly(t: Double): Double =
        t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      if (z >= 0) 1 - phi(z) * poly(1 / (1 + p * z)) else phi(z) * poly(1 / (1 - p * z))
    }
    val g = Tables.lineitem(spark, sf)
      .selectExpr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS xq",
        "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .groupBy(_._1).map { case (x, ys) => (x, ys.length.toLong, ys.count(_._2).toLong) }
    val sc1 = g.map { case (x, n, o) =>
      val mu = bigPhi(b0 + b1 * (x / 100.0))
      (o - n * mu) * phi(b0 + b1 * (x / 100.0)) / (mu * (1 - mu))
    }.sum
    assert(math.abs(sc1) / g.map(_._2).sum < 1e-3, s"score $sc1")
    assert(row.getLong(0) == g.map(_._2).sum)
    assert(math.abs(row.getDouble(3) - bigPhi(b0)) < 1e-5, "p at zero discount")
  }
}
