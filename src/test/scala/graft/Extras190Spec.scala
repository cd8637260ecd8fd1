package graft

/** Wave-90 properties: Fisher exact, Welch ANOVA, Mood scale, and
  * Wald–Wolfowitz runs replayed against brute force at sf0.001.
  */
class Extras190Spec extends SparkSpec {

  test("stat_fisher_exact: quantized hypergeometric replay; 0 <= p <= 1") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0) == "1-URGENT", r.getString(1) == "F"))
    val n = rows.length.toLong
    val a = rows.count(p => p._1 && p._2).toLong
    val r1 = rows.count(_._1).toLong
    val c1 = rows.count(_._2).toLong
    // exact replica of the quantized ln-factorial pipeline
    val lnq = (0L to n).map(i => if (i < 2) 0L
      else math.floor(math.log(i.toDouble) * 1e6 + 0.5).toLong)
    val lf = lnq.scanLeft(0L)(_ + _).drop(1) // inclusive prefix; lf(i) at index i
    val lnc = lf(r1.toInt) + lf((n - r1).toInt) + lf(c1.toInt) + lf((n - c1).toInt) - lf(n.toInt)
    val kMin = math.max(0L, r1 + c1 - n); val kMax = math.min(r1, c1)
    def lnpq(k: Long): Long = lnc - (lf(k.toInt) + lf((r1 - k).toInt)
      + lf((c1 - k).toInt) + lf((n - r1 - c1 + k).toInt))
    val obs = lnpq(a)
    val pq = (kMin to kMax).filter(k => lnpq(k) <= obs)
      .map(k => math.floor(math.exp(lnpq(k) / 1e6) * 1e9 + 0.5).toLong).sum
    val row = queries.Extras190.statFisherExact(spark, sf).collect().head
    assert(row.getLong(0) == a && row.getLong(1) == r1 && row.getLong(2) == c1 && row.getLong(3) == n)
    val p = row.getDouble(5)
    assert(math.abs(p - pq / 1e9) < 1e-6)
    assert(p >= 0 && p <= 1)
    // the observed table is always in its own two-sided tail
    assert(p * 1e9 >= math.floor(math.exp(obs / 1e6) * 1e9 + 0.5) - 1)
  }

  test("stat_welch_anova: closed-form replay; F >= 0, df2 in (min n_i - 1, n)") {
    val xs = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0).substring(0, 1).toInt,
        math.round(r.getDouble(1) * 100))) // exact cents
    val grps = xs.groupBy(_._1).toSeq.sortBy(_._1)
    val st = grps.map { case (_, g) =>
      val ng = g.size.toLong
      val sg = g.map(x => BigInt(x._2)).sum
      val qg = g.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val mu = sg.toDouble / ng / 100
      val v = (ng.toDouble * qg.toDouble - sg.toDouble * sg.toDouble) / (ng.toDouble * (ng - 1)) / 1e4
      (ng, mu, v)
    }
    val wq = st.map { case (ng, mu, v) => math.floor(ng.toDouble / v * 1e12 + 0.5).toLong }
    val wmq = st.map { case (ng, mu, v) => math.floor(ng.toDouble / v * mu * 1e9 + 0.5).toLong }
    val grand = wmq.sum.toDouble / wq.sum * 1e3
    val sa = st.zip(wq).map { case ((ng, mu, v), w) =>
      math.floor(w.toDouble / 1e12 * (mu - grand) * (mu - grand) * 1e6 + 0.5).toLong }.sum
    val sb = st.zip(wq).map { case ((ng, mu, v), w) =>
      math.floor((1 - w.toDouble / wq.sum) * (1 - w.toDouble / wq.sum) / (ng - 1) * 1e12 + 0.5).toLong }.sum
    val k = st.size
    val f = (sa / 1e6 / (k - 1)) / (1 + 2.0 * (k - 2) / (k.toDouble * k - 1) * (sb / 1e12))
    val df2 = (k.toDouble * k - 1) / (3 * sb / 1e12)
    val row = queries.Extras190.statWelchAnova(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(row.getLong(1) == xs.length.toLong)
    assert(math.abs(row.getDouble(2) - f) < 1e-4)
    assert(row.getDouble(2) >= 0)
    assert(math.abs(row.getDouble(3) - df2) < 1e-3)
    assert(row.getDouble(3) > st.map(_._1).min - 1 && row.getDouble(3) < xs.length)
  }

  test("stat_mood_scale: midrank-score replay with exact permutation moments") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    val n = xs.length.toLong
    val hist = xs.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L
    var t4 = BigInt(0); var sa4 = BigInt(0); var sa16 = BigInt(0)
    hist.foreach { case (_, g) =>
      val m1 = g.count(_._1 == "A").toLong; val gg = g.size.toLong
      val d = 2 * cum + gg - n // 2·(midrank − (N+1)/2)
      val a4 = BigInt(d) * BigInt(d)
      t4 += a4 * m1; sa4 += a4 * gg; sa16 += a4 * a4 * gg
      cum += gg
    }
    val n1 = xs.count(_._1 == "A").toLong; val n2 = n - n1
    val tD = t4.toDouble / 4; val saD = sa4.toDouble / 4; val sa2D = sa16.toDouble / 16
    val z = (tD - n1.toDouble * saD / n) /
      math.sqrt(n1.toDouble * n2 * (n.toDouble * sa2D - saD * saD) / (n.toDouble * n * (n - 1)))
    val row = queries.Extras190.statMoodScale(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == n1 && row.getLong(2) == n2)
    assert(row.getLong(3) == t4.toLong)
    assert(math.abs(row.getDouble(4) - z) < 1e-5)
  }

  test("stat_wald_wolfowitz: merged-sort runs replay; 2 <= R <= N") {
    val daily = Tables.orders(spark, sf)
      .filter("o_orderstatus IN ('F', 'O')")
      .select("o_orderdate", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, r.getString(1),
        math.round(r.getDouble(2) * 100)))
      .groupBy(p => (p._1, p._2)).toSeq
      .map { case ((day, st), g) =>
        (g.map(x => BigInt(x._3)).sum.toDouble / 100 / g.size, st, day) }
      .sortBy(t => (t._1, t._2, t._3.toString))
    val runs = 1 + daily.map(_._2).sliding(2).count(p => p.size == 2 && p(0) != p(1))
    val n1 = daily.count(_._2 == "F").toLong; val n2 = daily.count(_._2 == "O").toLong
    val nn = n1 + n2
    val e = 1 + 2.0 * n1 * n2 / nn
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn.toDouble * nn * (nn - 1))
    val row = queries.Extras190.statWaldWolfowitz(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getLong(2) == runs.toLong)
    assert(runs >= 2 && runs <= nn)
    assert(math.abs(row.getDouble(3) - (runs - e) / math.sqrt(v)) < 1e-5)
  }
}
