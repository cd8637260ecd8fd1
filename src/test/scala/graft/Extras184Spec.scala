package graft

/** Wave-84 properties: Cuzick, KW effect sizes, Brunner–Munzel,
  * Conover squared ranks replayed against brute force on sf0.001.
  */
class Extras184Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  /** Pooled midranks for a sequence (1-based). */
  private def midranks(xs: Seq[Long]): Map[Long, Double] = {
    val sorted = xs.sorted
    sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
  }

  private def orderGroups(): Array[(Int, Long)] =
    Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0).substring(0, 1).toInt, cents(r.getDouble(1))))

  test("stat_cuzick_trend: rank-sum trend replay") {
    val xs = orderGroups()
    val n = xs.length
    val mr = midranks(xs.map(_._2))
    val t = xs.map { case (g, v) => g * mr(v) }.sum
    val ln1 = xs.map(_._1.toLong).sum.toDouble
    val ln2 = xs.map(x => x._1.toLong * x._1).sum.toDouble
    val ties = xs.groupBy(_._2).values.map(g => g.size.toDouble).map(g => g * g * g - g).sum
    val e = (n + 1.0) * ln1 / 2
    val v = n.toDouble * (n + 1) / 12 * (ln2 - ln1 * ln1 / n) *
      (1 - ties / (n.toDouble * n * n - n))
    val row = queries.Extras184.statCuzickTrend(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - t) < 0.5)
    assert(math.abs(row.getDouble(2) - e) < 0.5)
    assert(math.abs(row.getDouble(3) - (t - e) / math.sqrt(v)) < 1e-4)
  }

  test("stat_kw_effect_size: tie-corrected H + effect sizes replay") {
    val xs = orderGroups()
    val n = xs.length
    val mr = midranks(xs.map(_._2))
    val byG = xs.groupBy(_._1)
    val rsum = byG.view.mapValues(_.map(x => mr(x._2)).sum).toMap
    val ties = xs.groupBy(_._2).values.map(g => g.size.toDouble).map(g => g * g * g - g).sum
    val h0 = 12.0 / (n.toDouble * (n + 1)) *
      byG.keys.map(g => rsum(g) * rsum(g) / byG(g).size).sum - 3.0 * (n + 1)
    val h = h0 / (1 - ties / (n.toDouble * n * n - n))
    val row = queries.Extras184.statKwEffectSize(spark, sf).collect().head
    assert(math.abs(row.getDouble(2) - h) < 1e-3)
    assert(math.abs(row.getDouble(3) - (h - 4) / (n - 5)) < 1e-6)
    assert(math.abs(row.getDouble(4) - h * (n + 1) / (n.toDouble * n - 1)) < 1e-6)
  }

  test("stat_brunner_munzel: placement replay against scipy formulation") {
    val docs = Tables.documents(spark, sf).select("lang", "n_chars").collect()
      .filter(r => r.getString(0) == "en" || r.getString(0) == "de")
      .map(r => (r.getString(0) == "en", r.getLong(1)))
    val g1 = docs.filter(_._1).map(_._2); val g2 = docs.filterNot(_._1).map(_._2)
    val n1 = g1.length; val n2 = g2.length
    val mrAll = midranks(docs.map(_._2))
    val mr1 = midranks(g1); val mr2 = midranks(g2)
    val p1 = g1.map(v => mrAll(v) - mr1(v)); val p2 = g2.map(v => mrAll(v) - mr2(v))
    val pm1 = p1.sum / n1; val pm2 = p2.sum / n2
    val s1 = p1.map(p => (p - pm1) * (p - pm1)).sum / (n1 - 1)
    val s2 = p2.map(p => (p - pm2) * (p - pm2)).sum / (n2 - 1)
    val w = (pm2 - pm1) * n1.toDouble * n2 / (n1 + n2) / math.sqrt(n1 * s1 + n2 * s2)
    val pHat = pm2 / n1
    val row = queries.Extras184.statBrunnerMunzel(spark, sf).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(2) - w) < 1e-4)
    assert(math.abs(row.getDouble(3) - pHat) < 1e-5)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }

  test("stat_conover_squared_ranks: squared-rank chi2 replay") {
    val xs = orderGroups()
    val n = xs.length
    val means = xs.groupBy(_._1).view.mapValues(g => g.map(_._2.toDouble).sum / g.size).toMap
    val devs = xs.map { case (g, v) => (g, math.floor(math.abs(v - means(g)) + 0.5).toLong) }
    val mr = midranks(devs.map(_._2))
    val a = devs.map { case (g, u) => (g, mr(u) * mr(u)) }
    val tj = a.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nj = a.groupBy(_._1).view.mapValues(_.size).toMap
    val abar = a.map(_._2).sum / n
    val sa2 = a.map(x => x._2 * x._2).sum
    val tstat = (tj.keys.map(g => tj(g) * tj(g) / nj(g)).sum - n * abar * abar) /
      ((sa2 - n * abar * abar) / (n - 1))
    val row = queries.Extras184.statConoverSquaredRanks(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getInt(1) == 5)
    assert(math.abs(row.getDouble(2) - tstat) < 1e-3)
    assert(row.getDouble(2) >= 0)
  }
}
