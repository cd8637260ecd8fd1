package graft

/** Wave-87 properties: stochastic dominance, QTE deciles, BY vs BH,
  * Hoover index replayed against brute force on sf0.001.
  */
class Extras187Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def eventVals(types: Set[String]): Map[String, Array[Double]] =
    Tables.events(spark, sf).select("event_type", "value").collect()
      .filter(r => types(r.getString(0)))
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("stat_stochastic_dominance: per-block CDF comparison replay") {
    val m = eventVals(Set("click", "view"))
    val g1 = m("click").sorted; val g2 = m("view").sorted
    val vals = (g1 ++ g2).distinct.sorted
    val n1 = g1.length; val n2 = g2.length
    var dom1 = 0; var dom2 = 0; var maxGap = Double.MinValue; var minGap = Double.MaxValue
    vals.foreach { v =>
      val f1 = g1.count(_ <= v).toLong; val f2 = g2.count(_ <= v).toLong
      if (f1 * n2 < f2 * n1) dom1 += 1
      if (f1 * n2 > f2 * n1) dom2 += 1
      val gap = f1.toDouble / n1 - f2.toDouble / n2
      maxGap = math.max(maxGap, gap); minGap = math.min(minGap, gap)
    }
    val row = queries.Extras187.statStochasticDominance(spark, sf).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(row.getLong(2) == vals.length.toLong)
    assert(math.abs(row.getDouble(3) - dom1.toDouble / vals.length) < 1e-6)
    assert(math.abs(row.getDouble(4) - maxGap) < 1e-6)
    assert(math.abs(row.getDouble(5) - (-minGap)) < 1e-6)
    assert(row.getBoolean(6) == (dom2 == 0) && row.getBoolean(7) == (dom1 == 0))
  }

  test("stat_qte_deciles: exact lower order statistics per group") {
    val m = eventVals(Set("click", "purchase"))
    val g1 = m("click").sorted; val g2 = m("purchase").sorted
    def q(g: Array[Double], d0: Int): Double = g((g.length * d0 + 9) / 10 - 1)
    val got = queries.Extras187.statQteDeciles(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == (1L to 9L))
    got.foreach { r =>
      val d0 = r.getLong(0).toInt
      assert(math.abs(r.getDouble(1) - q(g1, d0)) < 1e-6, s"decile $d0 click")
      assert(math.abs(r.getDouble(2) - q(g2, d0)) < 1e-6, s"decile $d0 purchase")
      assert(math.abs(r.getDouble(3) - (q(g2, d0) - q(g1, d0))) < 1e-5)
    }
  }

  test("stat_benjamini_yekutieli: BY rejects a subset of BH rejections") {
    val got = queries.Extras187.statBenjaminiYekutieli(spark, sf).collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(2)).toSeq == (1L to 5L))
    // p sorted ascending with rank
    val ps = got.map(_.getDouble(1))
    assert(ps.toSeq == ps.sorted.toSeq)
    // step-up coherence: rejections are a prefix of the rank order
    def prefix(flags: Seq[Boolean]): Boolean =
      !flags.zip(flags.tail).exists { case (a, b) => !a && b }
    assert(prefix(got.map(_.getBoolean(3)).toSeq))
    assert(prefix(got.map(_.getBoolean(4)).toSeq))
    // BY ⊆ BH (its threshold is H5 = 137/60 times stricter)
    got.foreach(r => assert(!r.getBoolean(4) || r.getBoolean(3)))
  }

  test("stat_hoover_index: exact |share - 1/n| replay; H in [0,1)") {
    val g = Tables.lineitem(spark, sf).select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(v => BigInt(v.map(_._2).sum)).toMap
    val n = g.size
    val sc = g.values.sum
    val num = g.values.map(c => (c * n - sc).abs).sum
    val h = num.toDouble / (2.0 * n * sc.toDouble)
    val row = queries.Extras187.statHooverIndex(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - h) < 1e-6)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) < 1)
  }
}
