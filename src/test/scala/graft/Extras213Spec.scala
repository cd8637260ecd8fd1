package graft

/** Wave-113 properties: the delete-one jackknife replayed from exact
  * moments, octile order statistics by full sort, the Gini mean
  * difference vs the O(n²) pair sum, and the trigram novelty curve —
  * all brute-forced at sf0.001.
  */
class Extras213Spec extends SparkSpec {

  private def orderCents(): Array[Long] =
    Tables.orders(spark, sf).selectExpr(
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x",
      "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (x, k) => (x, k) }.map(_._1)

  test("stat_jackknife_skew_ci: matches the delete-one replay from exact moments") {
    val xs = orderCents()
    val n = xs.length.toLong
    def skew(nD: Double, s1: Double, s2: Double, s3: Double): Double = {
      val m = s1 / nD
      val num = (s3 - 3 * m * s2 + 2 * nD * m * m * m) / nD
      num / math.pow((s2 - nD * m * m) / nD, 1.5)
    }
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val s3 = xs.map(x => BigInt(x) * x * x).sum
    val theta = skew(n.toDouble, s1.toDouble, s2.toDouble, s3.toDouble)
    val tqs = xs.map { x =>
      val ti = skew((n - 1).toDouble, s1.toDouble - x,
        s2.toDouble - x.toDouble * x, s3.toDouble - x.toDouble * x * x)
      math.floor(ti * 1e9 + 0.5).toLong
    }
    val sq = tqs.map(BigInt(_)).sum
    val sqq = tqs.map(t => BigInt(t) * t).sum
    val se = math.sqrt((n - 1).toDouble / n *
      (sqq.toDouble / 1e18 - (sq.toDouble / 1e9) * (sq.toDouble / 1e9) / n))
    val row = queries.Extras213.statJackknifeSkewCi(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - theta) < 1e-5, s"skew ${row.getDouble(1)} vs $theta")
    assert(math.abs(row.getDouble(2) - se) < 1e-5, s"jk_se ${row.getDouble(2)} vs $se")
    assert(math.abs(row.getDouble(3) - (theta - 1.96 * se)) < 2e-5)
    assert(math.abs(row.getDouble(4) - (theta + 1.96 * se)) < 2e-5)
    assert(row.getDouble(2) > 0, "nondegenerate SE")
  }

  test("stat_bowley_skewness: octiles match the full sort; bounds hold") {
    val xs = orderCents()
    val n = xs.length
    def oct(j: Int): Long = xs(math.ceil(j * 0.125 * n).toLong.toInt - 1)
    val (o1, o2, o3, o4, o5, o6, o7) =
      (oct(1), oct(2), oct(3), oct(4), oct(5), oct(6), oct(7))
    val row = queries.Extras213.statBowleySkewness(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == math.floor(o2.toDouble / 100 * 100 + 0.5) / 100 ||
      math.abs(row.getDouble(1) - o2 / 100.0) < 1e-9)
    assert(math.abs(row.getDouble(2) - o4 / 100.0) < 1e-9)
    assert(math.abs(row.getDouble(3) - o6 / 100.0) < 1e-9)
    val bowley = (o6.toDouble + o2 - 2.0 * o4) / (o6.toDouble - o2)
    val moors = ((o7.toDouble - o5) + (o3.toDouble - o1)) / (o6.toDouble - o2)
    assert(math.abs(row.getDouble(4) - bowley) < 1e-6)
    assert(math.abs(row.getDouble(5) - moors) < 1e-6)
    assert(math.abs(row.getDouble(4)) <= 1.0, "Bowley skewness bounded in [-1,1]")
    assert(row.getDouble(5) > 0, "Moors kurtosis positive")
  }

  test("stat_gini_mean_difference: rank algebra equals the O(n^2) pair sum exactly") {
    val xs = orderCents()
    val n = xs.length
    // O(n^2) ground truth
    var pair = BigInt(0)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        pair += BigInt(math.abs(xs(i) - xs(j)))
        j += 1
      }
      i += 1
    }
    // rank identity: sum_ij |xi-xj| = 2 * sum_i (2i - n - 1) x_(i)
    val viaRanks = xs.zipWithIndex
      .map { case (x, i0) => BigInt(2L * (i0 + 1) - n - 1) * x }.sum * 2
    assert(viaRanks == pair, "rank algebra identity holds on the fixture")
    val mu = xs.map(BigInt(_)).sum.toDouble / n
    val gmd = pair.toDouble / (n.toDouble * (n - 1))
    val row = queries.Extras213.statGiniMeanDifference(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - gmd / 100) < 5e-3, "GMD in dollars")
    assert(math.abs(row.getDouble(2) - gmd / mu) < 1e-6, "relative GMD")
    assert(math.abs(row.getDouble(3) - gmd / (2 * mu)) < 1e-6, "implied Gini")
    assert(row.getDouble(3) > 0 && row.getDouble(3) < 1)
  }

  test("text_trigram_novelty: decile curve matches the brute-force first-doc replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toLong
    val first = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val a = text.toLowerCase.split(" ", -1)
      if (a.length >= 3) {
        (0 to a.length - 3).foreach { i =>
          val tg = s"${a(i)} ${a(i + 1)} ${a(i + 2)}"
          first.get(tg) match {
            case Some(prev) if prev <= id => ()
            case _ => first(tg) = id
          }
        }
      }
    }
    val perDecile = first.values
      .groupBy(fd => math.min(math.max(fd * 10 / nDocs, 0L), 9L))
      .map { case (dec, g) => (dec, g.size.toLong) }
    val rows = queries.Extras213.textTrigramNovelty(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == first.size.toLong, "total distinct trigrams")
    var cum = 0L
    rows.foreach { r =>
      val dec = r.getLong(0)
      assert(r.getLong(1) == perDecile.getOrElse(dec, 0L), s"decile $dec count")
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"decile $dec cumulative")
    }
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }
}
