package graft

/** Wave-75 properties: Ansari–Bradley, Cucconi, Lepage, Hartley/Cochran
  * replayed against brute force on sf0.001.
  */
class Extras175Spec extends SparkSpec {

  /** Pooled en/de doc lengths with brute-force midranks + AB midscores. */
  private def pooled(): (Array[(Long, Boolean)], Array[Double], Array[Double]) = {
    val xs = Tables.documents(spark, sf).select("n_chars", "lang").collect()
      .filter(r => r.getString(1) == "en" || r.getString(1) == "de")
      .map(r => (r.getLong(0), r.getString(1) == "en"))
      .sortBy(_._1)
    val n = xs.length
    // midranks and AB midscores per element, averaging over tie blocks
    val ranks = new Array[Double](n)
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && xs(j)._1 == xs(i)._1) j += 1
      val rs = (i + 1) to j // 1-based ranks of the block
      val mr = rs.sum.toDouble / rs.size
      val ms = rs.map(r => math.min(r, n + 1 - r)).sum.toDouble / rs.size
      (i until j).foreach { k => ranks(k) = mr; scores(k) = ms }
      i = j
    }
    (xs, ranks, scores)
  }

  test("stat_ansari_bradley: brute-force tied midscore replay") {
    val (xs, _, scores) = pooled()
    val n = xs.length; val n1 = xs.count(_._2)
    val t = xs.indices.filter(xs(_)._2).map(scores).sum
    val ga2 = {
      // sum over tie blocks of g * meanScore^2 == sum over elements of score*meanScore
      xs.indices.map(i => scores(i) * scores(i)).sum
    }
    val (e, v) =
      if (n % 2 == 0)
        (n1.toDouble * (n + 2) / 4,
          n1.toDouble * (n - n1) * (16 * ga2 - n.toDouble * (n + 2) * (n + 2)) / (16.0 * n * (n - 1)))
      else
        (n1.toDouble * (n + 1) * (n + 1) / (4.0 * n),
          n1.toDouble * (n - n1) * (16.0 * n * ga2 - math.pow(n + 1.0, 4)) / (16.0 * n * n * (n - 1)))
    val row = queries.Extras175.statAnsariBradley(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == n1.toLong)
    assert(math.abs(row.getDouble(3) - t) < 1e-3)
    assert(math.abs(row.getDouble(4) - e) < 1e-3)
    assert(math.abs(row.getDouble(5) - (t - e) / math.sqrt(v)) < 1e-4)
  }

  test("stat_cucconi: brute-force rank/contrary-rank replay; C >= 0") {
    val (xs, ranks, _) = pooled()
    val n = xs.length; val n1 = xs.count(_._2); val n2 = n - n1
    val r2 = xs.indices.filter(xs(_)._2).map(i => ranks(i) * ranks(i)).sum
    val s2 = xs.indices.filter(xs(_)._2).map(i => (n + 1 - ranks(i)) * (n + 1 - ranks(i))).sum
    val den = math.sqrt(n1.toDouble * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    val u = (6 * r2 - n1.toDouble * (n + 1) * (2 * n + 1)) / den
    val v = (6 * s2 - n1.toDouble * (n + 1) * (2 * n + 1)) / den
    val rho = 2.0 * (n.toDouble * n - 4) / ((2.0 * n + 1) * (8 * n + 11)) - 1
    val c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    val row = queries.Extras175.statCucconi(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(3) - u) < 1e-4)
    assert(math.abs(row.getDouble(4) - v) < 1e-4)
    assert(math.abs(row.getDouble(5) - rho) < 1e-5)
    assert(math.abs(row.getDouble(6) - c) < 1e-4)
    assert(row.getDouble(6) >= 0)
  }

  test("stat_lepage: D = W^2 + A^2 replay; components match siblings") {
    val (xs, ranks, scores) = pooled()
    val n = xs.length; val n1 = xs.count(_._2); val n2 = n - n1
    val tw = xs.indices.filter(xs(_)._2).map(ranks).sum
    val ties = xs.groupBy(_._1).values.map(_.length.toDouble).map(g => g * g * g - g).sum
    val w = (tw - n1.toDouble * (n + 1) / 2) /
      math.sqrt(n1.toDouble * n2 / 12 * ((n + 1) - ties / (n.toDouble * (n - 1))))
    val t = xs.indices.filter(xs(_)._2).map(scores).sum
    val ga2 = xs.indices.map(i => scores(i) * scores(i)).sum
    val (e, v) =
      if (n % 2 == 0)
        (n1.toDouble * (n + 2) / 4,
          n1.toDouble * n2 * (16 * ga2 - n.toDouble * (n + 2) * (n + 2)) / (16.0 * n * (n - 1)))
      else
        (n1.toDouble * (n + 1) * (n + 1) / (4.0 * n),
          n1.toDouble * n2 * (16.0 * n * ga2 - math.pow(n + 1.0, 4)) / (16.0 * n * n * (n - 1)))
    val a = (t - e) / math.sqrt(v)
    val row = queries.Extras175.statLepage(spark, sf).collect().head
    assert(math.abs(row.getDouble(3) - w) < 1e-4)
    assert(math.abs(row.getDouble(4) - a) < 1e-4)
    assert(math.abs(row.getDouble(5) - (w * w + a * a)) < 1e-3)
    // cross-row consistency: the A component equals the C704 z
    val ab = queries.Extras175.statAnsariBradley(spark, sf).collect().head
    assert(math.abs(row.getDouble(4) - ab.getDouble(5)) < 1e-5)
  }

  test("stat_hartley_cochran: brute-force group variances; C in (1/k, 1)") {
    val xs = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0),
        (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    val s2 = xs.groupBy(_._1).view.mapValues { g =>
      val n = g.length
      val mean = g.map(_._2).sum.toDouble / n
      g.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1.0) / 1e4
    }.toMap
    val fmax = s2.values.max / s2.values.min
    val cc = s2.values.max / s2.values.map(v => math.floor(v * 100 + 0.5) / 100).sum
    val row = queries.Extras175.statHartleyCochran(spark, sf).collect().head
    assert(row.getLong(0) == s2.size.toLong)
    assert(math.abs(row.getDouble(3) - fmax) < 1e-4)
    assert(math.abs(row.getDouble(4) - cc) < 1e-4)
    assert(row.getDouble(4) > 1.0 / s2.size && row.getDouble(4) < 1.0)
  }
}
