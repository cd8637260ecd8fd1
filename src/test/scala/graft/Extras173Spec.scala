package graft

import org.apache.spark.sql.functions._

/** Wave-73 properties: trimean, Lorenz asymmetry, stochastic, source
  * diversity replays against brute force on sf0.001.
  */
class Extras173Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_tukey_trimean: histogram order-statistic replay") {
    val qs = Tables.lineitem(spark, sf).select("l_quantity").collect()
      .map(_.getDouble(0).toLong).sorted
    val n = qs.length
    def stat(frac4: Int): Long = { // smallest v with 4*rank >= frac4*n
      qs.zipWithIndex.find { case (_, i) => 4L * (i + 1) >= frac4.toLong * n }.get._1
    }
    val q1 = stat(1); val q3 = stat(3)
    val q2 = qs.zipWithIndex.find { case (_, i) => 2L * (i + 1) >= n }.get._1
    val row = queries.Extras173.statTukeyTrimean(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == q1 && row.getLong(2) == q2 && row.getLong(3) == q3)
    assert(math.abs(row.getDouble(4) - (q1 + 2 * q2 + q3) / 4.0) < 1e-9)
    assert(math.abs(row.getDouble(5) - (q1 + q3) / 2.0) < 1e-9)
  }

  test("stat_lorenz_asymmetry: exact below-mean census replay") {
    val cs = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0)))
    val n = cs.length
    val sc = cs.map(BigInt(_)).sum
    val below = cs.filter(c => BigInt(c) * n < sc)
    val fmu = below.length.toDouble / n
    val lmu = below.map(BigInt(_)).sum.toDouble / sc.toDouble
    val row = queries.Extras173.statLorenzAsymmetry(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == below.length.toLong)
    assert(math.abs(row.getDouble(2) - fmu) < 1e-5)
    assert(math.abs(row.getDouble(3) - lmu) < 1e-5)
    assert(math.abs(row.getDouble(4) - (fmu + lmu)) < 1e-4)
  }

  test("win_stochastic_oscillator: ppm-quantized %K/%D replay") {
    val bars = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue, cents(r.getDouble(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) =>
        val ps = xs.map(_._2)
        (ps.map(_._3).max, ps.map(_._3).min, ps.maxBy(t => (t._1, t._2))._3)
      }.toIndexedSeq
    def h14(i: Int) = (math.max(0, i - 13) to i).map(bars(_)._1).max
    def l14(i: Int) = (math.max(0, i - 13) to i).map(bars(_)._2).min
    val ks = (13 until bars.length).map { i =>
      (1000000L * (bars(i)._3 - l14(i))) / (h14(i) - l14(i))
    }
    // d_ppm3 defined from index 2 of the k series (rn >= 16)
    var (nOb, nOs, crosses, ksum, nd) = (0L, 0L, 0L, 0L, 0L)
    for (j <- 2 until ks.length) {
      val k = ks(j); val d3 = ks(j) + ks(j - 1) + ks(j - 2)
      nd += 1; ksum += k
      if (k > 800000) nOb += 1
      if (k < 200000) nOs += 1
      if (j >= 3) {
        val pk = ks(j - 1); val pd3 = ks(j - 1) + ks(j - 2) + ks(j - 3)
        if ((3 * k - d3) * (3 * pk - pd3) < 0) crosses += 1
      }
    }
    val row = queries.Extras173.winStochasticOscillator(spark, sf).collect().head
    assert(row.getLong(0) == nd)
    assert(row.getLong(1) == nOb && row.getLong(2) == nOs)
    assert(row.getLong(3) == crosses)
    assert(math.abs(row.getDouble(4) - ksum.toDouble / nd / 1e4) < 1e-3)
  }

  test("pipeline_source_diversity: quantized entropy replay; ENS <= k") {
    val src = Tables.documents(spark, sf).select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val k = src.size
    val td = src.values.map(_._1).sum; val tc = src.values.map(_._2).sum
    def hq(shares: Iterable[Double]): Long =
      shares.map(p => math.floor(-p * math.log(p) * 1e9 + 0.5).toLong).sum
    val hd = hq(src.values.map(_._1.toDouble / td)) / 1e9
    val hc = hq(src.values.map(_._2.toDouble / tc)) / 1e9
    val row = queries.Extras173.pipelineSourceDiversity(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(math.abs(row.getDouble(1) - math.exp(hd)) < 1e-3)
    assert(math.abs(row.getDouble(2) - math.exp(hc)) < 1e-3)
    assert(row.getDouble(1) <= k + 1e-6)
    assert(math.abs(row.getDouble(3) - hd / math.log(k)) < 1e-5)
  }
}
