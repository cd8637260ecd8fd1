package graft

import org.apache.spark.sql.functions._

/** Wave-60 properties: Mantel–Haenszel, EWMA chart, effective rank,
  * price endings replays against brute force on sf0.001.
  */
class Extras160Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def dailySeries(): Seq[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)

  test("stat_mantel_haenszel: per-stratum 2x2 replay with the same quantization") {
    val rows = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), col("l_discount"), col("l_returnflag"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1) >= 0.05, r.getString(2) == "R"))
    val strata = rows.groupBy(_._1).values.map { g =>
      val a = g.count(t => t._2 && t._3).toLong
      val b = g.count(t => t._2 && !t._3).toLong
      val c = g.count(t => !t._2 && t._3).toLong
      val dd = g.count(t => !t._2 && !t._3).toLong
      (a, b, c, dd, a + b + c + dd)
    }.toSeq
    val sa = strata.map(_._1).sum
    def q6(num: BigInt, den: BigInt): BigInt = num * 1000000 / den
    val se6 = strata.map { case (a, b, c, _, nk) =>
      q6(BigInt(a + b) * (a + c), nk) }.sum
    val sv6 = strata.map { case (a, b, c, dd, nk) =>
      q6(BigInt(a + b) * (c + dd) * (a + c) * (b + dd), BigInt(nk) * nk * (nk - 1)) }.sum
    val sad6 = strata.map { case (a, _, _, dd, nk) => q6(BigInt(a) * dd, nk) }.sum
    val sbc6 = strata.map { case (_, b, c, _, nk) => q6(BigInt(b) * c, nk) }.sum
    val chi2 = math.pow(math.abs(sa - se6.toDouble / 1e6) - 0.5, 2) / (sv6.toDouble / 1e6)
    val row = queries.Extras160.statMantelHaenszel(spark, sf).collect().head
    assert(row.getLong(0) == strata.length.toLong)
    assert(math.abs(row.getDouble(1) - chi2) < 1e-2)
    assert(math.abs(row.getDouble(2) - sad6.toDouble / sbc6.toDouble) < 1e-4)
    assert(row.getBoolean(3) == (chi2 > 3.841))
  }

  test("stat_ewma_control_chart: exact 16-term dyadic replay") {
    val x = dailySeries()
    val n = x.length
    val mean = x.map(BigInt(_)).sum.toDouble / n
    val sc = x.map(BigInt(_)).sum; val qc = x.map(c => BigInt(c) * c).sum
    val sigma = math.sqrt((BigInt(n) * qc - sc * sc).toDouble / (n.toDouble * n))
    val limit = math.sqrt(3.0) * sigma
    var viol = 0L; var worst = 0.0
    for (t <- x.indices) {
      var z16 = 0L
      for (j <- 0 to 15; if t - j >= 0) z16 += x(t - j) * (1L << (15 - j))
      val zt = z16.toDouble / 65536
      val exc = math.abs(zt - mean)
      if (exc > limit) viol += 1
      worst = math.max(worst, exc / sigma)
    }
    val row = queries.Extras160.statEwmaControlChart(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == viol)
    assert(math.abs(row.getDouble(2) - worst) < 1e-3)
  }

  test("embed_effective_rank: quantized trace/Frobenius replay; PR in [1,64]") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(v =>
        BigInt(math.floor(v.toDouble * 1e9 + 0.5).toLong)).toArray)
    val n = vecs.length; val dims = 64
    val sums = Array.tabulate(dims)(j => vecs.map(_(j)).sum)
    var tr = BigInt(0); var fro2 = BigInt(0)
    for (i <- 0 until dims; j <- 0 until dims) {
      val m = vecs.map(v => v(i) * v(j)).sum
      val cq = (BigInt(n) * m - sums(i) * sums(j)) / BigInt("1000000000000")
      if (i == j) tr += cq
      fro2 += cq * cq
    }
    val pr = tr.toDouble * tr.toDouble / fro2.toDouble
    val row = queries.Extras160.embedEffectiveRank(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - pr) < 1e-3)
    assert(row.getDouble(1) >= 1.0 && row.getDouble(1) <= 64.0)
    assert(math.abs(row.getDouble(2) - pr / 64) < 1e-5)
  }

  test("analytics_price_point_endings: ending-class census replay; shares sum to 1") {
    val ends = Tables.lineitem(spark, sf).select("l_extendedprice").collect()
      .map(r => cents(r.getDouble(0)) % 100)
    def cls(e: Long): String =
      if (e == 0) "00" else if (e == 50) "50" else if (e == 95) "95"
      else if (e == 99) "99" else if (e % 5 == 0) "x5/x0" else "other"
    val byCls = ends.groupBy(cls).view.mapValues(_.length.toLong).toMap
    val got = queries.Extras160.analyticsPricePointEndings(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == byCls.keySet)
    var shareSum = 0.0
    got.foreach { r =>
      assert(r.getLong(1) == byCls(r.getString(0)))
      shareSum += r.getDouble(2)
      assert(r.getDouble(3) >= 0)
    }
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }
}
