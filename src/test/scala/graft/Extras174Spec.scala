package graft

import org.apache.spark.sql.functions._

/** Wave-74 properties: Wilson, hash uniformity, 2nd-digit Benford,
  * extremal index replays against brute force on sf0.001.
  */
class Extras174Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_wilson_interval: closed-form replay; CI contains p_hat") {
    val src = Tables.documents(spark, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1) == "en"))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.count(_._2).toLong))
      .toSeq.sortBy(t => (-t._2._1, t._1)).take(5)
    val got = queries.Extras174.statWilsonInterval(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == src.map(_._1))
    got.zip(src).foreach { case (r, (_, (n, x))) =>
      val p = x.toDouble / n
      val z2 = 1.96 * 1.96
      val lo = (p + z2 / (2 * n) - 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) / (1 + z2 / n)
      val hi = (p + z2 / (2 * n) + 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) / (1 + z2 / n)
      assert(r.getLong(1) == n && r.getLong(2) == x)
      assert(math.abs(r.getDouble(4) - lo) < 1e-5)
      assert(math.abs(r.getDouble(5) - hi) < 1e-5)
      assert(r.getDouble(4) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(5))
    }
  }

  test("sample_hash_uniformity_audit: binned KS/chi2 replay") {
    def hex2(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16)
    }
    val bs = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(r => hex2(r.getLong(0)))
    val n = bs.length.toLong
    val byB = bs.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    var cl = 0L; var maxGap = 0L; var chi6 = 0L
    byB.foreach { case (b, w) =>
      cl += w
      maxGap = math.max(maxGap, math.abs(cl * 256 - (b + 1) * n))
      chi6 += math.floor(math.pow(w - n / 256.0, 2) / (n / 256.0) * 1e6 + 0.5).toLong
    }
    val row = queries.Extras174.sampleHashUniformityAudit(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == byB.length.toLong)
    assert(math.abs(row.getDouble(2) - maxGap.toDouble / 256 / n) < 1e-6)
    assert(math.abs(row.getDouble(3) - chi6 / 1e6) < 1e-3)
    assert(!row.getBoolean(4)) // the PRNG idiom must look uniform
  }

  test("stat_benford_second_digit: digit census replay; probs sum to 1") {
    val cs = Tables.lineitem(spark, sf).select("l_extendedprice").collect()
      .map(r => cents(r.getDouble(0))).filter(_ >= 10)
    val sds = cs.map { c =>
      val s0 = c.toString; s0(1).asDigit.toLong
    }
    val byD = sds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val probs = (0 to 9).map { d0 =>
      (1 to 9).map(k => math.log10(1 + 1.0 / (10 * k + d0))).sum
    }
    assert(math.abs(probs.sum - 1.0) < 1e-12)
    val got = queries.Extras174.statBenfordSecondDigit(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == byD.keys.toSeq.sorted)
    got.foreach { r =>
      val d0 = r.getLong(0).toInt
      assert(r.getLong(1) == byD(d0.toLong))
      assert(math.abs(r.getDouble(3) - probs(d0)) < 1e-5)
    }
  }

  test("time_extremal_index: blocks estimator replay; theta in (0,1]") {
    val x = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val n = x.length
    val u = x.zipWithIndex.sortBy(t => (t._1, t._2))
      .zipWithIndex.find { case (_, i) => (i + 1) * 20 >= 19 * n }.get._1._1
    val exceed = x.map(_ >= u)
    val blocks = exceed.zipWithIndex.groupBy(_._2 / 10).values
    val nEx = exceed.count(identity).toLong
    val hits = blocks.count(_.exists(_._1)).toLong
    val row = queries.Extras174.timeExtremalIndex(spark, sf).collect().head
    assert(row.getLong(0) == blocks.size.toLong)
    assert(row.getLong(1) == nEx && row.getLong(2) == hits)
    assert(math.abs(row.getDouble(3) - hits.toDouble / nEx) < 1e-6)
    assert(row.getDouble(3) > 0 && row.getDouble(3) <= 1.0)
  }
}
