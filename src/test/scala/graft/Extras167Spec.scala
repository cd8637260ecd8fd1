package graft

import org.apache.spark.sql.functions._

/** Wave-67 properties: Gries DP, Atkinson, ACT, biweight replays
  * against brute force on sf0.001.
  */
class Extras167Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("text_gries_dp: definitional DP replay over top tokens; DP in [0,1)") {
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val srcSizes = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val t = toks.length.toLong
    val byTok = toks.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val top = byTok.toSeq.map(x => (x._1, x._2.length.toLong))
      .sortBy(x => (-x._2, x._1)).take(10)
    val got = queries.Extras167.textGriesDp(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == top.map(_._1))
    got.foreach { r =>
      val tok = r.getString(0)
      val c = byTok(tok).length.toLong
      val dp = srcSizes.keys.map { src =>
        val ci = byTok(tok).count(_ == src).toLong
        math.abs(ci.toDouble / c - srcSizes(src).toDouble / t)
      }.sum / 2
      assert(r.getLong(1) == c)
      assert(math.abs(r.getDouble(2) - dp) < 1e-5)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1)
    }
  }

  test("analytics_atkinson_index: quantized geomean replay; A in [0,1)") {
    val cs = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0)))
    val n = cs.length
    val mean = cs.map(BigInt(_)).sum.toDouble / n
    val sl = cs.map(c => math.floor(math.log(c.toDouble) * 1e9 + 0.5).toLong).sum
    val gmean = math.exp(sl.toDouble / n / 1e9)
    val row = queries.Extras167.analyticsAtkinsonIndex(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mean / 100) < 0.02)
    assert(math.abs(row.getDouble(2) - gmean / 100) < 0.02)
    assert(math.abs(row.getDouble(3) - (1 - gmean / mean)) < 1e-5)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) < 1)
  }

  test("time_integrated_act: cleared ACF battery replay; ESS <= n") {
    val x = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val n = x.length
    val sc = x.map(BigInt(_)).sum
    val cl = x.map(c => BigInt(n) * c - sc)
    val c0 = cl.map(v => v * v).sum
    val rhos = (1 to 30).map(k =>
      cl.dropRight(k).zip(cl.drop(k)).map { case (a, b) => a * b }.sum.toDouble /
        c0.toDouble)
    val tau = 1 + 2 * rhos.map(r => math.max(r, 0.0)).sum
    val firstNeg = rhos.zipWithIndex.find(_._1 < 0).map(_._2 + 1).getOrElse(99)
    val row = queries.Extras167.timeIntegratedAct(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - tau) < 1e-4)
    assert(math.abs(row.getDouble(2) - n / tau) < 0.05)
    assert(row.getLong(3) == firstNeg.toLong)
    assert(row.getDouble(2) <= n + 1e-9)
  }

  test("stat_biweight_midvariance: bounded-histogram replay; robust <= plain-ish") {
    val qs = Tables.lineitem(spark, sf).select("l_quantity").collect()
      .map(_.getDouble(0).toLong)
    val n = qs.length
    val sorted = qs.sorted
    def medOf(xs: Seq[Long]): Long = { // smallest v with 2*cum >= n
      val s0 = xs.sorted; var cum = 0L
      s0.distinct.find { v => cum += s0.count(_ == v); 2 * cum >= xs.length }.get
    }
    val m = medOf(qs)
    val mad = medOf(qs.map(q => math.abs(q - m)))
    var nq = 0L; var dq = 0L
    qs.groupBy(identity).foreach { case (q, g) =>
      val u = (q - m).toDouble / (9.0 * mad)
      if (math.abs(u) < 1) {
        nq += math.floor(g.length * (q - m).toDouble * (q - m) *
          math.pow(1 - u * u, 4) * 1e6 + 0.5).toLong
        dq += math.floor(g.length * (1 - u * u) * (1 - 5 * u * u) * 1e6 + 0.5).toLong
      }
    }
    val bw = n * (nq / 1e6) / math.pow(dq / 1e6, 2)
    val mean = qs.sum.toDouble / n
    val plain = qs.map(q => (q - mean) * (q - mean)).sum / n
    val row = queries.Extras167.statBiweightMidvariance(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == m && row.getLong(2) == mad)
    assert(math.abs(row.getDouble(3) - bw) < 1e-3)
    assert(math.abs(row.getDouble(4) - plain) < 1e-3)
  }
}
