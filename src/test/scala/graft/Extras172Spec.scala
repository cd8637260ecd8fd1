package graft

import org.apache.spark.sql.functions._

/** Wave-72 properties: Ichimoku, SPRT, NB fit, vocab growth replays
  * against brute force on sf0.001.
  */
class Extras172Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def dailyBars(): Seq[(Long, Long, Long)] = // (h, l, c)
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue, cents(r.getDouble(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) =>
        val ps = xs.map(_._2)
        (ps.map(_._3).max, ps.map(_._3).min, ps.maxBy(t => (t._1, t._2))._3)
      }

  test("win_ichimoku_cloud: brute-force doubled-cents replay") {
    val bars = dailyBars().toIndexedSeq
    def hi(i: Int, n: Int) = (math.max(0, i - n + 1) to i).map(bars(_)._1).max
    def lo(i: Int, n: Int) = (math.max(0, i - n + 1) to i).map(bars(_)._2).min
    var (nA, nB, nI, tkx, nd) = (0L, 0L, 0L, 0L, 0L)
    for (i <- 77 until bars.length) {
      val c = bars(i)._3
      val t2 = hi(i, 9) + lo(i, 9); val k2 = hi(i, 26) + lo(i, 26)
      val a4 = hi(i - 26, 9) + lo(i - 26, 9) + hi(i - 26, 26) + lo(i - 26, 26)
      val b2 = hi(i - 26, 52) + lo(i - 26, 52)
      val top = math.max(a4, 2 * b2); val bot = math.min(a4, 2 * b2)
      nd += 1
      if (4 * c > top) nA += 1 else if (4 * c < bot) nB += 1 else nI += 1
      val pt2 = hi(i - 1, 9) + lo(i - 1, 9); val pk2 = hi(i - 1, 26) + lo(i - 1, 26)
      if ((t2 - k2) * (pt2 - pk2) < 0) tkx += 1
    }
    val row = queries.Extras172.winIchimokuCloud(spark, sf).collect().head
    assert(row.getLong(0) == nd)
    assert(row.getLong(1) == nA && row.getLong(2) == nB && row.getLong(3) == nI)
    assert(row.getLong(4) == tkx)
  }

  test("stat_wald_sprt: exact integer walk replay") {
    // the walk runs on DAILY REVENUE SUMS, not OHLC closes
    val cs = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val up = math.floor(math.log(0.55 / 0.45) * 1e9 + 0.5).toLong
    val dn = math.floor(math.log(0.45 / 0.55) * 1e9 + 0.5).toLong
    val bound = math.floor(math.log(19.0) * 1e9 + 0.5).toLong
    val moves = cs.sliding(2).collect { case Seq(a, b) if a != b => b > a }.toSeq
    var cum = 0L; var firstCross: Option[Long] = None
    moves.zipWithIndex.foreach { case (isUp, i) =>
      cum += (if (isUp) up else dn)
      if (firstCross.isEmpty && math.abs(cum) >= bound) firstCross = Some(i + 1L)
    }
    val row = queries.Extras172.statWaldSprt(spark, sf).collect().head
    assert(row.getLong(0) == moves.length.toLong)
    firstCross match {
      case Some(t) => assert(row.getLong(1) == t)
      case None => assert(row.isNullAt(1))
    }
    assert(math.abs(row.getDouble(2) - cum / 1e9) < 1e-6)
    val hint = if (firstCross.isEmpty) "continue"
      else if (cum >= 0) "accept_h1" else "accept_h0"
    assert(row.getString(3) == hint)
  }

  test("stat_negbin_fit: method-of-moments replay; overdispersed") {
    val ks = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .map(_.getLong(0)).groupBy(identity).values.map(_.length.toLong).toSeq
    val n = ks.length
    val m = ks.sum.toDouble / n
    val v = (BigInt(n) * ks.map(k => BigInt(k) * k).sum -
      BigInt(ks.sum) * ks.sum).toDouble / (n.toDouble * n)
    val row = queries.Extras172.statNegbinFit(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - m) < 1e-5)
    assert(math.abs(row.getDouble(2) - v / m) < 1e-4)
    assert(row.getBoolean(3) == (v > m)) // the guard matches the moments
    if (v > m) {
      assert(math.abs(row.getDouble(4) - m * m / (v - m)) < 1e-2)
      assert(math.abs(row.getDouble(5) - m / v) < 1e-5)
    } else {
      assert(row.isNullAt(4) && row.isNullAt(5)) // honest NULL params
    }
  }

  test("text_vocab_growth_curve: first-occurrence bucket replay; cum monotone") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toLong
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty).foreach { t =>
        if (!firstDoc.contains(t)) firstDoc(t) = id
      }
    }
    val expect = firstDoc.values.groupBy(id => math.min(id * 10 / nDocs, 9))
      .view.mapValues(_.size.toLong).toMap
    val got = queries.Extras172.textVocabGrowthCurve(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == expect.keySet)
    var cum = 0L
    got.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)))
      cum += r.getLong(1)
      assert(r.getLong(2) == cum)
    }
    assert(cum == firstDoc.size.toLong)
  }
}
