package graft

import org.apache.spark.sql.functions._

/** Wave-81 properties: LIX, lexicon sentiment, Dixon Q, Tietjen–Moore
  * replayed against brute force on sf0.001.
  */
class Extras181Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daySeries(): Array[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime).map(_._2).toArray

  test("text_lix_readability: per-doc LIX replay") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues { g =>
      val qs = g.flatMap { case (_, text) =>
        val toks = "[A-Za-z]+".r.findAllIn(text).toSeq
        val sent = math.max(text.count(c => c == '.' || c == '!' || c == '?'), 1)
        val w = toks.size; val lw = toks.count(_.length >= 7)
        if (w > 0) Some(math.floor((w.toDouble / sent + 100.0 * lw / w) * 1e6 + 0.5).toLong)
        else None
      }
      (qs.size.toLong, qs.sum.toDouble / qs.size / 1e6)
    }.toMap
    val got = queries.Extras181.textLixReadability(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, lix) = byLang(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - lix) < 1e-3)
    }
  }

  test("text_lexicon_sentiment: per-doc lexicon score replay") {
    val pos = Set("good", "great", "excellent", "happy", "love", "best", "nice", "win")
    val neg = Set("bad", "terrible", "awful", "sad", "hate", "worst", "poor", "lose")
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq))
    val bySrc = docs.groupBy(_._1).view.mapValues { g =>
      val scored = g.map { case (_, toks) =>
        val p = toks.count(pos); val n = toks.count(neg)
        (math.floor((p - n).toDouble / (p + n + 1) * 1e6 + 0.5).toLong, p > n)
      }
      (g.size.toLong, scored.map(_._1).sum.toDouble / g.size / 1e6,
        scored.count(_._2).toDouble / g.size)
    }.toMap
    val top = bySrc.toSeq.sortBy(t => (-t._2._1, t._1)).take(5)
    val got = queries.Extras181.textLexiconSentiment(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == top.map(_._1))
    got.foreach { r =>
      val (n, ms, ps) = bySrc(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - ms) < 1e-5)
      assert(math.abs(r.getDouble(3) - ps) < 1e-5)
    }
  }

  test("stat_dixon_q: order-statistic replay; Q in [0,1]") {
    val x = daySeries().sorted
    val row = queries.Extras181.statDixonQ(spark, sf).collect().head
    assert(row.getLong(0) == x.length.toLong)
    val range = (x.last - x.head).toDouble
    assert(math.abs(row.getDouble(3) - (x.last - x(x.length - 2)) / range) < 1e-6)
    assert(math.abs(row.getDouble(4) - (x(1) - x.head) / range) < 1e-6)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1)
  }

  test("stat_tietjen_moore: trim-3 SS ratio replay; E in (0,1]") {
    val x = daySeries().map(_.toDouble)
    val n = x.length
    val mean = x.sum / n
    val keep = x.sortBy(v => -math.abs(v - mean)).drop(3)
    val mk = keep.sum / keep.length
    val e = keep.map(v => (v - mk) * (v - mk)).sum / x.map(v => (v - mean) * (v - mean)).sum
    val row = queries.Extras181.statTietjenMoore(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getInt(1) == 3)
    assert(math.abs(row.getDouble(2) - e) < 1e-4)
    assert(row.getDouble(2) > 0 && row.getDouble(2) <= 1)
  }
}
