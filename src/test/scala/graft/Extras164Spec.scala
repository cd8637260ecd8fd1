package graft

import org.apache.spark.sql.functions._

/** Wave-64 properties: generalized ESD, Watson U², magic bytes,
  * Kelly replays against brute force on sf0.001.
  */
class Extras164Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daily(): Seq[(java.sql.Timestamp, Long)] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime)

  test("stat_generalized_esd: 5-round iterated-Grubbs replay") {
    var rem = daily()
    val expect = (1 to 5).map { k =>
      val n = rem.length
      val mean = rem.map(x => BigInt(x._2)).sum.toDouble / n
      val sc = rem.map(x => BigInt(x._2)).sum
      val qc = rem.map(x => BigInt(x._2) * x._2).sum
      val sigma = math.sqrt((BigInt(n) * qc - sc * sc).toDouble / (n.toDouble * n))
      val worst = rem.maxBy(x => (math.abs(x._2 - mean), x._1.getTime))
      val r = math.abs(worst._2 - mean) / sigma
      rem = rem.filterNot(_._1 == worst._1)
      (k.toLong, worst._1.toLocalDateTime.toLocalDate, r, r > 3.5)
    }
    val got = queries.Extras164.statGeneralizedEsd(spark, sf).collect()
    assert(got.length == 5)
    got.zip(expect).foreach { case (g, (k, day, r, fl)) =>
      assert(g.getLong(0) == k)
      assert(g.getString(1) == day.toString)
      assert(math.abs(g.getDouble(2) - r) < 1e-3)
      assert(g.getBoolean(3) == fl)
    }
  }

  test("stat_watson_u2: per-row textbook U2 within quantization tolerance") {
    val doys = Tables.orders(spark, sf)
      .select(dayofyear(col("o_orderdate")).as("doy")).collect()
      .map(_.getInt(0)).sorted
    val n = doys.length
    val us = doys.map(d0 => (2.0 * d0 - 1) / 732)
    val ubar = us.sum / n
    val u2 = us.zipWithIndex.map { case (u, i0) =>
      math.pow(u - (2.0 * (i0 + 1) - 1) / (2 * n), 2)
    }.sum + 1.0 / (12 * n) - n * (ubar - 0.5) * (ubar - 0.5)
    val row = queries.Extras164.statWatsonU2(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - u2) < 1e-3)
    assert(row.getBoolean(2) == (u2 > 0.187))
  }

  test("scan_magic_bytes: real containers classify by parity; sizes match") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the codec really emits the advertised magic
    docs.take(4).foreach { case (id, _, text) =>
      val payload = text.getBytes("UTF-8")
      if (id % 2 == 0) {
        val b = sources.MediaCodec.encodePng(payload)
        assert((b(0) & 0xff) == 0x89 && b(1) == 'P')
      } else {
        val b = sources.MediaCodec.encodeWav(payload)
        assert(b(0) == 'R' && b(1) == 'I')
      }
    }
    val expect = docs.groupBy(d0 => (if (d0._1 % 2 == 0) "png" else "wav", d0._2))
      .view.mapValues(xs =>
        (xs.length.toLong, xs.map(_._3.getBytes("UTF-8").length.toLong).sum)).toMap
    val got = queries.Extras164.scanMagicBytes(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    got.foreach { r =>
      val (nd, pb) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == nd && r.getLong(3) == pb)
    }
  }

  test("win_kelly_fraction: quantized win/loss replay") {
    val days = daily().map(_._2)
    val rqs = days.sliding(2).map { case Seq(a, b) =>
      math.floor((b.toDouble - a) / a * 1e6 + 0.5).toLong
    }.filter(_ != 0).toSeq
    val n = rqs.length; val nw = rqs.count(_ > 0)
    val p = nw.toDouble / n
    val b = rqs.filter(_ > 0).sum.toDouble / nw / 1e6
    val a = -rqs.filter(_ < 0).sum.toDouble / (n - nw) / 1e6
    val kelly = (p * b - (1 - p) * a) / (a * b)
    val row = queries.Extras164.winKellyFraction(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == nw.toLong)
    assert(math.abs(row.getDouble(2) - p) < 1e-5)
    assert(math.abs(row.getDouble(3) - b) < 1e-5)
    assert(math.abs(row.getDouble(4) - a) < 1e-5)
    assert(math.abs(row.getDouble(5) - kelly) < 1e-3)
  }
}
