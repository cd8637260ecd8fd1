package graft

import org.apache.spark.sql.functions._

/** Wave-59 properties: Tarone, CKA, business days, WAV clipping
  * replays against definitional brute force on sf0.001.
  */
class Extras159Spec extends SparkSpec {

  test("stat_tarone_overdispersion: textbook statistic replay") {
    val units = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1) == "R"))
      .groupBy(_._1).view.mapValues(v => (v.length.toLong, v.count(_._2).toLong))
      .values.toSeq
    val n = units.map(_._1).sum
    val x = units.map(_._2).sum
    val ss = units.map { case (ni, xi) =>
      val d0 = BigInt(xi) * n - BigInt(ni) * x; d0 * d0
    }.sum
    val sStat = ss.toDouble / (x.toDouble * (n - x))
    val nn1 = units.map { case (ni, _) => ni * (ni - 1) }.sum
    val z = (sStat - n) / math.sqrt(2.0 * nn1)
    val row = queries.Extras159.statTarone(spark, sf).collect().head
    assert(row.getLong(0) == units.length.toLong)
    assert(math.abs(row.getDouble(1) - x.toDouble / n) < 1e-5)
    assert(math.abs(row.getDouble(2) - sStat) < 1e-2)
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
    assert(row.getBoolean(4) == (math.abs(z) > 1.96))
  }

  test("embed_cka_linear: quantized-cell replay; CKA in (0,1]") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(v =>
        BigInt(math.floor(v.toDouble * 1e9 + 0.5).toLong)).toArray)
    val n = vecs.length
    val dims = 64
    val sums = Array.tabulate(dims)(j => vecs.map(_(j)).sum)
    def cq(i: Int, j: Int): BigInt = {
      val m = vecs.map(v => v(i) * v(j)).sum
      (BigInt(n) * m - sums(i) * sums(j)) / BigInt("1000000000000")
    }
    var sab = BigInt(0); var saa = BigInt(0); var sbb = BigInt(0)
    for (i <- 0 until dims; j <- 0 until dims) {
      val c = cq(i, j)
      if (i < 32 && j >= 32) sab += c * c
      else if (i < 32 && j < 32) saa += c * c
      else if (i >= 32 && j >= 32) sbb += c * c
    }
    val cka = sab.toDouble / (math.sqrt(saa.toDouble) * math.sqrt(sbb.toDouble))
    val row = queries.Extras159.embedCkaLinear(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - cka) < 1e-5)
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1.0 + 1e-9)
  }

  test("date_add_business_days: no weekend dues; brute-force walk agrees") {
    val dates = Tables.orders(spark, sf).select("o_orderdate").collect()
      .map(_.getAs[java.time.LocalDateTime](0).toLocalDate)
    def walk(d0: java.time.LocalDate): java.time.LocalDate = {
      var cur = d0
      while (cur.getDayOfWeek.getValue >= 6) cur = cur.plusDays(1)
      var left = 10
      while (left > 0) {
        cur = cur.plusDays(1)
        if (cur.getDayOfWeek.getValue <= 5) left -= 1
      }
      cur
    }
    val expect = dates.map { d0 =>
      val due = walk(d0)
      (due.getDayOfWeek.getValue - 1, // Monday=0
        java.time.temporal.ChronoUnit.DAYS.between(d0, due))
    }
    val byWd = expect.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max)).toMap
    assert(byWd.keySet.forall(_ <= 4)) // never a weekend due date
    val got = queries.Extras159.dateAddBusinessDays(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet == byWd.keySet)
    got.foreach { r =>
      val (cnt, mn, mx) = byWd(r.getInt(0))
      assert(r.getLong(1) == cnt)
      assert(r.getLong(2) == mn && r.getLong(3) == mx)
    }
  }

  test("multimodal_audio_clipping: byte census through the real WAV codec") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val per = docs.map { case (id, lang, text) =>
      val payload = text.getBytes("UTF-8")
      val blob = sources.MediaCodec.encodeWav(payload)
      val pcm = sources.MediaCodec.decodePayload(id, blob)
      assert(pcm.sameElements(payload))
      val clipped = pcm.count(b => { val u = b & 0xff; u <= 5 || u >= 250 }).toLong
      (lang, pcm.length.toLong, clipped,
        if (pcm.isEmpty) 0L else clipped * 1000000L / pcm.length)
    }
    val got = queries.Extras159.multimodalAudioClipping(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == per.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val g = per.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._2).sum)
      assert(r.getLong(3) == g.map(_._3).sum)
      assert(math.abs(r.getDouble(4) - g.map(_._3).sum.toDouble / g.map(_._2).sum) < 1e-5)
      assert(r.getLong(5) == g.map(_._4).max)
    }
  }
}
