package graft

import org.apache.spark.sql.functions._

/** Wave-44 properties: DFT replay, TOST replay, mark-join census,
  * dedup-discounted draw replay.
  */
class Extras144Spec extends SparkSpec {

  test("multimodal_audio_spectral_centroid: brute-force DFT replay; centroid within bins") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = queries.Extras144.multimodalAudioSpectralCentroid(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    docs.filter(_._2.length >= 8).foreach { case (id, text) =>
      val vals = text.take(256).map(_.toInt.toLong)
      val nF = vals.length / 8
      val ps = (1 to 3).map { k =>
        (0 until nF).map { f =>
          val (a, b) = (0 to 7).map { j =>
            val v = BigInt(vals(f * 8 + j))
            (v * math.round(math.cos(2 * math.Pi * k * j / 8) * 1e9),
              v * math.round(math.sin(2 * math.Pi * k * j / 8) * 1e9))
          }.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
          val (ad, bd) = (a.toDouble, b.toDouble)
          ad * ad + bd * bd
        }.sum
      }
      val centroid = (1 * ps(0) + 2 * ps(1) + 3 * ps(2)) / ps.sum
      val (gn, gc) = got(id)
      assert(gn == nF.toLong, s"doc $id frames $gn vs $nF")
      assert(math.abs(gc - centroid) < 1e-4, s"doc $id: $gc vs $centroid")
      assert(gc >= 1.0 - 1e-9 && gc <= 3.0 + 1e-9)
    }
  }

  test("stat_tost_equivalence: Welch TOST replay from exact moments") {
    val m = Tables.documents(spark, sf).filter(col("lang").isin("en", "de"))
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def moments(xs: Seq[Long]) = {
      val n = xs.length
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(v => BigInt(v) * v).sum
      (n, s, q)
    }
    val (n1, s1, q1) = moments(m("en"))
    val (n2, s2, q2) = moments(m("de"))
    val diff = s1.toDouble / n1 - s2.toDouble / n2
    val se = math.sqrt(
      (BigInt(n1) * q1 - s1 * s1).toDouble / (n1.toDouble * n1 * (n1 - 1))
        + (BigInt(n2) * q2 - s2 * s2).toDouble / (n2.toDouble * n2 * (n2 - 1)))
    val row = queries.Extras144.statTostEquivalence(spark, sf).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(2) - diff) < 1e-4)
    assert(math.abs(row.getDouble(4) - (diff + 50) / se) < 1e-4)
    assert(math.abs(row.getDouble(5) - (diff - 50) / se) < 1e-4)
    // verdict consistent with its own t's
    val equivalent = (diff + 50) / se > 1.645 && (diff - 50) / se < -1.645
    assert((row.getString(6) == "equivalent_pm50") == equivalent)
  }

  test("join_exists_flag_mark: every customer exactly once; flags match a direct recompute") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val custs = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = custs.groupBy { case (ck, seg) => (seg, urgent(ck)) }
      .view.mapValues(_.size.toLong).toMap
    val got = queries.Extras144.joinExistsFlagMark(spark, sf).collect()
      .map(r => ((r.getString(0), r.getBoolean(1)), r.getLong(2))).toMap
    assert(got == expect, s"mark-join census diverges:\n$got\nvs\n$expect")
    assert(got.values.sum == custs.length.toLong, "left multiplicity corrupted")
  }

  test("sample_dedup_weighted: exact ES replay; heavy clusters not over-selected") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s2: String): String =
      md.digest(s2.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val k = docs.groupBy(t => md5hex(t._2)).view.mapValues(_.size.toLong).toMap
    val brute = docs.map { case (id, text) =>
      val u = java.lang.Long.parseLong(md5hex(s"dds:$id").substring(0, 6), 16)
        .toDouble / 16777216.0
      (id, k(md5hex(text)), math.pow(u, k(md5hex(text)).toDouble))
    }.sortBy { case (id, _, es) => (-es, id) }.take(50)
    val got = queries.Extras144.sampleDedupWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == brute.map(t => (t._1, t._2)).toSeq,
      "dedup-weighted top-50 diverges from the brute ES draw")
  }
}
