package graft

/** Wave-110 properties: multiprobe candidate-set algebra, RQ
  * monotonicity, crest-factor byte replay, Bloom prescreen counts —
  * brute-forced at sf0.001.
  */
class Extras210Spec extends SparkSpec {

  test("sim_lsh_multiprobe: multi superset of single; top1 matches exact scan over candidates") {
    val rows = queries.Extras210.simLshMultiprobe(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "single-probe candidates ⊆ multiprobe candidates")
      assert(r.getLong(2) > 0 && !r.isNullAt(3))
      assert(math.abs(r.getDouble(4)) <= 64.0)
    }
  }

  test("embed_residual_quantize: stage-2 never worse (zero codeword); brute-force stage-1 MSE") {
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cb1 = embs.filter(_._1 < 16).sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      for (i <- 0 until 64) acc += math.pow(a(i).toDouble - b(i).toDouble, 2)
      acc
    }
    val q1sum = embs.map { case (_, v) =>
      val best = cb1.map { case (cid, c) => (d2(v, c), cid) }.min
      BigInt(math.floor(best._1 * 1e6).toLong)
    }.sum
    val row = queries.Extras210.embedResidualQuantize(spark, sf).collect().head
    assert(row.getLong(0) == embs.length.toLong)
    assert(math.abs(row.getDouble(1) - q1sum.toDouble / 1e6 / embs.length) < 1e-5)
    assert(row.getDouble(2) <= row.getDouble(1) + 1e-9, "zero codeword guarantees no regression")
    assert(row.getDouble(3) >= -1e-9)
  }

  test("multimodal_audio_crest: per-doc byte replay of peak/RMS") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perLang = docs.groupBy(_._1).map { case (lang, g) =>
      val cqs = g.map { case (_, text) =>
        val bytes = text.getBytes("UTF-8")
        var peak = 0L; var sumsq = 0L
        bytes.foreach { b =>
          val v = (b & 0xff) - 128L
          if (math.abs(v) > peak) peak = math.abs(v)
          sumsq += v * v
        }
        if (bytes.isEmpty || sumsq == 0) 0L
        else math.floor(peak.toDouble * 1e6 / math.sqrt(sumsq.toDouble / bytes.length)).toLong
      }
      lang -> (g.length.toLong, cqs.map(BigInt(_)).sum, cqs.max)
    }
    val rows = queries.Extras210.multimodalAudioCrest(spark, sf).collect()
    rows.foreach { r =>
      val (n, scq, maxcq) = perLang(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - scq.toDouble / 1e6 / n) < 1e-5)
      assert(math.abs(r.getDouble(3) - maxcq.toDouble / 1e6) < 1e-6)
      assert(r.getDouble(2) >= 1.0, "crest factor >= 1 by Cauchy-Schwarz")
    }
  }

  test("dedup_bloom_prescreen: sequential min-setter replay; measured <= end-state theory band") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val withPos = docs.map { case (id, text) =>
      val h = md5hex(text)
      val ps = Seq(h.substring(0, 3), h.substring(5, 8), h.substring(10, 13))
        .map(x => java.lang.Long.parseLong(x, 16) % 4096)
      (id, h, ps)
    }
    val minSetter = withPos.flatMap { case (id, _, ps) => ps.map(p => (p, id)) }
      .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).min }
    val flagged = withPos.count { case (id, _, ps) => ps.forall(p => minSetter(p) < id) }
    val firstOf = withPos.groupBy(_._2).map { case (h, g) => h -> g.map(_._1).min }
    val dups = withPos.count { case (id, h, _) => id > firstOf(h) }
    val fps = withPos.count { case (id, h, ps) =>
      ps.forall(p => minSetter(p) < id) && id == firstOf(h)
    }
    val row = queries.Extras210.dedupBloomPrescreen(spark, sf).collect().head
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(1) == dups.toLong)
    assert(row.getLong(2) == flagged.toLong)
    assert(row.getLong(3) == fps.toLong)
    assert(row.getDouble(4) <= row.getDouble(5) + 0.02,
      "sequential-insert FP rate sits at or below the end-state theory line")
  }
}
