package graft

/** Wave-128 properties: DSIR self-selection + histogram replay, Gopher
  * rules vs a token replay, winnowing density + guarantee, char
  * entropy vs a Counter replay — at sf0.001.
  */
class Extras228Spec extends SparkSpec {

  private def docs(): Array[(Long, String, Array[String])] =
    Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "split(lower(text), ' ') AS t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toArray))

  test("pipeline_dsir_weights: EN self-selects; matches the histogram replay") {
    val ds = docs()
    val bucket = Tables.documents(spark, sf)
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) AS tok")
      .selectExpr("doc_id", "CAST(conv(substring(md5(tok), 1, 2), 16, 10) AS LONG) AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val langOf = ds.map(d => d._1 -> d._2).toMap
    val src = bucket.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val tgt = bucket.filter(x => langOf(x._1) == "en")
      .groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val ts = src.values.sum.toDouble; val tt = tgt.values.sum.toDouble
    val lw = src.map { case (b, cs) =>
      b -> math.floor((math.log((tgt.getOrElse(b, 0L) + 1.0) / (tt + 256))
        - math.log((cs + 1.0) / (ts + 256))) * 1e9 + 0.5).toLong
    }
    val perDoc = bucket.groupBy(_._1).map { case (d2, xs) =>
      (langOf(d2), xs.map(x => lw(x._2)).sum, xs.length.toLong)
    }
    val expect = perDoc.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.size.toLong,
        xs.map(x => math.floor(x._2.toDouble / x._3 + 0.5).toLong).sum.toDouble / xs.size / 1e9,
        xs.count(_._2 > 0).toDouble / xs.size)
    }
    val rows = queries.Extras228.pipelineDsirWeights(spark, sf).collect()
    rows.foreach { r =>
      val (n, mlw, fs) = expect(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - mlw) < 1e-6, s"${r.getString(0)} mean lw")
      assert(math.abs(r.getDouble(3) - fs) < 1e-6)
    }
    val en = rows.find(_.getString(0) == "en").get
    val others = rows.filter(_.getString(0) != "en")
    assert(others.forall(o => en.getDouble(2) > o.getDouble(2)),
      "EN mean logweight dominates every other language (self-selection)")
  }

  test("pipeline_gopher_rules: matches the token replay; rates consistent") {
    val ds = docs()
    var (f1, f2, f3, f4, pa) = (0L, 0L, 0L, 0L, 0L)
    ds.foreach { case (_, _, t) =>
      val nw = t.length.toLong
      val tl = t.map(_.length.toLong).sum
      val alpha = t.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stop = t.count(Set("the", "be", "to", "of", "and", "that", "have", "with")).toLong
      val b1 = if (nw >= 50 && nw <= 100000) 0 else 1
      val b2 = if (3 * nw <= tl && tl <= 10 * nw) 0 else 1
      val b3 = if (5 * alpha >= 4 * nw) 0 else 1
      val b4 = if (stop >= 2) 0 else 1
      f1 += b1; f2 += b2; f3 += b3; f4 += b4
      if (b1 + b2 + b3 + b4 == 0) pa += 1
    }
    val row = queries.Extras228.pipelineGopherRules(spark, sf).collect().head
    assert(row.getLong(0) == ds.length.toLong)
    assert(row.getLong(1) == f1, "word count rule")
    assert(row.getLong(2) == f2, "mean word length rule")
    assert(row.getLong(3) == f3, "alpha ratio rule")
    assert(row.getLong(4) == f4, "stopword rule")
    assert(row.getLong(5) == pa)
    assert(math.abs(row.getDouble(6) - pa.toDouble / ds.length) < 1e-6)
  }

  test("dedup_winnowing: density near 2/(w+1); guarantee holds on a replay") {
    val row = queries.Extras228.dedupWinnowing(spark, sf).collect().head
    val (nDocs, nKgrams, nFps, density) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    assert(nDocs > 0 && nKgrams > nDocs)
    assert(nFps <= nKgrams)
    // theoretical expected density for random hashes is 2/(w+1) = 0.4;
    // dedup within a doc pushes it lower, window overlap keeps it > 1/w
    assert(density > 0.15 && density < 0.6, s"density $density")
    assert(math.abs(row.getDouble(3) - nFps.toDouble / nKgrams) < 1e-6)
    assert(row.getLong(4) >= 0 && row.getLong(5) >= 1)
    // replay ONE document end-to-end
    val ds = docs().filter(_._3.length >= 6).head
    val toks = ds._3
    val kg = toks.sliding(3).map(_.mkString(" ")).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = kg.map { g =>
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val hks = hs.zipWithIndex.map { case (h, i0) =>
      h * 16777216L + math.min(i0 + 2L, 16777215L)
    }
    val sel = (3 until hks.length).map(i => hks.slice(i - 3, i + 1).min).distinct
    val sparkSel = queries.Extras228.dedupWinnowingDocFps(spark, sf, ds._1)
    assert(sparkSel.toSet == sel.toSet, s"doc ${ds._1} fingerprints")
  }

  test("text_char_entropy: matches the Counter replay per language") {
    val cd = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "lower(text) AS t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.nonEmpty)
    val perDoc = cd.map { case (_, l, t) =>
      val n = t.codePointCount(0, t.length).toLong
      val counts = t.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      val hq = counts.map(c =>
        math.floor(c.toDouble / n * math.log(n.toDouble / c) * 1e12 + 0.5).toLong).sum
      (l, hq)
    }
    val expect = perDoc.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.map(x => BigInt(x._2)).sum.toDouble / xs.length / 1e12,
        xs.map(_._2).min / 1e12, xs.map(_._2).max / 1e12)
    }
    val rows = queries.Extras228.textCharEntropy(spark, sf).collect()
    rows.foreach { r =>
      val (n, mh, mn, mx) = expect(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} docs")
      assert(math.abs(r.getDouble(2) - mh) < 1e-6, s"${r.getString(0)} mean entropy")
      assert(math.abs(r.getDouble(3) - mn) < 1e-6)
      assert(math.abs(r.getDouble(4) - mx) < 1e-6)
      assert(r.getDouble(2) > 0, "natural text has positive char entropy")
    }
  }
}
