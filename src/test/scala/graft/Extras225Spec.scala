package graft

/** Wave-125 properties: MRR/MAP vs a driver-side full ranking, ROUGE
  * vs a per-pair clipped-overlap replay, FS weights vs histogram
  * algebra — at sf0.001.
  */
class Extras225Spec extends SparkSpec {

  private def parts(): Array[(String, Long, Long, Boolean)] =
    Tables.part(spark, sf)
      .selectExpr("p_brand", "p_partkey",
        "CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS pr",
        "p_size > 25 AS rel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("analytics_mrr: matches the full-ranking replay") {
    val byBrand = parts().groupBy(_._1).map { case (b, xs) =>
      b -> xs.sortBy(x => (-x._3, x._2)).toSeq
    }
    val ranks = byBrand.values.flatMap { xs =>
      val i = xs.indexWhere(_._4)
      if (i >= 0) Some((i + 1).toLong) else None
    }.toSeq
    val mrr = ranks.map(r => 1000000000L / r).sum.toDouble / ranks.length / 1e9
    val row = queries.Extras225.analyticsMrr(spark, sf).collect().head
    assert(row.getLong(0) == ranks.length.toLong)
    assert(math.abs(row.getDouble(1) - mrr) < 1e-6, s"mrr ${row.getDouble(1)} vs $mrr")
    assert(math.abs(row.getDouble(2) - ranks.sum.toDouble / ranks.length) < 0.01)
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1)
  }

  test("analytics_map_at_k: matches the full-ranking AP@10 replay") {
    val byBrand = parts().groupBy(_._1).map { case (b, xs) =>
      b -> xs.sortBy(x => (-x._3, x._2)).toSeq
    }
    val per = byBrand.values.map { xs =>
      val nrel = xs.count(_._4)
      val top = xs.take(10)
      var cum = 0L; var apnum = 0L
      top.zipWithIndex.foreach { case (x, i0) =>
        if (x._4) { cum += 1; apnum += cum * (2520L / (i0 + 1)) }
      }
      val rel10 = top.count(_._4).toLong
      val apq = if (nrel == 0) 0L
      else math.floor(apnum.toDouble / 2520 / math.min(nrel, 10) * 1e9 + 0.5).toLong
      val recq = if (nrel == 0) 0L
      else math.floor(rel10.toDouble / nrel * 1e9 + 0.5).toLong
      (apq, rel10, recq)
    }.toSeq
    val n = per.length
    val row = queries.Extras225.analyticsMapAtK(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - per.map(_._1).sum.toDouble / n / 1e9) < 1e-6, "MAP@10")
    assert(math.abs(row.getDouble(2) - per.map(_._2).sum.toDouble / n / 10) < 1e-6, "P@10")
    assert(math.abs(row.getDouble(3) - per.map(_._3).sum.toDouble / n / 1e9) < 1e-6, "R@10")
    assert(row.getDouble(1) <= 1 && row.getDouble(2) <= 1 && row.getDouble(3) <= 1)
  }

  test("text_rouge_n: matches the per-pair clipped-overlap replay") {
    // collect Spark's OWN token arrays (the replay checks the clipped-
    // overlap math, not the tokenizer — JVM regex split and Spark's
    // split differ on edge whitespace)
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(lower(text), ' ') AS t")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray)).toMap
    def counts(toks: Array[String], n: Int): Map[Seq[String], Long] =
      if (n == 1) toks.map(Seq(_)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      else if (toks.length < 2) Map.empty
      else toks.sliding(2).map(_.toSeq).toSeq.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def corpus(n: Int): (Long, Double, Double) = {
      val pairs = docs.keys.filter(k => docs.contains(k + 1)).toSeq
        .map(k => (counts(docs(k), n), counts(docs(k + 1), n)))
        .filter { case (c, r) => c.nonEmpty && r.nonEmpty }
      val qs = pairs.map { case (c, r) =>
        // iterate entries, not the key SET (a Set.map would dedupe equal counts)
        val ov = c.toSeq.map { case (g, cc) => math.min(cc, r.getOrElse(g, 0L)) }.sum
        val ct = c.values.sum; val rt = r.values.sum
        val rec = math.floor(ov.toDouble / rt * 1e9 + 0.5).toLong
        val f1 = math.floor((if (ov == 0) 0.0 else 2.0 * ov / (ct + rt)) * 1e9 + 0.5).toLong
        (rec, f1)
      }
      (qs.length.toLong, qs.map(_._1).sum.toDouble / qs.length / 1e9,
        qs.map(_._2).sum.toDouble / qs.length / 1e9)
    }
    val (n1, rec1, f11) = corpus(1)
    val (_, rec2, f12) = corpus(2)
    val row = queries.Extras225.textRougeN(spark, sf).collect().head
    assert(row.getLong(0) == n1)
    assert(math.abs(row.getDouble(1) - rec1) < 1e-6, "rouge1 recall")
    assert(math.abs(row.getDouble(2) - f11) < 1e-6, "rouge1 f1")
    assert(math.abs(row.getDouble(3) - rec2) < 1e-6, "rouge2 recall")
    assert(math.abs(row.getDouble(4) - f12) < 1e-6, "rouge2 f1")
    assert(row.getDouble(2) >= row.getDouble(4) - 1e-9, "bigram overlap <= unigram overlap (heuristic)")
  }

  test("dedup_fellegi_sunter: matches histogram algebra; weights monotone in agreements") {
    val p = Tables.part(spark, sf).selectExpr("p_brand", "p_type", "CAST(p_size AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def u(xs: Seq[String]): Double = {
      val n = xs.length.toDouble
      xs.groupBy(identity).values.map(v => v.length.toDouble * (v.length - 1)).sum / (n * (n - 1))
    }
    val ub = u(p.map(_._1).toSeq); val ut = u(p.map(_._2).toSeq); val us = u(p.map(_._3).toSeq)
    def lg2(x: Double) = math.log(x) / math.log(2)
    val rows = queries.Extras225.dedupFellegiSunter(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (ab, at, as_) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val w = (if (ab == 1) lg2(0.95 / ub) else lg2(0.05 / (1 - ub))) +
        (if (at == 1) lg2(0.90 / ut) else lg2(0.10 / (1 - ut))) +
        (if (as_ == 1) lg2(0.85 / us) else lg2(0.15 / (1 - us)))
      assert(math.abs(r.getDouble(4) - w) < 1e-4, s"pattern ${r.getLong(0)}")
      val band = if (w >= 6) "match" else if (w <= -6) "non_match" else "possible"
      assert(r.getString(5) == band)
    }
    val w0 = rows.find(_.getLong(0) == 0L).get.getDouble(4)
    val w7 = rows.find(_.getLong(0) == 7L).get.getDouble(4)
    assert(w7 > w0, "all-agree outweighs all-disagree")
  }
}
