package graft

/** Wave-126 properties: matrix profile vs an O(n²m) driver replay,
  * corpus BLEU vs a Counter replay, rank-biserial vs sequential signed
  * ranks, and AJ vs a day-by-day sequential estimator — at sf0.001.
  */
class Extras226Spec extends SparkSpec {

  test("time_matrix_profile: matches the brute-force z-normalized profile") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS STRING) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray
    val n = ms.length; val m = 6
    val ns = n - m + 1
    def mom(i: Int) = {
      val w = ms.slice(i, i + m)
      (w.map(BigInt(_)).sum, w.map(x => BigInt(x) * x).sum)
    }
    def dq(i: Int, j: Int): Long = {
      val (s1, s2) = mom(i); val (t1, t2) = mom(j)
      val dot = (0 until m).map(k => BigInt(ms(i + k)) * ms(j + k)).sum
      val va = 6 * s2.toDouble - s1.toDouble * s1.toDouble
      val vb = 6 * t2.toDouble - t1.toDouble * t1.toDouble
      val d2 = if (va <= 0 || vb <= 0) 12.0
      else 12 * (1 - (6 * dot.toDouble - s1.toDouble * t1.toDouble) /
        (math.sqrt(va) * math.sqrt(vb)))
      math.floor(d2 * 1e9 + 0.5).toLong
    }
    val prof = (0 until ns).map { i =>
      val cand = (0 until ns).filter(j => math.abs(i - j) > 3)
      val md = cand.map(j => dq(i, j)).min
      val nj = cand.filter(j => dq(i, j) == md).min
      (i + 1L, md, nj + 1L)
    }
    val motif = prof.minBy(p => (p._2, p._1))
    val discord = prof.maxBy(p => (p._2, -p._1))
    val row = queries.Extras226.timeMatrixProfile(spark, sf).collect().head
    assert(row.getLong(0) == ns.toLong)
    assert(row.getLong(1) == motif._1, s"motif i ${row.getLong(1)} vs ${motif._1}")
    assert(row.getLong(2) == motif._3, "motif j")
    assert(math.abs(row.getDouble(3) - motif._2 / 1e9) < 1e-6)
    assert(row.getLong(4) == discord._1, s"discord i ${row.getLong(4)} vs ${discord._1}")
    assert(math.abs(row.getDouble(5) - discord._2 / 1e9) < 1e-6)
    assert(row.getDouble(3) <= row.getDouble(5), "motif is nearer than the discord")
  }

  test("text_bleu: matches the corpus Counter replay; bleu <= sqrt(p1*p2)") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(lower(text), ' ') AS t")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray)).toMap
    def counts(toks: Array[String], n: Int): Map[Seq[String], Long] =
      if (n == 1) toks.map(Seq(_)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      else if (toks.length < 2) Map.empty
      else toks.sliding(2).map(_.toSeq).toSeq.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val pairs = docs.keys.filter(k => docs.contains(k + 1)).toSeq.sorted
    def level(n: Int): (Long, Long) = {
      var clip = 0L; var tot = 0L
      pairs.foreach { k =>
        val c = counts(docs(k), n); val r = counts(docs(k + 1), n)
        clip += c.toSeq.map { case (g, cc) => math.min(cc, r.getOrElse(g, 0L)) }.sum
        tot += c.values.sum
      }
      (clip, tot)
    }
    val (c1, t1) = level(1); val (c2, t2) = level(2)
    val clen = pairs.map(k => docs(k).length.toLong).sum
    val rlen = pairs.map(k => docs(k + 1).length.toLong).sum
    val bp = if (clen >= rlen) 1.0 else math.exp(1.0 - rlen.toDouble / clen)
    val bleu = if (c1 == 0 || c2 == 0) 0.0
    else bp * math.exp((math.log(c1.toDouble / t1) + math.log(c2.toDouble / t2)) / 2)
    val row = queries.Extras226.textBleu(spark, sf).collect().head
    assert(row.getLong(0) == pairs.length.toLong)
    assert(math.abs(row.getDouble(1) - c1.toDouble / t1) < 1e-6, "p1")
    assert(math.abs(row.getDouble(2) - c2.toDouble / t2) < 1e-6, "p2")
    assert(math.abs(row.getDouble(3) - bp) < 1e-6, "brevity penalty")
    assert(math.abs(row.getDouble(4) - bleu) < 1e-6, s"bleu ${row.getDouble(4)} vs $bleu")
    assert(row.getDouble(4) <= math.sqrt(row.getDouble(1) * row.getDouble(2)) + 1e-9)
  }

  test("stat_rank_biserial: matches sequential signed ranks with tie-averages") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) * 10000000000L + o_orderkey AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dd = orders.groupBy(_._1).filter(_._2.length >= 2).map { case (c, xs) =>
      val srt = xs.sortBy(_._2)
      (c, srt.last._3 - srt.head._3)
    }.filter(_._2 != 0L).toSeq
    val ranked = dd.sortBy(x => (math.abs(x._2), x._1)).zipWithIndex
      .map { case ((c, d), i0) => (c, d, math.abs(d), i0 + 1L) }
    val byAd = ranked.groupBy(_._3).map { case (ad, xs) =>
      ad -> (xs.map(_._4).min + xs.map(_._4).max)
    }
    var w2p = BigInt(0); var w2m = BigInt(0)
    ranked.foreach { case (_, d, ad, _) =>
      if (d > 0) w2p += byAd(ad) else w2m += byAd(ad)
    }
    val r = (w2p.toDouble - w2m.toDouble) / (w2p.toDouble + w2m.toDouble)
    val row = queries.Extras226.statRankBiserial(spark, sf).collect().head
    assert(row.getLong(0) == dd.length.toLong)
    assert(math.abs(row.getDouble(1) - w2p.toDouble / 2) < 0.6, "W+")
    assert(math.abs(row.getDouble(2) - w2m.toDouble / 2) < 0.6, "W-")
    assert(math.abs(row.getDouble(3) - r) < 1e-6, s"r_rb ${row.getDouble(3)} vs $r")
    assert(row.getDouble(3) >= -1 && row.getDouble(3) <= 1)
  }

  test("stat_aalen_johansen: matches the sequential estimator; CIFs + S sum to 1") {
    val base = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        Seq("l_orderkey"))
      .selectExpr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS t0", "l_returnflag")
      .filter("t0 >= 1")
      .collect().map(r => (math.min(r.getLong(0), 121L),
        if (r.getLong(0) > 120) 0 else if (r.getString(1) == "R") 1 else 2))
    val days = base.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2 == 1).toLong, xs.count(_._2 == 2).toLong, xs.length.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = base.length.toLong
    var lnS = 0L
    var (c30, c60, c120, k120, ln120) = (0L, 0L, 0L, 0L, 0L)
    days.foreach { case (t, d1, d2, dall) =>
      val lnq = if (atRisk - d1 - d2 <= 0) -27631021115929L
      else math.floor(math.log((atRisk - d1 - d2).toDouble / atRisk) * 1e12 + 0.5).toLong
      val sPrev = math.exp(lnS / 1e12)
      val i1 = math.floor(sPrev * d1.toDouble / atRisk * 1e12 + 0.5).toLong
      val i2 = math.floor(sPrev * d2.toDouble / atRisk * 1e12 + 0.5).toLong
      if (t <= 30) c30 += i1
      if (t <= 60) c60 += i1
      if (t <= 120) { c120 += i1; k120 += i2; ln120 += lnq }
      lnS += lnq
      atRisk -= dall
    }
    val row = queries.Extras226.statAalenJohansen(spark, sf).collect().head
    assert(row.getLong(0) == base.length.toLong)
    assert(math.abs(row.getDouble(1) - c30 / 1e12) < 1e-6, "CIF return 30")
    assert(math.abs(row.getDouble(2) - c60 / 1e12) < 1e-6, "CIF return 60")
    assert(math.abs(row.getDouble(3) - c120 / 1e12) < 1e-6, "CIF return 120")
    assert(math.abs(row.getDouble(4) - k120 / 1e12) < 1e-6, "CIF kept 120")
    assert(math.abs(row.getDouble(5) - math.exp(ln120 / 1e12)) < 1e-6, "KM 120")
    val total = row.getDouble(3) + row.getDouble(4) + row.getDouble(5)
    assert(math.abs(total - 1.0) < 1e-3, s"CIF1+CIF2+S = $total should be ~1")
    assert(row.getDouble(1) <= row.getDouble(2) && row.getDouble(2) <= row.getDouble(3),
      "CIF monotone in the horizon")
  }
}
