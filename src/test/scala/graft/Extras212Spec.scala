package graft

/** Wave-112 properties: Zipf–Mandelbrot fit quality, CDC chunk
  * coverage, exact McNemar replay, steady-state stochasticity —
  * brute-forced at sf0.001.
  */
class Extras212Spec extends SparkSpec {

  test("text_zipf_mandelbrot: best-q fit beats or ties the plain-Zipf (q=0) fit; s > 0") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val counts = toks.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }
    def fit(q: Long): (Double, Double) = {
      val pts = ranked.map { case (rk, c) =>
        (math.round(math.floor(math.log((rk + q).toDouble) * 1e9 + 0.5)),
          math.round(math.floor(math.log(c.toDouble) * 1e9 + 0.5)))
      }
      val n = pts.length.toDouble
      val sx = pts.map(p => BigInt(p._1)).sum.toDouble
      val sy = pts.map(p => BigInt(p._2)).sum.toDouble
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum.toDouble
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum.toDouble
      val syy = pts.map(p => BigInt(p._2) * p._2).sum.toDouble
      val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      (-beta, r2)
    }
    val row = queries.Extras212.textZipfMandelbrot(spark, sf).collect().head
    val qBest = row.getLong(0)
    assert(row.getLong(1) == counts.size.toLong)
    val (sB, r2B) = fit(qBest)
    assert(math.abs(row.getDouble(2) - sB) < 1e-4)
    assert(math.abs(row.getDouble(3) - r2B) < 1e-4)
    assert(r2B >= fit(0L)._2 - 1e-12, "grid argmax at least as good as q=0")
    assert(row.getDouble(2) > 0, "Zipf exponent positive")
  }

  test("dedup_cdc_chunking: chunks tile each document exactly; replay of cut rule on one doc") {
    val row = queries.Extras212.dedupCdcChunking(spark, sf).collect().head
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    // chunks tile: total chunk length == total corpus length
    val totalLen = docs.map(_.length.toLong).sum
    val meanLen = row.getDouble(3)
    val nChunks = row.getLong(1)
    assert(math.abs(meanLen * nChunks - totalLen) < nChunks, "chunks tile the corpus")
    assert(row.getLong(2) <= nChunks)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1)
    // replay the cut rule on the first doc
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val text = docs.head
    val cuts = (8 to text.length).filter { p =>
      java.lang.Long.parseLong(md5hex(text.substring(p - 8, p)).substring(0, 4), 16) % 64 == 0
    }
    val bounds = (Seq(1L) ++ cuts.map(_ + 1L), cuts.map(_.toLong) ++ Seq(text.length.toLong))
    val lens = bounds._1.zip(bounds._2).filter { case (s0, e) => e >= s0 }.map { case (s0, e) => e - s0 + 1 }
    assert(lens.sum == text.length.toLong, "first doc tiles exactly")
  }

  test("stat_mcnemar_exact: p in (0,1]; matches normal approx direction on large discordants") {
    val per = Tables.orders(spark, sf).selectExpr("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).values.toSeq.map { g =>
        (g.exists(_._2 == "1-URGENT"), g.exists(_._2 == "5-LOW"))
      }
    val b = per.count { case (e, l) => e && !l }.toLong
    val c = per.count { case (e, l) => !e && l }.toLong
    val row = queries.Extras212.statMcnemarExact(spark, sf).collect().head
    assert(row.getLong(0) == b && row.getLong(1) == c)
    val p = row.getDouble(2)
    assert(p >= 0 && p <= 1.0)
    assert(b > 0 && c > 0, "paired design nondegenerate")
    // normal approximation agreement on the reject decision when far from the boundary
    val z = (b - c).toDouble / math.sqrt((b + c).toDouble)
    val approxP = 2 * (1 - 0.5 * (1 + erf(math.abs(z) / math.sqrt(2))))
    if (math.abs(approxP - 0.05) > 0.02)
      assert(row.getBoolean(3) == (approxP < 0.05), s"exact vs approx: $p vs $approxP")
  }

  private def erf(x: Double): Double = {
    // Abramowitz-Stegun 7.1.26 — plenty for a direction check
    val t = 1.0 / (1.0 + 0.3275911 * x)
    1 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t
      + 0.254829592) * t * math.exp(-x * x)
  }

  test("analytics_markov_steady_state: probabilities sum to 1 and iteration converged") {
    val rows = queries.Extras212.analyticsMarkovSteadyState(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"steady distribution sums to $total")
    rows.foreach(r => assert(r.getDouble(1) >= 0))
    assert(rows.head.getDouble(2) < 1e-6, "64 iterations converged (last L1 step tiny)")
  }
}
