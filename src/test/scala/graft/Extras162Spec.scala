package graft

import org.apache.spark.sql.functions._

/** Wave-62 properties: Kendall W, log-odds, Youden, alignment/
  * uniformity replays against brute force on sf0.001.
  */
class Extras162Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_kendall_w: definitional rank-sum concordance replay") {
    val cells = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"),
        col("l_extendedprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val years = cells.keys.map(_._1).toSeq.distinct.sorted
    val quarters = cells.keys.map(_._2).toSeq.distinct.sorted
    val rsum = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    quarters.foreach { q =>
      years.sortBy(y => (cells((y, q)), y)).zipWithIndex.foreach { case (y, i) =>
        rsum(y) += i + 1
      }
    }
    val k = years.length; val m = quarters.length
    val rbar = m.toDouble * (k + 1) / 2
    val ss = years.map(y => math.pow(rsum(y) - rbar, 2)).sum
    val w = 12 * ss / (m.toDouble * m * (k.toDouble * k * k - k))
    val row = queries.Extras162.statKendallW(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong && row.getLong(1) == m.toLong)
    assert(math.abs(row.getDouble(2) - w) < 1e-5)
    assert(math.abs(row.getDouble(3) - m * (k - 1) * w) < 1e-3)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
  }

  test("text_log_odds_dirichlet: per-token closed-form replay of the top rows") {
    val toks = Tables.documents(spark, sf)
      .filter(col("lang").isin("en", "de"))
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val byTok = toks.groupBy(_._2).view.mapValues { xs =>
      (xs.count(_._1 == "en").toLong, xs.count(_._1 == "de").toLong)
    }.toMap
    val ne = byTok.values.map(_._1).sum; val nd = byTok.values.map(_._2).sum
    val na = ne + nd
    def z(t: String): (Double, Double) = {
      val (ye, yd) = byTok(t)
      val aw = 500.0 * (ye + yd) / na
      val de0 = math.log((ye + aw) / (ne + 500.0 - ye - aw)) -
        math.log((yd + aw) / (nd + 500.0 - yd - aw))
      (de0, de0 / math.sqrt(1.0 / (ye + aw) + 1.0 / (yd + aw)))
    }
    val expect = byTok.keys.toSeq
      .map(t => (t, z(t)._2)).sortBy(x => (-math.abs(x._2), x._1)).take(8)
    val got = queries.Extras162.textLogOddsDirichlet(spark, sf).collect()
    assert(got.length == 8)
    got.zip(expect).foreach { case (r, (t, zv)) =>
      assert(r.getString(0) == t)
      val (ye, yd) = byTok(t)
      assert(r.getLong(1) == ye && r.getLong(2) == yd)
      assert(math.abs(r.getDouble(4) - zv) < 1e-3)
    }
  }

  test("stat_youden_optimal_cutpoint: exhaustive threshold scan replay") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_returnflag").collect()
      .map(r => (cents(r.getDouble(0)), if (r.getString(1) == "R") 1L else 0L))
    val n = rows.length.toLong; val p = rows.map(_._2).sum
    val byV = rows.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toSeq.sortBy(_._1)
    var cl = 0L; var pl = 0L
    var bestJ = Double.NegativeInfinity; var bestV = Long.MaxValue
    byV.foreach { case (v, (cnt, pos)) =>
      cl += cnt; pl += pos
      if (cl < n) {
        val j = (p - pl).toDouble / p - (n - cl - (p - pl)).toDouble / (n - p)
        if (j > bestJ || (j == bestJ && v < bestV)) { bestJ = j; bestV = v }
      }
    }
    val row = queries.Extras162.statYoudenOptimalCutpoint(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - bestV.toDouble / 100) < 1e-9)
    assert(math.abs(row.getDouble(1) - bestJ) < 1e-5)
  }

  test("embed_alignment_uniformity: closed-form alignment equals brute pairs; uniformity replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray))
    val dims = vecs.head._3.length
    // brute-force within-label mean pairwise squared distance
    val byLabel = vecs.groupBy(_._2).filter(_._2.length > 1)
    val aligns = byLabel.map { case (_, g) =>
      val ps = for (i <- g.indices; j <- g.indices if i != j) yield
        (0 until dims).map(d0 => math.pow(g(i)._3(d0) - g(j)._3(d0), 2)).sum / 1e18
      ps.sum / ps.size
    }
    // the query quantizes each label's closed form to 1e-9 before averaging
    val alignExpect = aligns.map(a => math.floor(a * 1e9 + 0.5)).sum / aligns.size / 1e9
    val probes = vecs.filter(_._1 < 500)
    val eqs = for (i <- probes.indices; j <- probes.indices
        if probes(i)._1 < probes(j)._1) yield {
      val d2 = (0 until dims).map(d0 =>
        math.pow(probes(i)._3(d0) - probes(j)._3(d0), 2)).sum / 1e18
      math.floor(math.exp(-2 * d2) * 1e12 + 0.5).toLong
    }
    val unif = math.log(eqs.sum.toDouble / eqs.size / 1e12)
    val row = queries.Extras162.embedAlignmentUniformity(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - alignExpect) < 1e-4)
    assert(row.getLong(1) == eqs.size.toLong)
    assert(math.abs(row.getDouble(2) - unif) < 1e-4)
    assert(row.getDouble(2) <= 0) // uniformity is a log of a mean of (0,1] terms
  }
}
