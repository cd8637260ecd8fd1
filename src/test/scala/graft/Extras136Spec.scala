package graft

import org.apache.spark.sql.functions._

/** Wave-36 properties the DuckDB oracle can't express (the four rows
  * are fully oracled; these are the independent engine-side bounds the
  * oracle can't state — candidate-count, selection bias, reference
  * vectors, brute-force censuses).
  */
class Extras136Spec extends SparkSpec {

  private def md5Fraction(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 6)
    java.lang.Long.parseLong(hex, 16).toDouble / 16777216.0
  }

  test("sample_weighted_reservoir: exact ES top-100 vs brute force; heavy orders over-selected") {
    val pop = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).bigDecimal
          .movePointRight(2).longValueExact
        val u = md5Fraction(s"esw:${r.getLong(0)}")
        (r.getLong(0), cents, math.pow(u, 100.0 / cents))
      }
    val brute = pop.sortBy { case (k, _, es) => (-es, k) }.take(100)
    val got = queries.Extras136.sampleWeightedReservoir(spark, sf).collect()
    assert(got.length == math.min(100, pop.length))
    assert(got.map(_.getLong(0)).toSeq == brute.map(_._1).toSeq,
      "engine top-100 diverges from the brute-force ES ranking")
    // selection probability ∝ weight: the sample's mean weight must sit
    // well above the population's (the planted skew is o_totalprice
    // itself — heavy orders carry proportionally more mass)
    val popMean = pop.map(_._2).sum.toDouble / pop.length
    val sampleMean = brute.map(_._2).sum.toDouble / brute.length
    info(f"population mean weight ${popMean / 100}%.2f, sample ${sampleMean / 100}%.2f")
    assert(sampleMean > popMean * 1.1,
      "weighted sample shows no weight bias — ES key broken")
  }

  /** Independent textbook geohash: binary subdivision, lon bit first —
    * shares NO arithmetic with the engine's quantize-and-interleave
    * path.
    */
  private def geohashRef(lat: Double, lon: Double): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val bits = (0 until 30).map { i =>
      if (i % 2 == 0) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
      }
    }
    bits.grouped(5).map(g => alpha(g.foldLeft(0)((a, b) => a * 2 + b))).mkString
  }

  test("geo_geohash_cluster: reference vector + brute-force census via the subdivision encoder") {
    // public anchor (Wikipedia's geohash example, precision 6)
    assert(geohashRef(57.64911, 10.40744) == "u4pruy")
    val brute = Tables.events(spark, sf)
      .select(col("value"), col("user_id")).collect()
      .map { r =>
        val lon = r.getDouble(0) % 360.0 - 180.0
        val lat = (r.getLong(1) % 180).toDouble - 90.0
        geohashRef(lat, lon)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (gh, n) => (-n, gh) }.take(20)
    val got = queries.Extras136.geoGeohashCluster(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute,
      s"engine top-20 diverges from subdivision-encoder census:\n$got\nvs\n$brute")
  }

  test("dedup_prefix_filter_join: candidates far below n²/2, pigeonhole-complete, equals staged C5 pairs") {
    val (sh, prefix) = queries.DedupExtras.ngramShinglesAndPrefix(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = prefix.select(col("doc_id").as("a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    val nCand = cands.count()
    info(f"candidates: $nCand of $allPairs all-pairs (${100.0 * nCand / allPairs}%.2f%%)")
    // the docstring's claim, made true: candidate count ≪ n²/2
    assert(nCand < allPairs / 10,
      s"prefix filter left $nCand candidates of $allPairs — not a material bound")
    // pigeonhole completeness: every true J≥0.6 pair is a candidate
    val truePairs = queries.Extras136.dedupPrefixFilterJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candSet = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "gate corpus must contain true pairs")
    assert(truePairs.subsetOf(candSet),
      s"completeness violated: ${truePairs -- candSet} missed by the prefix join")
    // the live exhibit equals the staged C5 artifact row-for-row
    val viaStage = queries.DedupExtras.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val live = queries.Extras136.dedupPrefixFilterJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(live == viaStage, "live miner diverges from the staged pair artifact")
  }

  test("win_swing_points: brute-force swing census on the daily series") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect()
    val cs = daily.map(_.getLong(1))
    val brute = daily.indices.flatMap { i =>
      if (i < 3 || i >= cs.length - 3) None
      else {
        val flank = (cs.slice(i - 3, i) ++ cs.slice(i + 1, i + 4))
        if (flank.forall(cs(i) > _)) Some((daily(i).getTimestamp(0), "swing_high"))
        else if (flank.forall(cs(i) < _)) Some((daily(i).getTimestamp(0), "swing_low"))
        else None
      }
    }.toSet
    val got = queries.Extras136.winSwingPoints(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(got == brute,
      s"swing census diverges: missing=${brute -- got}, extra=${got -- brute}")
    assert(brute.nonEmpty, "corpus should produce at least one swing point")
  }
}
