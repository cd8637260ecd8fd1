package graft

import org.apache.spark.sql.functions._

/** Wave-39 properties: Shapley axioms + brute force, aHash brute
  * force + band completeness, spectrum replay, k-fold census.
  */
class Extras139Spec extends SparkSpec {

  test("analytics_shapley_attribution: brute force agrees; efficiency axiom holds") {
    val users = Tables.events(spark, sf).groupBy("user_id").agg(
        (max(when(col("event_type") === "click", 1L).otherwise(0L)) +
          max(when(col("event_type") === "signup", 2L).otherwise(0L)) +
          max(when(col("event_type") === "view", 4L).otherwise(0L)) +
          max(when(col("event_type") === "error", 8L).otherwise(0L))).as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val cnt = users.filter(_._2 == 1L).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def v(setMask: Long): Long =
      cnt.filter { case (m, _) => (m & setMask) == m }.values.sum
    val w = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val channels = Seq(("click", 1L), ("error", 8L), ("signup", 2L), ("view", 4L))
    val brute = channels.map { case (name, bit) =>
      val fx = (0L to 15L).filter(s => (s & bit) == 0).map { s =>
        w(java.lang.Long.bitCount(s)) * (v(s + bit) - v(s))
      }.sum
      (name, fx)
    }.sortBy(_._1)
    val got = queries.Extras139.analyticsShapleyAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == brute, s"shapley diverges:\n${got.toSeq}\nvs\n$brute")
    // efficiency: Σφ = v(N) − v(∅) (in 24ths: Σfx = 24·(v(15) − v(0)))
    assert(got.map(_._2).sum == 24L * (v(15) - v(0)),
      "Shapley efficiency axiom violated")
  }

  test("multimodal_ahash_near_dup: brute-force hash reproduces the probe top-20") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 500)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def ahash(text: String): Long = {
      val vals = text.map(_.toInt)
      val n = vals.length.toLong
      val total = vals.map(_.toLong).sum
      (0 to 62).map { k =>
        val lo = (k * n) / 63
        val hi = ((k + 1) * n) / 63
        val len = hi - lo
        val cs = vals.slice(lo.toInt, hi.toInt).map(_.toLong).sum
        if (len > 0 && cs * n > total * len) 1L << k else 0L
      }.sum
    }
    val hs = docs.map { case (id, t) => id -> ahash(t) }
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong))
      .sortBy(t => (t._3, t._1, t._2)).take(20).toSeq
    val got = queries.Extras139.multimodalAhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute, s"ahash top-20 diverges:\n$got\nvs\n$brute")
    assert(got.nonEmpty && got.head._3 < got.last._3,
      "top-20 should separate true near-dups from the random-pair floor")
  }

  test("time_dow_spectrum: replay with the same quantized twiddles; powers normalize") {
    val dowTotals = Tables.lineitem(spark, sf)
      .groupBy(expr(
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE'1992-01-06') % 7 AS BIGINT)").as("dw"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("sd"))
      .collect().map(r => (r.getLong(0).toInt, BigInt(r.getLong(1)))).toMap
    val ps = (1 to 3).map { k =>
      val (cs, sn) = (0 to 6).map { dd =>
        val s = dowTotals.getOrElse(dd, BigInt(0))
        (s * BigInt(math.round(math.cos(2 * math.Pi * k * dd / 7) * 1e9)),
          s * BigInt(math.round(math.sin(2 * math.Pi * k * dd / 7) * 1e9)))
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      val (cd, sd2) = (cs.toDouble, sn.toDouble)
      cd * cd + sd2 * sd2
    }
    val pt = ps.sum
    val row = queries.Extras139.timeDowSpectrum(spark, sf).collect().head
    (0 to 2).foreach { i =>
      assert(math.abs(row.getDouble(i) - ps(i) / pt) < 1e-5,
        s"rel power ${i + 1}: ${row.getDouble(i)} vs ${ps(i) / pt}")
    }
    assert(math.abs(row.getDouble(0) + row.getDouble(1) + row.getDouble(2) - 1.0) < 1e-5)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= math.log(3) + 1e-9)
  }

  test("sample_kfold_purged: folds partition days, embargo bounded, census exact") {
    val nDays = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day")).distinct().count()
    val rows = queries.Extras139.sampleKfoldPurged(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == nDays,
        s"fold ${r.getLong(0)}: census does not cover the spine")
      assert(r.getLong(2) <= 6, "embargo exceeds ±3 days per boundary")
      assert(r.getLong(1) >= nDays / 5 - 1 && r.getLong(1) <= nDays / 5 + 1,
        "test block size must be balanced")
    }
    // test blocks tile the day spine exactly once
    assert(rows.map(_.getLong(1)).sum == nDays)
  }
}
