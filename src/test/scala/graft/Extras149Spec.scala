package graft

import org.apache.spark.sql.functions._

/** Wave-49 properties: OBV, Siegel–Tukey, ABC/XYZ, Calinski–Harabasz
  * replays against definitional brute force on the sf0.001 corpus.
  */
class Extras149Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("win_obv_accumulation: brute-force OBV replay") {
    val rows = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue,
          cents(r.getDouble(3)), r.getDouble(4).toLong)))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) =>
        val c = xs.map(_._2).maxBy(t => (t._1, t._2))._3
        (c, xs.map(_._2._4).sum)
      }
    var obv = 0L; var maxO = Long.MinValue; var minO = Long.MaxValue
    var up = 0L; var dn = 0L
    rows.sliding(2).foreach { case Seq((pc, _), (c, vol)) =>
      if (c > pc) { obv += vol; up += 1 }
      else if (c < pc) { obv -= vol; dn += 1 }
      if (obv > maxO) maxO = obv
      if (obv < minO) minO = obv
    }
    val row = queries.Extras149.winObvAccumulation(spark, sf).collect().head
    assert(row.getLong(0) == rows.length - 1L)
    assert(row.getLong(1) == up && row.getLong(2) == dn)
    assert(row.getLong(3) == maxO && row.getLong(4) == minO)
    assert(row.getLong(5) == obv)
  }

  test("stat_siegel_tukey: ranks replay the definitional alternating construction") {
    val vals = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0),
        (cents(r.getDouble(3)), r.getLong(1), r.getAs[Number](2).longValue)))
      .sortBy(_._2)
    val n = vals.length
    // definitional construction: walk ranks 1..n alternating low/high,
    // taking 1 from the low end then 2 from the high end then 2 low ...
    val stRank = new Array[Long](n)
    var lo = 0; var hi = n - 1; var r = 1L; var fromLow = true; var take = 1
    while (r <= n) {
      var t = take
      while (t > 0 && r <= n) {
        if (fromLow) { stRank(lo) = r; lo += 1 } else { stRank(hi) = r; hi -= 1 }
        r += 1; t -= 1
      }
      fromLow = !fromLow; take = 2
    }
    // with n odd the middle observation is discarded
    val kept = vals.zipWithIndex.filterNot { case (_, i) =>
      n % 2 == 1 && i == (n - 1) / 2
    }
    val m = kept.length.toLong
    val nA = kept.count(_._1._1 == "A").toLong
    val wA = kept.collect { case ((g, _), i) if g == "A" => stRank(i) }.sum
    // discarded middle's rank must be the leftover n (so kept ranks = 1..n-1)
    if (n % 2 == 1) assert(stRank((n - 1) / 2) == n.toLong)
    assert(kept.map { case (_, i) => stRank(i) }.sorted.toSeq ==
      (1L to m).toSeq)
    val z = (wA.toDouble - nA.toDouble * (m + 1) / 2) /
      math.sqrt(nA.toDouble * (m - nA) * (m + 1) / 12)
    val row = queries.Extras149.statSiegelTukey(spark, sf).collect().head
    assert(row.getLong(0) == m)
    assert(row.getLong(1) == nA)
    assert(row.getLong(2) == wA)
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
  }

  test("analytics_abc_xyz: BigInt replay of both classifications") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_quantity"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)), r.getDouble(2).toLong,
        r.getTimestamp(3)))
    val rev = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val t = rev.values.map(BigInt(_)).sum
    val ordered = rev.toSeq.sortBy { case (k, c) => (-c, k) }
    var before = BigInt(0)
    val abc = ordered.map { case (k, c) =>
      val cls = if (before * 10 < t * 7) "A"
        else if (before * 10 < t * 9) "B" else "C"
      before += c
      k -> cls
    }.toMap
    val xyz = li.groupBy(x => (x._1, x._4)).view.mapValues(_.map(_._3).sum)
      .toSeq.groupBy(_._1._1).view.mapValues { ms =>
        val q = ms.map(x => BigInt(x._2))
        val nm = BigInt(q.length); val sq = q.sum; val qq = q.map(x => x * x).sum
        val d = nm * qq - sq * sq
        if (d * 4 <= sq * sq) "X" else if (d <= sq * sq) "Y" else "Z"
      }.toMap
    val expect = rev.keys.toSeq
      .groupBy(k => (abc(k), xyz(k))).view
      .mapValues(ks => (ks.length.toLong,
        ks.map(k => BigInt(rev(k))).sum.toDouble / t.toDouble)).toMap
    val got = queries.Extras149.analyticsAbcXyz(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    got.foreach { r =>
      val (np, share) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == np)
      assert(math.abs(r.getDouble(3) - share) < 1e-5)
    }
  }

  test("embed_calinski_harabasz: double replay from collected vectors; CH > 0") {
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray))
    val n = vecs.length
    val k = vecs.map(_._1).distinct.length
    val dims = vecs.head._2.length
    val globalMean = Array.tabulate(dims)(j => vecs.map(_._2(j)).sum / n)
    val byLabel = vecs.groupBy(_._1)
    val w = byLabel.values.map { g =>
      val mu = Array.tabulate(dims)(j => g.map(_._2(j)).sum / g.length)
      g.map(v => (0 until dims).map(j => math.pow(v._2(j) - mu(j), 2)).sum).sum
    }.sum
    val t = vecs.map(v =>
      (0 until dims).map(j => math.pow(v._2(j) - globalMean(j), 2)).sum).sum
    val ch = ((t - w) / (k - 1)) / (w / (n - k))
    val row = queries.Extras149.embedCalinskiHarabasz(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == k.toLong)
    assert(row.getDouble(2) > 0)
    assert(math.abs(row.getDouble(2) - ch) / ch < 1e-5)
    assert(math.abs(row.getDouble(3) - w / t) < 2e-6)
  }
}
