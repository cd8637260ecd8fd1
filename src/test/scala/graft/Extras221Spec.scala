package graft

/** Wave-121 properties: CLV replay from first principles, segmented
  * slopes vs per-segment OLS, CSLS agreement bounds + hub ordering,
  * and b-bit estimator error dominance — at sf0.001.
  */
class Extras221Spec extends SparkSpec {

  test("analytics_clv_geometric: matches the retention/margin replay") {
    val cm = Tables.orders(spark, sf)
      .selectExpr("o_custkey AS ck", "CAST(date_trunc('month', o_orderdate) AS DATE) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val months = cm.keys.map(_._2).toSeq
    val mmax = months.max
    val active = cm.keySet.map { case (ck, m) => (ck, m) }
    val opps = active.filter(_._2.isBefore(mmax))
    val rets = opps.count { case (ck, m) => active.contains((ck, m.plusMonths(1))) }
    val r = rets.toDouble / opps.size
    val margin = cm.values.map(BigInt(_)).sum.toDouble / cm.size / 100
    val clv = margin * 1.01 / (1.01 - r)
    val row = queries.Extras221.analyticsClvGeometric(spark, sf).collect().head
    assert(row.getLong(0) == cm.size.toLong)
    assert(row.getLong(1) == opps.size.toLong)
    assert(math.abs(row.getDouble(2) - r) < 1e-6)
    assert(math.abs(row.getDouble(3) - margin) < 1e-2)
    assert(math.abs(row.getDouble(4) - clv) < 1e-1)
    assert(row.getDouble(2) > 0 && row.getDouble(2) < 1)
    assert(row.getDouble(4) > row.getDouble(3), "CLV exceeds one month's margin")
  }

  test("time_segmented_trend: per-segment OLS replay; segments partition the months") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val n = ms.length
    val rows = queries.Extras221.timeSegmentedTrend(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == n.toLong, "segments partition the months")
    rows.foreach { row =>
      val seg = row.getLong(0)
      val pts = ms.zipWithIndex.filter { case (_, t) => math.min(t * 4 / n, 3) == seg }
        .map { case (v, t) => (t.toDouble, v.toDouble) }
      val k = pts.length.toDouble
      val st = pts.map(_._1).sum; val sv = pts.map(_._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val stv = pts.map(p => p._1 * p._2).sum
      val slope = (k * stv - st * sv) / (k * stt - st * st) / 100
      assert(row.getLong(1) == pts.length.toLong)
      assert(row.getLong(2) == pts.map(_._1).min.toLong)
      assert(row.getLong(3) == pts.map(_._1).max.toLong)
      assert(math.abs(row.getDouble(4) - slope) < 1e-2, s"segment $seg slope")
      assert(math.abs(row.getDouble(5) - sv / k / 100) < 1e-2)
    }
  }

  test("embed_csls_retrieval: agreement in [0,1]; cosine winners are hubbier than average") {
    val row = queries.Extras221.embedCslsRetrieval(spark, sf).collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    val agree = row.getDouble(2)
    assert(agree >= 0 && agree <= 1)
    // hubness: the items cosine picks have above-average r(y) — this is
    // the bias CSLS corrects; equality would mean no hubs at all
    assert(row.getDouble(3) >= row.getDouble(4) - 1e-6,
      s"cos winners hub ${row.getDouble(3)} vs corpus ${row.getDouble(4)}")
    assert(row.getDouble(3) <= 1.0 && row.getDouble(4) <= 1.0,
      "normalized-vector similarity means stay below 1")
  }

  test("dedup_bbit_minhash: replay on one candidate pair; bbit error >= full error on average") {
    val row = queries.Extras221.dedupBbitMinhash(spark, sf).collect().head
    assert(row.getLong(0) > 0, "banding produced candidate pairs")
    val maeFull = row.getDouble(1); val maeB = row.getDouble(2)
    assert(maeFull >= 0 && maeB >= 0)
    assert(maeB >= maeFull - 1e-3,
      s"2-bit signatures cannot beat the full 16-hash estimate: $maeB vs $maeFull")
    assert(row.getDouble(3) == 0.03125, "2 of 64 bits")
    // replay the signature for the smallest doc_id on hash i = 0
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).selectExpr("doc_id", "lower(text) AS t")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (did, text) = docs.minBy(_._1)
    val toks = text.split(" ", -1)
    val shingles = (0 to toks.length - 3)
      .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
    if (shingles.nonEmpty) {
      val h0 = shingles.map(sg =>
        java.lang.Long.parseLong(md5hex(s"bb0:$sg").substring(0, 12), 16)).min
      // cross-check through the engine-side signature path
      import org.apache.spark.sql.functions._
      val sig = Tables.documents(spark, sf).filter(col("doc_id") === did)
        .selectExpr("explode(array_distinct(transform(sequence(1, size(split(lower(text), ' ')) - 2), " +
          "i -> concat_ws(' ', element_at(split(lower(text), ' '), i), " +
          "element_at(split(lower(text), ' '), i + 1), element_at(split(lower(text), ' '), i + 2))))) AS sg")
        .selectExpr("CAST(conv(substring(md5(concat('bb0:', sg)), 1, 12), 16, 10) AS BIGINT) AS h")
        .agg(min(col("h"))).collect().head.getLong(0)
      assert(sig == h0, "hash-0 minhash replays bit-for-bit")
    }
  }
}
