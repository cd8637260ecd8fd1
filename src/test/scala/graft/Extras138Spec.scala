package graft

import org.apache.spark.sql.functions._

/** Wave-38 properties: exact brute-force replicas (BigInt / Long
  * arithmetic, same fixed-point conventions) for fusion, KPSS,
  * ordinal entropy, and HITS.
  */
class Extras138Spec extends SparkSpec {

  test("text_rrf_fusion: engine top-20 equals brute-force exact-integer fusion") {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    val scored = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("tok", size(col("toks")).cast("long"))
      .withColumn("stop", size(expr(s"filter(toks, t -> t IN $stopSql)")).cast("long"))
      .selectExpr("doc_id", "n_chars",
        "7000 * least(tok, 100L) + (300000 * stop) div tok AS q_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r1 = scored.sortBy { case (id, _, q) => (-q, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val r2 = scored.sortBy { case (id, nc, _) => (-nc, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val brute = scored.map(_._1)
      .map(id => (id, 1000000000000L / (60 + r1(id)) + 1000000000000L / (60 + r2(id))))
      .sortBy { case (id, fx) => (-fx, id) }.take(20)
      .map { case (id, fx) => (id, r1(id), r2(id), fx) }
    val got = queries.Extras138.textRrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == brute.map(t => (t._1, t._2, t._3)).toSeq,
      s"fused top-20 diverges:\n${got.toSeq}\nvs\n${brute.toSeq}")
    got.zip(brute).foreach { case (g, b) =>
      assert(math.abs(g._4 - b._4 / 1e12) < 1e-9, s"score ${g._4} vs ${b._4 / 1e12}")
    }
  }

  private def dailyCents(): Array[Long] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  test("stat_kpss_level: BigInt brute force agrees; statistic positive") {
    val c = dailyCents().map(BigInt(_))
    val n = BigInt(c.length)
    val sc = c.sum
    val scc = c.map(v => v * v).sum
    val stt = c.scanLeft(BigInt(0))(_ + _).drop(1).zipWithIndex
      .map { case (pc, i) => val t = BigInt(i + 1); val bigT = n * pc - t * sc; bigT * bigT }
      .sum
    val kpss = stt.toDouble / (n.toDouble * (n * scc - sc * sc).toDouble)
    val row = queries.Extras138.statKpssLevel(spark, sf).collect().head
    assert(row.getLong(0) == c.length.toLong)
    assert(math.abs(row.getDouble(1) - kpss) < 1e-5, s"kpss ${row.getDouble(1)} vs $kpss")
    assert(row.getDouble(1) > 0)
  }

  test("time_permutation_entropy: brute force agrees; entropy in [0, ln 8]") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("sv"), count(lit(1)).cast("long").as("nv"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val got = queries.Extras138.timePermutationEntropy(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val series = daily(r.getString(0))
      val codes = series.sliding(3).filter(_.length == 3).map { w =>
        val Seq((s0, n0), (s1, n1), (s2, n2)) = w.toSeq
        (if (s1 * n0 > s0 * n1) 4 else 0) +
          (if (s2 * n1 > s1 * n2) 2 else 0) +
          (if (s2 * n0 > s0 * n2) 1 else 0)
      }.toSeq
      val n = codes.length.toDouble
      val ent = -(0 to 7).map { i =>
        val ci = codes.count(_ == i)
        if (ci > 0) ci / n * math.log(ci / n) else 0.0
      }.sum
      assert(r.getLong(1) == codes.length.toLong)
      assert(math.abs(r.getDouble(2) - ent) < 1e-5,
        s"${r.getString(0)}: ${r.getDouble(2)} vs $ent")
      assert(r.getDouble(2) >= -1e-9 && r.getDouble(2) <= math.log(8) + 1e-9)
    }
  }

  test("graph_hits_fixed: exact-integer brute force reproduces both top-10 lists") {
    val edges = Tables.lineitem(spark, sf).select(col("l_suppkey"), col("l_orderkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var auth = edges.map(_._2).distinct.map(_ -> 1000000L).toMap
    var hub = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      val hraw = edges.groupBy(_._1).map { case (sk, es) =>
        sk -> es.map(e => auth(e._2)).sum }
      val hmax = hraw.values.max
      hub = hraw.map { case (k, v) => k -> v * 1000000L / hmax }
      val araw = edges.groupBy(_._2).map { case (ck, es) =>
        ck -> es.map(e => hub(e._1)).sum }
      val amax = araw.values.max
      auth = araw.map { case (k, v) => k -> v * 1000000L / amax }
    }
    val bruteHubs = hub.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val bruteAuth = auth.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val got = queries.Extras138.graphHitsFixed(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val gotHubs = got.filter(_._1 == "hub").map(t => (t._2, t._3)).toSeq
    val gotAuth = got.filter(_._1 == "authority").map(t => (t._2, t._3)).toSeq
    assert(gotHubs == bruteHubs, s"hubs diverge:\n$gotHubs\nvs\n$bruteHubs")
    assert(gotAuth == bruteAuth, s"authorities diverge:\n$gotAuth\nvs\n$bruteAuth")
    assert(gotHubs.map(_._2).max == 1000000L && gotAuth.map(_._2).max == 1000000L,
      "max-normalization must pin the top score to 1e6")
  }
}
