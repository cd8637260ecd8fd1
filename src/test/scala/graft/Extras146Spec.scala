package graft

import org.apache.spark.sql.functions._

/** Wave-46 properties: stylometry/ITS replays, sign census, and the
  * nested-pushdown PLAN assertion.
  */
class Extras146Spec extends SparkSpec {

  test("text_burrows_delta: exact fixed-point replay of the closest pairs") {
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    val top = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(10).map(_._1).toSet
    val srcTot = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val grid = toks.filter(t => top(t._2)).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.map { case ((src, tok), c) => (src, tok, c * 1000000 / srcTot(src)) }.toSeq
    val byTok = grid.groupBy(_._2)
    val z = grid.flatMap { case (src, tok, f) =>
      val fs = byTok(tok).map(_._3)
      val k = BigInt(fs.length)
      val sf = fs.map(BigInt(_)).sum
      val sff = fs.map(v => BigInt(v) * v).sum
      val varn = k * sff - sf * sf
      if (varn > 0)
        Some(((src, tok), math.floor((BigInt(f) * k - sf).toDouble /
          math.sqrt(varn.toDouble) * 1e6 + 0.5).toLong))
      else None
    }.toMap
    val sources = grid.map(_._1).distinct.sorted
    val brute = (for {
      s1 <- sources; s2 <- sources if s1 < s2
      common = z.keys.filter(_._1 == s1).map(_._2).toSet &
        z.keys.filter(_._1 == s2).map(_._2).toSet
      if common.nonEmpty
    } yield {
      val dfx = common.toSeq.map(t => math.abs(z((s1, t)) - z((s2, t)))).sum
      (s1, s2, dfx.toDouble / common.size / 1e6)
    }).sortBy { case (s1, s2, d0) => (d0, s1, s2) }.take(10)
    val got = queries.Extras146.textBurrowsDelta(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.zip(brute).foreach { case ((g1, g2, gd), (b1, b2, bd)) =>
      assert(g1 == b1 && g2 == b2, s"pair order diverges: ${got.toSeq} vs $brute")
      assert(math.abs(gd - bd) < 1e-5)
    }
  }

  test("stat_sign_test: brute census; z consistent with counts") {
    val c = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val diffs = c.sliding(2).collect { case Array(a, b) if a != b => b > a }.toSeq
    val (up, down) = (diffs.count(identity).toLong, diffs.count(!_).toLong)
    val row = queries.Extras146.statSignTest(spark, sf).collect().head
    assert(row.getLong(0) == up && row.getLong(1) == down)
    val n = up + down
    val z = (math.abs(up.toDouble - n / 2.0) - 0.5) / math.sqrt(n / 4.0)
    assert(math.abs(row.getDouble(2) - z) < 1e-5)
  }

  test("scan_nested_filter_pushdown: the nested predicate reaches the parquet scan") {
    val df = queries.Extras146.scanNestedFilterPushdown(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT").count())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("meta.priority") || plan.contains("`meta`.`priority`")),
      s"nested predicate not pushed to the scan:\n${plan.take(2000)}")
  }

  test("analytics_interrupted_ts: BigInt replay of both segment fits") {
    val c = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = c.length
    val m = n / 2
    def fit(seg: Seq[(Long, Long)]): (Double, Long => Double) = {
      val k = BigInt(seg.length)
      val st = seg.map(p => BigInt(p._1)).sum
      val sc = seg.map(p => BigInt(p._2)).sum
      val stt = seg.map(p => BigInt(p._1) * p._1).sum
      val stc = seg.map(p => BigInt(p._1) * p._2).sum
      val slope = (k * stc - st * sc).toDouble / (k * stt - st * st).toDouble
      (slope, (t0: Long) =>
        (sc.toDouble + slope * (t0.toDouble * k.toDouble - st.toDouble)) / k.toDouble)
    }
    val idx = c.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }.toSeq
    val (sa, fa) = fit(idx.take(m))
    val (sb, fb) = fit(idx.drop(m))
    val brk = (m + 1).toLong
    val row = queries.Extras146.analyticsInterruptedTs(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == brk)
    assert(math.abs(row.getDouble(2) - sa / 100) < 1e-5)
    assert(math.abs(row.getDouble(3) - sb / 100) < 1e-5)
    assert(math.abs(row.getDouble(4) - (sb - sa) / 100) < 1e-5)
    assert(math.abs(row.getDouble(5) - (fb(brk) - fa(brk)) / 100) < 1e-3)
  }
}
