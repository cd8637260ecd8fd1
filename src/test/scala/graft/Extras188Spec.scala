package graft

import org.apache.spark.sql.functions._

/** Wave-88 properties: CUSUM², footrule, Blomqvist β, split-half
  * reliability replayed against brute force on sf0.001.
  */
class Extras188Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_cusum_squares: exact prefix replay; sup at the argmax day") {
    val byDay = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1.getTime)
    val c2 = byDay.map(d => BigInt(d._2) * BigInt(d._2))
    val n = c2.length
    val q = c2.sum
    var cq = BigInt(0); var best = BigInt(-1); var bestIdx = -1; var bestDx = BigInt(0)
    c2.zipWithIndex.foreach { case (v, i) =>
      cq += v
      val dx = cq * n - BigInt(i + 1) * q
      if (dx.abs > best) { best = dx.abs; bestIdx = i; bestDx = dx }
    }
    val row = queries.Extras188.statCusumSquares(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getString(1) == byDay(bestIdx)._1.toLocalDateTime.toLocalDate.toString)
    assert(math.abs(row.getDouble(2) - best.toDouble / (n.toDouble * q.toDouble)) < 1e-6)
    assert(row.getString(3) == (if (bestDx > 0) "early_volatility" else "late_volatility"))
  }

  test("stat_spearman_footrule: year-rank replay; norm in [0,1]") {
    val byYear = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("yr"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(v => BigInt(v.map(_._2).sum)).toMap
    val y2 = byYear.keys.map(_._1).max; val y1 = y2 - 1
    def ranks(y: Int): Map[Long, Long] =
      byYear.filter(_._1._1 == y).toSeq
        .map { case ((_, sk), c) => (sk, c) }
        .sortBy(t => (-t._2, t._1)).zipWithIndex
        .map { case ((sk, _), i) => sk -> (i + 1).toLong }.toMap
    val r1 = ranks(y1); val r2 = ranks(y2)
    val common = r1.keySet.intersect(r2.keySet).toSeq
    val f = common.map(sk => math.abs(r1(sk) - r2(sk))).sum
    val m = common.size
    val row = queries.Extras188.statSpearmanFootrule(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong && row.getLong(1) == f)
    assert(row.getInt(2) == y1 && row.getInt(3) == y2)
    assert(math.abs(row.getDouble(4) - f.toDouble / (m.toLong * m / 2)) < 1e-6)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1)
  }

  test("stat_blomqvist_beta: median-quadrant replay") {
    val lines = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val per = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .flatMap(r => lines.get(r.getLong(0)).map(k => (k, cents(r.getDouble(1)))))
    def med(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1) // smallest v with 2*cl >= n
    }
    val mk = med(per.map(_._1)); val mc = med(per.map(_._2))
    val agree = per.count(p => (p._1 > mk && p._2 > mc) || (p._1 < mk && p._2 < mc))
    val dis = per.count(p => (p._1 > mk && p._2 < mc) || (p._1 < mk && p._2 > mc))
    val row = queries.Extras188.statBlomqvistBeta(spark, sf).collect().head
    assert(row.getLong(0) == per.length.toLong)
    assert(row.getLong(1) == agree.toLong && row.getLong(2) == dis.toLong)
    assert(math.abs(row.getDouble(3) - (agree - dis).toDouble / (agree + dis)) < 1e-6)
  }

  test("stat_split_half_reliability: halves correlation + Spearman-Brown; near Cronbach") {
    val rows = Tables.orders(spark, sf).select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        (r.getAs[java.time.LocalDateTime](1).getMonthValue - 1) / 3 + 1,
        cents(r.getDouble(2))))
    val per = rows.groupBy(_._1).view.mapValues { g =>
      (BigInt(g.filter(x => x._2 == 1 || x._2 == 3).map(_._3).sum),
        BigInt(g.filter(x => x._2 == 2 || x._2 == 4).map(_._3).sum))
    }.values.toArray
    val n = per.length
    val s1 = per.map(_._1).sum; val s2 = per.map(_._2).sum
    val q1 = per.map(p => p._1 * p._1).sum; val q2 = per.map(p => p._2 * p._2).sum
    val q12 = per.map(p => p._1 * p._2).sum
    val r0 = (BigInt(n) * q12 - s1 * s2).toDouble /
      math.sqrt((BigInt(n) * q1 - s1 * s1).toDouble * (BigInt(n) * q2 - s2 * s2).toDouble)
    val row = queries.Extras188.statSplitHalfReliability(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - r0) < 1e-5)
    assert(math.abs(row.getDouble(2) - 2 * r0 / (1 + r0)) < 1e-5)
    // same neighborhood as Cronbach's alpha on the same items
    val alpha = queries.Extras177.statCronbachAlpha(spark, sf).collect().head.getDouble(3)
    assert(math.abs(row.getDouble(2) - alpha) < 0.35)
  }
}
