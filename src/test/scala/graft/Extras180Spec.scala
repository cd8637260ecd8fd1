package graft

import org.apache.spark.sql.functions._

/** Wave-80 properties: Allen census, newsvendor, EOQ, Cochran size
  * replayed against brute force on sf0.001.
  */
class Extras180Spec extends SparkSpec {

  test("join_interval_allen: 13-relation classifier replay; partition is total") {
    val iv = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(min(date_trunc("day", col("l_shipdate"))).as("s"),
        max(date_trunc("day", col("l_shipdate"))).as("e"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3)))
    def rel(a: (Long, Long), b: (Long, Long)): String =
      if (a._1 == b._1 && a._2 == b._2) "equals"
      else if (a._2 < b._1) "before"
      else if (b._2 < a._1) "after"
      else if (a._2 == b._1) "meets"
      else if (b._2 == a._1) "met_by"
      else if (a._1 == b._1 && a._2 < b._2) "starts"
      else if (a._1 == b._1 && a._2 > b._2) "started_by"
      else if (a._2 == b._2 && a._1 > b._1) "finishes"
      else if (a._2 == b._2 && a._1 < b._1) "finished_by"
      else if (a._1 > b._1 && a._2 < b._2) "during"
      else if (a._1 < b._1 && a._2 > b._2) "contains"
      else if (a._1 < b._1 && a._2 >= b._1 && a._2 < b._2) "overlaps"
      else "overlapped_by"
    val counts = iv.groupBy(_._4).values.flatMap { g =>
      val sorted = g.sortBy(_._1)
      for (i <- sorted.indices; j <- i + 1 until sorted.length) yield
        rel((sorted(i)._2, sorted(i)._3), (sorted(j)._2, sorted(j)._3))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = queries.Extras180.joinIntervalAllen(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == counts, s"got=$got want=$counts")
    assert(got.values.sum == iv.groupBy(_._4).values.map(g => g.size.toLong * (g.size - 1) / 2).sum)
  }

  test("analytics_newsvendor: 0.75-fractile order statistic replay") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byPart = daily.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val top = byPart.toSeq.map { case (p, qs) => (p, qs.sum, qs.length) }
      .sortBy(t => (-t._2, t._1)).take(5)
    val got = queries.Extras180.analyticsNewsvendor(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == top.map(_._1))
    got.zip(top).foreach { case (r, (p, tq, nd)) =>
      val sorted = byPart(p).sorted
      val qStar = sorted.zipWithIndex.collectFirst {
        case (q, i) if 4L * (i + 1) >= 3L * nd => q
      }.get
      assert(r.getLong(1) == nd.toLong && r.getLong(2) == tq)
      assert(r.getLong(3) == qStar, s"part $p: got ${r.getLong(3)}, want $qStar")
    }
  }

  test("analytics_eoq: closed-form replay; EOQ grows with sqrt(D)") {
    val got = queries.Extras180.analyticsEoq(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val d0 = r.getDouble(1); val up = r.getDouble(2); val eoq = r.getDouble(3)
      assert(math.abs(eoq - math.sqrt(2 * d0 * 100 / (0.2 * up))) < 0.5)
    }
    // ordered by demand desc, and demand ordering implies eoq ordering only
    // under equal prices — just check the sort key
    assert(got.map(_.getDouble(1)).toSeq.reverse == got.map(_.getDouble(1)).toSeq.sorted)
  }

  test("sample_cochran_size: n0 and fpc replay; n_fpc <= min(n0-ish, N)") {
    val got = queries.Extras180.sampleCochranSize(spark, sf).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val n = r.getLong(1); val p = r.getDouble(2)
      val n0 = 3.8416 * p * (1 - p) / 0.0004
      assert(math.abs(r.getDouble(3) - n0) < 0.5)
      assert(math.abs(r.getDouble(4) - n0 / (1 + (n0 - 1) / n)) < 0.5)
      assert(r.getDouble(4) <= n + 1e-9 && r.getDouble(4) <= r.getDouble(3) + 1e-9)
    }
  }
}
