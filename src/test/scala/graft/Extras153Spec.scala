package graft

import org.apache.spark.sql.functions._

/** Wave-53 properties: uplift, Higuchi FD, cross-source matrix,
  * runs up/down replays against definitional brute force on sf0.001.
  */
class Extras153Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def dailySeries(): Seq[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)

  test("analytics_uplift_by_segment: per-segment counted replay") {
    val v = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map(r => (math.floor((r.getDouble(0) - 1) / 10).toLong,
        r.getDouble(1) >= 0.05, r.getString(2) == "R"))
    val got = queries.Extras153.analyticsUpliftBySegment(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == v.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val seg = v.filter(_._1 == r.getLong(0))
      val (t, c) = seg.partition(_._2)
      assert(r.getLong(1) == t.length.toLong && r.getLong(2) == c.length.toLong)
      val uplift = t.count(_._3).toDouble / t.length - c.count(_._3).toDouble / c.length
      assert(math.abs(r.getDouble(3) - uplift) < 1e-5)
      val rr = (t.count(_._3).toDouble / t.length) / (c.count(_._3).toDouble / c.length)
      assert(math.abs(r.getDouble(4) - rr) < 1e-4)
    }
  }

  test("time_higuchi_fd: brute-force Higuchi replay; FD in [1,2]-ish band") {
    val x = dailySeries().map(_.toDouble)
    val nd = x.length
    val lbars = (1 to 5).map { k =>
      val lms = (0 until k).map { m0 =>
        val idx = (m0 until nd by k).toSeq
        val diffs = idx.sliding(2).collect { case Seq(i, j) => math.abs(x(j) - x(i)) }
        val cnt = idx.length - 1
        val l = diffs.sum * (nd - 1) / (cnt.toDouble * k * k)
        math.floor(l * 1000 + 0.5) / 1000
      }
      lms.sum / k
    }
    val u = (1 to 5).map(k => math.log(1.0 / k))
    val wv = lbars.map(math.log)
    val ub = u.sum / 5; val wb = wv.sum / 5
    val slope = u.zip(wv).map { case (a, b) => (a - ub) * (b - wb) }.sum /
      u.map(a => (a - ub) * (a - ub)).sum
    val row = queries.Extras153.timeHiguchiFd(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - slope) < 1e-4)
    assert(row.getDouble(0) > 0.5 && row.getDouble(0) < 2.5)
  }

  test("dedup_cross_source_matrix: brute-force pair census; symmetric-free s1<s2") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).take(40)))
    val bySig = docs.distinct.groupBy(_._2).filter(_._2.map(_._1).distinct.length > 1)
    val expect = bySig.toSeq.flatMap { case (_, xs) =>
      val srcs = xs.map(_._1).distinct.sorted
      for (i <- srcs.indices; j <- i + 1 until srcs.length) yield (srcs(i), srcs(j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = queries.Extras153.dedupCrossSourceMatrix(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expect.keySet)
    got.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) == expect((r.getString(0), r.getString(1))))
    }
  }

  test("stat_runs_updown: definitional run count replay") {
    val x = dailySeries()
    val signs = x.sliding(2).collect {
      case Seq(a, b) if b != a => if (b > a) 1 else -1
    }.toSeq
    val n = signs.length.toLong
    val runs = 1 + signs.sliding(2).count { case Seq(a, b) => a != b }
    val z = (runs - (2.0 * n - 1) / 3) / math.sqrt((16.0 * n - 29) / 90)
    val row = queries.Extras153.statRunsUpdown(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == runs.toLong)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
    assert(row.getBoolean(3) == (math.abs(z) > 1.96))
  }
}
