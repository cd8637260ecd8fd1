package graft

import org.apache.spark.sql.functions._

/** Wave-45 properties: ACF/OLS replays, apportionment invariants,
  * record census.
  */
class Extras145Spec extends SparkSpec {

  private def dailyCents(): Array[Long] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  test("time_dominant_period: BigInt ACF replay picks the same top-3") {
    val c = dailyCents()
    def acf(k: Int): (Long, Double) = {
      val pairs = c.indices.dropRight(k).map(i => (BigInt(c(i)), BigInt(c(i + k))))
      val m = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      (pairs.length.toLong,
        (m * sxy - sx * sy).toDouble /
          math.sqrt((m * sxx - sx * sx).toDouble) /
          math.sqrt((m * syy - sy * sy).toDouble))
    }
    val brute = (2 to 30).map(k => (k.toLong, acf(k)))
      .sortBy { case (k, (_, a)) => (-a, k) }.take(3)
    val got = queries.Extras145.timeDominantPeriod(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.zip(brute).foreach { case ((gk, gm, ga), (bk, (bm, ba))) =>
      assert(gk == bk, s"period order diverges: ${got.toSeq} vs $brute")
      assert(gm == bm)
      assert(math.abs(ga - ba) < 1e-5)
    }
  }

  test("graph_powerlaw_fit: replay from the degree histogram; slope negative, r2 in [0,1]") {
    val degs = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), col("o_custkey")).distinct()
      .groupBy("l_suppkey").count().collect().map(_.getLong(1))
    val hist = degs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pts = hist.toSeq.map { case (d0, cnt) =>
      (BigInt(math.floor(math.log(d0.toDouble) * 1e9 + 0.5).toLong),
        BigInt(math.floor(math.log(cnt.toDouble) * 1e9 + 0.5).toLong))
    }
    val n = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val num = (n * sxy - sx * sy).toDouble
    val dx = (n * sxx - sx * sx).toDouble
    val dy = (n * syy - sy * sy).toDouble
    val row = queries.Extras145.graphPowerlawFit(spark, sf).collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(math.abs(row.getDouble(1) - num / dx) < 1e-5)
    assert(math.abs(row.getDouble(2) - num / dx * num / dy) < 1e-5)
    assert(row.getDouble(2) >= -1e-9 && row.getDouble(2) <= 1.0 + 1e-9)
  }

  test("sample_largest_remainder: allocations sum to exactly 1000; within one slot of quota") {
    val rows = queries.Extras145.sampleLargestRemainder(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue))
    val nn = rows.map(_._2).sum
    assert(rows.map(_._3).sum == 1000L, "largest-remainder total != budget")
    rows.foreach { case (k, n, a) =>
      val quota = 1000.0 * n / nn
      assert(a >= math.floor(quota).toLong && a <= math.floor(quota).toLong + 1,
        s"stratum $k alloc $a outside [floor, floor+1] of quota $quota")
    }
  }

  test("time_record_breaking_days: brute census; harmonic expectation exact") {
    val c = dailyCents()
    var mx = Long.MinValue
    var rec = 0L
    c.foreach { v => if (v > mx) { rec += 1; mx = v } }
    val hfx = (1 to c.length).map(t => 1000000000000L / t).sum
    val row = queries.Extras145.timeRecordBreakingDays(spark, sf).collect().head
    assert(row.getLong(0) == c.length.toLong)
    assert(row.getLong(1) == rec)
    assert(math.abs(row.getDouble(2) - hfx / 1e12) < 1e-6)
    assert(row.getLong(1) >= 1)
  }
}
