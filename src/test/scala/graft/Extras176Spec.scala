package graft

import org.apache.spark.sql.functions._

/** Wave-76 properties: Moran's I, Geary's C, Cox–Stuart, turning
  * points replayed against brute force on the sf0.001 day series.
  */
class Extras176Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daySeries(): Array[Double] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime).map(_._2.toDouble).toArray

  test("stat_morans_i: brute-force lag-1 Moran replay; moments sane") {
    val x = daySeries(); val n = x.length
    val mean = x.sum / n
    val z = x.map(_ - mean)
    val zz = (0 until n - 1).map(i => z(i) * z(i + 1)).sum
    val z2 = z.map(v => v * v).sum
    val s0 = 2.0 * (n - 1)
    val i = n / s0 * (2 * zz) / z2
    val e = -1.0 / (n - 1)
    val s1 = 4.0 * (n - 1); val s2 = 16.0 * n - 24
    val v = (n.toDouble * n * s1 - n * s2 + 3 * s0 * s0) / ((n.toDouble * n - 1) * s0 * s0) - e * e
    val row = queries.Extras176.statMoransI(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - i) < 1e-5)
    assert(math.abs(row.getDouble(2) - e) < 1e-6)
    assert(math.abs(row.getDouble(3) - (i - e) / math.sqrt(v)) < 1e-4)
  }

  test("stat_gearys_c: brute-force lag-1 Geary replay; C complements I") {
    val x = daySeries(); val n = x.length
    val mean = x.sum / n
    val z2 = x.map(v => (v - mean) * (v - mean)).sum
    val d2 = (0 until n - 1).map(i => (x(i) - x(i + 1)) * (x(i) - x(i + 1))).sum
    val s0 = 2.0 * (n - 1)
    val c = (n - 1) / (2 * s0) * (2 * d2) / z2
    val s1 = 4.0 * (n - 1); val s2 = 16.0 * n - 24
    val v = ((n - 1) * (2 * s1 + s2) - 4 * s0 * s0) / (2.0 * (n + 1) * s0 * s0)
    val row = queries.Extras176.statGearysC(spark, sf).collect().head
    assert(math.abs(row.getDouble(1) - c) < 1e-5)
    assert(math.abs(row.getDouble(2) - v) < 1e-6)
    assert(math.abs(row.getDouble(3) - (c - 1) / math.sqrt(v)) < 1e-3)
    // positive autocorrelation shows as I > E[I] together with C < 1
    val i = queries.Extras176.statMoransI(spark, sf).collect().head.getDouble(1)
    assert((i > -1.0 / (n - 1)) == (c < 1.0) || math.abs(c - 1) < 0.05)
  }

  test("stat_cox_stuart: pairing replay, odd/even split handling") {
    val x = daySeries(); val n = x.length
    val m = n / 2
    val off = (n - n % 2) / 2 + n % 2
    val pairs = (0 until m).map(i => (x(i), x(i + off)))
    val sPlus = pairs.count(p => p._2 > p._1)
    val k = pairs.count(p => p._2 != p._1)
    val z =
      if (2 * sPlus == k) 0.0
      else (math.abs(sPlus - k / 2.0) - 0.5) / math.sqrt(k / 4.0) *
        (if (2 * sPlus > k) 1 else -1)
    val row = queries.Extras176.statCoxStuart(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == k.toLong &&
      row.getLong(2) == sPlus.toLong)
    assert(math.abs(row.getDouble(3) - z) < 1e-5)
  }

  test("time_turning_points: strict local extrema replay") {
    val x = daySeries(); val n = x.length
    val tp = (1 until n - 1).count(t =>
      (x(t) > x(t - 1) && x(t) > x(t + 1)) || (x(t) < x(t - 1) && x(t) < x(t + 1)))
    val e = 2.0 * (n - 2) / 3
    val v = (16.0 * n - 29) / 90
    val row = queries.Extras176.timeTurningPoints(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == tp.toLong)
    assert(math.abs(row.getDouble(2) - e) < 1e-3)
    assert(math.abs(row.getDouble(3) - (tp - e) / math.sqrt(v)) < 1e-4)
  }
}
