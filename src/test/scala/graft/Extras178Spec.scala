package graft

import org.apache.spark.sql.functions._

/** Wave-78 properties: RQA, tsfresh battery, White, Goldfeld–Quandt
  * replayed against brute force on the sf0.001 day series.
  */
class Extras178Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daySeries(): Array[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime).map(_._2).toArray

  test("time_recurrence_quantification: brute-force all-pairs replay") {
    val x = daySeries(); val n = x.length
    val eps = math.max((x.max - x.min) / 10, 1L)
    val rec = (for (i <- 0 until n; j <- i + 1 until n
      if math.abs(x(i) - x(j)) <= eps) yield (i, j)).toSet
    val nDiag = rec.count { case (i, j) =>
      rec.contains((i + 1, j + 1)) || rec.contains((i - 1, j - 1))
    }
    val row = queries.Extras178.timeRecurrenceQuantification(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == rec.size.toLong)
    assert(math.abs(row.getDouble(2) - 2.0 * rec.size / (n.toDouble * (n - 1))) < 1e-6)
    assert(math.abs(row.getDouble(3) - nDiag.toDouble / rec.size) < 1e-6)
  }

  test("time_tsfresh_battery: exact third-moment replay") {
    val x = daySeries().map(BigInt(_)); val n = x.length
    val c3 = (0 until n - 2).map(i => x(i) * x(i + 1) * x(i + 2)).sum
    val d2 = (0 until n - 1).map(i => (x(i + 1) - x(i)) * (x(i + 1) - x(i))).sum
    val ad = (0 until n - 1).map(i => (x(i + 1) - x(i)).abs).sum
    val tr = (0 until n - 2).map(i => x(i + 2) * x(i + 2) * x(i + 1) - x(i + 1) * x(i) * x(i)).sum
    val row = queries.Extras178.timeTsfreshBattery(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - c3.toDouble / (n - 2) / 1e18) < 1e-3)
    assert(math.abs(row.getDouble(2) - math.sqrt(d2.toDouble) / 1e6) < 1e-3)
    assert(math.abs(row.getDouble(3) - ad.toDouble / (n - 1) / 1e6) < 1e-3)
    assert(math.abs(row.getDouble(4) - tr.toDouble / (n - 2) / 1e18) < 1e-3)
  }

  /** Closed-form simple OLS on (t, y): returns (a, b). */
  private def ols(t: Array[Double], y: Array[Double]): (Double, Double) = {
    val n = t.length
    val st = t.sum; val stt = t.map(v => v * v).sum
    val sy = y.sum; val sty = t.indices.map(i => t(i) * y(i)).sum
    val b = (n * sty - st * sy) / (n * stt - st * st)
    ((sy - b * st) / n, b)
  }

  test("stat_white_test: R^2 of e^2 on (t, t^2) replay; 0 <= R2 <= 1") {
    val x = daySeries().map(_.toDouble); val n = x.length
    val t = Array.tabulate(n)(i => (i + 1).toDouble)
    val (a, b) = ols(t, x)
    val qe = t.indices.map { i =>
      val e2 = (x(i) - a - b * t(i)) * (x(i) - a - b * t(i)) / 1e4
      BigInt(math.floor(e2 * 1e2 + 0.5).toLong)
    }
    val su = t.sum; val sv = t.map(v => v * v).sum
    val suu = sv; val svv = t.map(v => v * v * v * v).sum
    val suv = t.map(v => v * v * v).sum
    val sw = qe.sum.toDouble / 1e2
    val swu = t.indices.map(i => qe(i) * BigInt((i + 1).toLong)).sum.toDouble / 1e2
    val swv = t.indices.map(i => qe(i) * BigInt((i + 1).toLong) * BigInt((i + 1).toLong)).sum.toDouble / 1e2
    val sww = qe.map(q => q * q).sum.toDouble / 1e4
    val cuu = suu - su * su / n; val cvv = svv - sv * sv / n; val cuv = suv - su * sv / n
    val cuw = swu - su * sw / n; val cvw = swv - sv * sw / n; val cww = sww - sw * sw / n
    val r2 = (cvv * cuw * cuw - 2 * cuv * cuw * cvw + cuu * cvw * cvw) / (cuu * cvv - cuv * cuv) / cww
    val row = queries.Extras178.statWhiteTest(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - r2) < 1e-4)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1)
    assert(math.abs(row.getDouble(2) - n * r2) < 0.05)
  }

  test("stat_goldfeld_quandt: split-OLS residual variance ratio replay") {
    val x = daySeries().map(_.toDouble); val n = x.length
    def rss(lo: Int, hi: Int): (Int, Double) = { // [lo, hi) 0-based rn-1
      val t = (lo until hi).map(i => (i + 1).toDouble).toArray
      val y = (lo until hi).map(x).toArray
      val (a, b) = ols(t, y)
      (t.length, t.indices.map(i => math.pow(y(i) - a - b * t(i), 2)).sum / 1e4)
    }
    val (n1, r1) = rss(0, n / 3)
    val (n2, r2) = rss(n - n / 3, n)
    val f = (r2 / (n2 - 2)) / (r1 / (n1 - 2))
    val row = queries.Extras178.statGoldfeldQuandt(spark, sf).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(4) - f) < 1e-4)
    assert(row.getDouble(4) > 0)
  }
}
