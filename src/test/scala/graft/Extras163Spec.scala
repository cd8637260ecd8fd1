package graft

import org.apache.spark.sql.functions._

/** Wave-63 properties: log-rank, AD exponentiality, Sortino, Taylor
  * replays against brute force on sf0.001.
  */
class Extras163Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def leadTimes(): Array[(Long, Boolean)] = {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate)).toMap
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_discount").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay -
          od(r.getLong(0)).toEpochDay
        (t, r.getDouble(2) >= 0.05)
      }.filter(_._1 >= 1)
  }

  test("stat_logrank_test: per-time hypergeometric replay with the same quantization") {
    val ev = leadTimes()
    val times = ev.map(_._1).distinct.sorted
    def q6(num: BigInt, den: BigInt): BigInt = num * 1000000 / den
    var o1 = 0L; var se6 = BigInt(0); var sv6 = BigInt(0)
    times.foreach { t =>
      val dt = ev.count(_._1 == t).toLong
      val d1t = ev.count(x => x._1 == t && x._2).toLong
      val nt = ev.count(_._1 >= t).toLong
      val n1t = ev.count(x => x._1 >= t && x._2).toLong
      o1 += d1t
      se6 += q6(BigInt(dt) * n1t, nt)
      if (nt > 1)
        sv6 += q6(BigInt(dt) * n1t * (nt - n1t) * (nt - dt), BigInt(nt) * nt * (nt - 1))
    }
    val chi2 = math.pow(o1 - se6.toDouble / 1e6, 2) / (sv6.toDouble / 1e6)
    val row = queries.Extras163.statLogrankTest(spark, sf).collect().head
    assert(row.getLong(0) == times.length.toLong)
    assert(row.getLong(1) == o1)
    assert(math.abs(row.getDouble(2) - se6.toDouble / 1e6) < 1e-2)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-2)
    assert(row.getBoolean(4) == (chi2 > 3.841))
  }

  test("stat_anderson_darling_exp: per-row textbook A2 within quantization tolerance") {
    val ts = leadTimes().map(_._1).sorted
    val n = ts.length
    val lambdaInv = ts.sum.toDouble / n // mean
    def f(x: Long) = 1 - math.exp(-x / lambdaInv)
    val a2 = -n - (1.0 / n) * ts.zipWithIndex.map { case (x, i0) =>
      val i = i0 + 1
      (2 * i - 1).toDouble *
        (math.log(f(x)) + math.log(1 - f(ts(n - i0 - 1))))
    }.sum
    val row = queries.Extras163.statAndersonDarlingExp(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    // the query quantizes logs at 1e-9; weighted by ~n^2 terms -> small drift allowed
    assert(math.abs(row.getDouble(1) - a2) / math.max(1, math.abs(a2)) < 1e-3)
    assert(row.getBoolean(2) == (row.getDouble(1) > 1.341))
  }

  test("win_sortino_ratio: quantized log-return replay") {
    val days = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val rqs = days.sliding(2).map { case Seq(a, b) =>
      math.floor(math.log(b.toDouble / a) * 1e9 + 0.5).toLong
    }.toSeq
    val n = rqs.length
    val mean = rqs.sum.toDouble / n / 1e9
    val down = math.sqrt(rqs.filter(_ < 0).map(r => BigInt(r) * r).sum.toDouble / n) / 1e9
    val row = queries.Extras163.winSortinoRatio(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == rqs.count(_ < 0).toLong)
    assert(math.abs(row.getDouble(2) - mean) < 1e-7)
    assert(math.abs(row.getDouble(3) - down) < 1e-7)
    assert(math.abs(row.getDouble(4) - mean / down) < 1e-4)
  }

  test("stat_taylor_power_law: per-part moment replay; b in a plausible band") {
    val parts = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.length >= 5)
    val pts = parts.values.flatMap { qs =>
      val n = qs.length.toLong; val sq = qs.sum; val qq = qs.map(q => q * q).sum
      val d0 = n * qq - sq * sq
      if (d0 > 0) {
        val xq = math.floor(math.log(sq.toDouble / n) * 1e9 + 0.5).toLong
        val yq = math.floor(math.log(d0.toDouble / (n.toDouble * n)) * 1e9 + 0.5).toLong
        Some((xq, yq))
      } else None
    }.toSeq
    val m = pts.length
    val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val cxy = (BigInt(m) * sxy - sx * sy).toDouble
    val cxx = (BigInt(m) * sxx - sx * sx).toDouble
    val cyy = (BigInt(m) * syy - sy * sy).toDouble
    val row = queries.Extras163.statTaylorPowerLaw(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - cxy / cxx) < 1e-4)
    assert(math.abs(row.getDouble(3) - cxy * cxy / (cxx * cyy)) < 1e-4)
    assert(row.getDouble(1) > -1 && row.getDouble(1) < 4) // plausible Taylor band
  }
}
