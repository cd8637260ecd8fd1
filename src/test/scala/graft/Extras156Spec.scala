package graft

import org.apache.spark.sql.functions._

/** Wave-56 properties: Page's L, PPS invariants, count(*) pushdown
  * plan shape, pivot census replays on sf0.001.
  */
class Extras156Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_page_trend_l: definitional rank-sum replay") {
    val cells = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"),
        col("l_extendedprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val years = cells.keys.map(_._1).toSeq.distinct
    val quarters = cells.keys.map(_._2).toSeq.distinct.sorted
    var l = 0L
    years.foreach { y =>
      val qs = quarters.filter(q => cells.contains((y, q)))
      val ranked = qs.sortBy(q => (cells((y, q)), q)).zipWithIndex
      ranked.foreach { case (q, i) => l += q.toLong * (i + 1) }
    }
    val b = years.length.toLong; val k = quarters.length.toLong
    val e = b.toDouble * k * (k + 1) * (k + 1) / 4
    val v = b.toDouble * k * k * (k + 1) * (k * k - 1) / 144
    val z = (l - e) / math.sqrt(v)
    val row = queries.Extras156.statPageTrendL(spark, sf).collect().head
    assert(row.getLong(0) == b && row.getLong(1) == k)
    assert(row.getLong(2) == l)
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
    assert(row.getBoolean(4) == (math.abs(z) > 1.96))
  }

  test("sample_pps_systematic: total hits == m exactly; brute-force hit replay") {
    val rev = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val w = rev.map(x => BigInt(x._2)).sum
    var before = BigInt(0)
    var sel = 0L; var cert = 0L; var hitsSum = 0L; var selW = BigInt(0)
    rev.foreach { case (_, rc) =>
      val h = ((before + rc) * 100 / w - before * 100 / w).toLong
      if (h > 0) { sel += 1; selW += rc }
      if (h > 1) cert += 1
      hitsSum += h
      before += rc
    }
    val row = queries.Extras156.samplePpsSystematic(spark, sf).collect().head
    assert(row.getLong(0) == rev.length.toLong)
    assert(row.getLong(1) == 100L && hitsSum == 100L) // the PPS invariant
    assert(row.getLong(2) == sel && row.getLong(3) == cert)
    assert(math.abs(row.getDouble(4) - selW.toDouble / w.toDouble) < 1e-5)
  }

  test("scan_count_star_pushdown: empty read schema (metadata-only scan) + exact counts") {
    val df = queries.Extras156.scanCountStarPushdown(spark, sf)
    val root = df.queryExecution.executedPlan
    val inner = root.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
    }
    val scans = (root +: inner).flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    })
    assert(scans.nonEmpty)
    scans.foreach(f => assert(f.requiredSchema.isEmpty,
      s"count(*) scan read columns: ${f.requiredSchema.fieldNames.mkString(",")}"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("lineitem") == Tables.lineitem(spark, sf).count())
    assert(got("orders") == Tables.orders(spark, sf).count())
    assert(got("customer") == Tables.customer(spark, sf).count())
  }

  test("win_pivot_points: brute-force OHLC pivot replay") {
    val bars = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue, cents(r.getDouble(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) =>
        val ps = xs.map(_._2)
        (ps.map(_._3).max, ps.map(_._3).min, ps.maxBy(t => (t._1, t._2))._3)
      }
    var (nAbove, nBelow, nR1, nS1, sad, n) = (0L, 0L, 0L, 0L, 0L, 0L)
    bars.sliding(2).foreach { case Seq((ph, pl, pc), (_, _, c)) =>
      val sPrev = ph + pl + pc
      n += 1
      if (3 * c > sPrev) nAbove += 1
      if (3 * c < sPrev) nBelow += 1
      if (3 * c > 2 * sPrev - 3 * pl) nR1 += 1
      if (3 * c < 2 * sPrev - 3 * ph) nS1 += 1
      sad += math.abs(3 * c - sPrev)
    }
    val row = queries.Extras156.winPivotPoints(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == nAbove && row.getLong(2) == nBelow)
    assert(row.getLong(3) == nR1 && row.getLong(4) == nS1)
    assert(math.abs(row.getDouble(5) - sad.toDouble / (3 * n) / 100) < 1e-3)
  }
}
