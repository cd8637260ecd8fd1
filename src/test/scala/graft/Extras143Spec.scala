package graft

import org.apache.spark.sql.functions._

/** Wave-43 properties: BigInt replays of the variance-scaling,
  * discounting, EWM, and extreme-outlier rows.
  */
class Extras143Spec extends SparkSpec {

  private def dailyCents(): Array[Long] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  private def popVar(xs: Seq[Long]): Double = {
    val m = BigInt(xs.length)
    val s = xs.map(BigInt(_)).sum
    val ss = xs.map(v => BigInt(v) * v).sum
    (m * ss - s * s).toDouble / (m.toDouble * m.toDouble)
  }

  test("stat_variance_ratio: BigInt replay; VR of the 1-diff series is its own scale") {
    val c = dailyCents()
    val q = 5
    val r = c.sliding(2).map(p => p(1) - p(0)).toSeq
    val sq = c.indices.dropRight(q).map(i => c(i + q) - c(i))
    val vr = popVar(sq) / q / popVar(r)
    val z = (vr - 1) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * r.length))
    val row = queries.Extras143.statVarianceRatio(spark, sf).collect().head
    assert(row.getLong(0) == r.length.toLong)
    assert(math.abs(row.getDouble(1) - vr) < 1e-5, s"VR ${row.getDouble(1)} vs $vr")
    assert(math.abs(row.getDouble(2) - z) < 1e-4)
    // anti-persistent daily revenue => VR well below 1
    assert(vr > 0 && vr < 2)
  }

  test("analytics_ltv_discounted: replay with the same gamma table; discount never exceeds nominal") {
    val gamma = (0 to 119).map(k => math.round(math.pow(0.95, k) * 1e9))
    val rowsIn = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS r")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val cohort = rowsIn.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byCohort = rowsIn.groupBy(t => cohort(t._1))
    val got = queries.Extras143.analyticsLtvDiscounted(spark, sf).collect()
    assert(got.length == byCohort.size)
    got.foreach { g =>
      val cm = g.getLong(0).toInt
      val os = byCohort(cm)
      assert(g.getLong(1) == os.map(_._1).distinct.length.toLong)
      val nominal = os.map(_._3).sum
      val disc = os.map { case (_, m, r) =>
        BigInt(r) * gamma(math.min(m - cm, 119)) }.sum
      assert(math.abs(g.getDouble(2) - nominal.toDouble / 100) < 1e-3)
      assert(math.abs(g.getDouble(3) - disc.toDouble / 1e9 / 100) < 1e-3)
      assert(g.getDouble(3) <= g.getDouble(2) + 1e-9, "discounting increased value")
    }
  }

  test("win_ewm_variance: exact integer replay of the last 30 days") {
    val c = dailyCents()
    def at(i: Int) = if (i >= 0) BigInt(c(i)) else BigInt(0)
    val expect = (math.max(0, c.length - 30) until c.length).map { t =>
      val m256 = (0 to 7).map(k => at(t - k) * (1L << (7 - k))).sum
      val s256 = (0 to 7).map(k => at(t - k) * at(t - k) * (1L << (7 - k))).sum
      val v16 = (s256 * 256 - m256 * m256).toDouble
      math.sqrt(v16) / 256 / 100
    }
    val got = queries.Extras143.winEwmVariance(spark, sf).collect().map(_.getDouble(1))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-4, s"$g vs $e")
      assert(g >= 0)
    }
  }

  test("stat_grubbs_extreme: replay picks the same day and G") {
    val rows = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val n = BigInt(rows.length)
    val sc = rows.map(t => BigInt(t._2)).sum
    val scc = rows.map(t => BigInt(t._2) * t._2).sum
    val (day, cv, dev) = rows.map { case (d0, c0) =>
      (d0, c0, (BigInt(c0) * n - sc).abs) }.maxBy(t => (t._3, -t._1.getTime))
    val g = dev.toDouble / math.sqrt((n * scc - sc * sc).toDouble)
    val row = queries.Extras143.statGrubbsExtreme(spark, sf).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getTimestamp(1) == day, s"${row.getTimestamp(1)} vs $day")
    assert(math.abs(row.getDouble(2) - cv.toDouble / 100) < 1e-6)
    assert(math.abs(row.getDouble(3) - g) < 1e-5)
    assert(g > 0)
  }
}
