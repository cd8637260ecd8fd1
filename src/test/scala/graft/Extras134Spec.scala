package graft

import org.apache.spark.sql.functions._

/** Wave-34 properties the DuckDB oracle can't express. */
class Extras134Spec extends SparkSpec {

  test("time_sax_motifs: words over {a,b,c,d}, counts bounded by word total") {
    val rows = queries.Extras134.timeSaxMotifs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val w = r.getString(0)
      assert(w.length == 3 && w.forall("abcd".contains(_)), s"bad SAX word $w")
      assert(r.getLong(1) >= 1)
    }
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(p.getLong(1) >= q.getLong(1), "sorted by frequency")
    }
    val nDays = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate"))).distinct().count()
    val nWords = nDays / 8 - 2 // full segments, minus the two tail positions
    assert(rows.map(_.getLong(1)).sum <= nWords)
  }

  test("stat_benjamini_hochberg: valid p-values, step-up rejection is downward-closed") {
    val rows = queries.Extras134.statBenjaminiHochberg(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.001, "p in [0,1] (+poly eps)")
      assert(math.abs(r.getDouble(4) - r.getLong(3) * 0.05 / 5) < 1e-9)
    }
    // p sorted by rank; rejections form a prefix of the ranking
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(p.getDouble(2) <= q.getDouble(2))
      assert(!(q.getBoolean(5) && !p.getBoolean(5)), "rejected set must be a rank prefix")
    }
  }

  test("win_kaufman_er: ER in [0,1] (triangle inequality), one day brute-forced") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val rows = queries.Extras134.winKaufmanEr(spark, sf).collect()
    assert(rows.length == daily.length - 10)
    rows.foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0 + 1e-9,
          s"${r.get(0)}: ER ${r.getDouble(2)} outside [0,1]")
    }
    val t = 10 // first evaluable index into daily
    val net = math.abs(daily(t) - daily(t - 10)).toDouble
    val vol = (1 to 10).map(i => math.abs(daily(t - 10 + i) - daily(t - 10 + i - 1))).sum
    assert(math.abs(rows.head.getDouble(2) - math.rint(net / vol * 1e6) / 1e6) < 1e-6)
  }

  test("stat_poisson_bootstrap_ci: 32 replicates, CI brackets the full-sample mean") {
    val r = queries.Extras134.statPoissonBootstrapCi(spark, sf).head()
    assert(r.getLong(1) == 32L)
    val (mean, se, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(se > 0.0)
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"80% CI [$lo,$hi] should bracket the full-sample mean $mean")
    assert(r.getLong(0) == Tables.orders(spark, sf).count())
  }
}
