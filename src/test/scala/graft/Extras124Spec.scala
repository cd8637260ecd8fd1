package graft

import org.apache.spark.sql.functions._

/** Wave-24 properties the DuckDB oracle can't express. */
class Extras124Spec extends SparkSpec {

  test("stat_kruskal_wallis: H >= 0, n = events count, dof = k-1") {
    val r = queries.Extras124.statKruskalWallis(spark, sf).head()
    assert(r.getLong(0) == Tables.events(spark, sf).count())
    val k = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(r.getLong(1) == k - 1)
    assert(r.getDouble(2) >= 0.0)
  }

  test("analytics_session_path_topk: 10 paths, 3 segments each, counts descending") {
    val rows = queries.Extras124.analyticsSessionPathTopk(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ =>
    }
  }

  test("pipeline_oversample_minority: n_after = n_orig * factor, majority factor 1") {
    val rows = queries.Extras124.pipelineOversampleMinority(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxAfter = rows.map(_.getLong(3)).max
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * r.getLong(2),
        s"${r.getString(0)}: generator count != n*factor")
      assert(r.getDouble(4) > 0.5, s"${r.getString(0)}: still imbalanced after oversample")
    }
    assert(rows.exists(_.getLong(2) == 1L), "majority class should have factor 1")
    assert(maxAfter == rows.filter(_.getLong(2) == 1).map(_.getLong(1)).max)
  }

  test("time_peak_detection: each reported day beats all +-7 neighbors (brute force)") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(r => (r.get(0), r.getLong(1)))
    val idx = daily.zipWithIndex.map { case ((d2, _), i) => d2 -> i }.toMap
    val got = queries.Extras124.timePeakDetection(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { r =>
      val i = idx(r.get(0))
      val neigh = ((i - 7) to (i + 7)).filter(j => j != i && j >= 0 && j < daily.length)
      assert(neigh.forall(j => daily(j)._2 < daily(i)._2),
        s"${r.get(0)} is not a strict local max")
    }
  }

  test("embed_triplet_mining: 100 anchors, hard ids differ from anchor, sims in [-1,1]") {
    val rows = queries.Extras124.embedTripletMining(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getLong(1) != r.getLong(0) && r.getLong(3) != r.getLong(0))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-6)
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-6)
      // violation flag consistent with the reported sims
      assert(r.getBoolean(5) == (r.getDouble(4) >= r.getDouble(2)))
    }
  }

  test("stat_cochran_q: Q >= 0 and incidence threshold leaves a non-degenerate table") {
    val r = queries.Extras124.statCochranQ(spark, sf).head()
    assert(r.getLong(1) == 5L, "k should be the 5 event types")
    assert(!r.isNullAt(2), "Q must be defined (non-saturated incidence)")
    assert(r.getDouble(2) >= 0.0)
  }
}
