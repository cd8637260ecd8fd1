package graft

import org.apache.spark.sql.functions._

/** Wave-21 properties the DuckDB oracle can't express. */
class Extras121Spec extends SparkSpec {

  test("graph_adamic_adar: upper triangle, positive scores, <=5 per anchor") {
    val rows = queries.Extras121.graphAdamicAdar(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "not upper-triangular")
      assert(r.getDouble(2) > 0.0)
    }
    rows.groupBy(_.getLong(0)).foreach { case (sa, rs) =>
      assert(rs.length <= 5, s"anchor $sa has ${rs.length} rows")
    }
  }

  test("graph_adamic_adar: score matches brute-force on a planted pair") {
    // two suppliers share exactly the customers of their joint orders;
    // recompute one pair's score from the raw edge set independently
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet.size }
    val got = queries.Extras121.graphAdamicAdar(spark, sf).collect()
    val sample = got.take(3)
    sample.foreach { r =>
      val (sa, sb) = (r.getLong(0), r.getLong(1))
      val common = bySupp(sa).intersect(bySupp(sb))
      val expected = common.toSeq
        .map(c => math.floor(1e9 / math.log(deg(c).toDouble) + 0.5).toLong)
        .sum / 1e9
      assert(math.abs(r.getDouble(2) - expected) < 1e-6,
        s"pair ($sa,$sb): got ${r.getDouble(2)}, brute-force $expected")
    }
  }

  test("stat_jarque_bera: stat non-negative, n sums to events count") {
    val rows = queries.Extras121.statJarqueBera(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(3) >= 0.0, s"JB < 0 for ${r.getString(0)}"))
  }

  test("analytics_hhi_concentration: hhi in (0, 10000], bands consistent") {
    val rows = queries.Extras121.analyticsHhiConcentration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hhi = r.getDouble(2)
      assert(hhi > 0.0 && hhi <= 10000.0, s"${r.getString(0)}: hhi $hhi")
      // HHI >= 10000 / n_suppliers (equal shares minimize concentration)
      assert(hhi >= 10000.0 / r.getLong(1) - 1e-6)
      val band = r.getString(3)
      if (hhi < 1500) assert(band == "competitive")
      else if (hhi <= 2500) assert(band == "moderate")
      else assert(band == "concentrated")
    }
  }

  test("text_hapax_ratio: hapax <= vocab <= tokens, ratios in (0, 1]") {
    val rows = queries.Extras121.textHapaxRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("stat_g_test: G >= 0 (2*KL), dof = (r-1)(c-1)") {
    val r = queries.Extras121.statGTest(spark, sf).head()
    assert(r.getDouble(0) >= -1e-6, s"G = ${r.getDouble(0)}")
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    val srcs = Tables.documents(spark, sf).select("source").distinct().count()
    assert(r.getLong(1) == (langs - 1) * (srcs - 1))
  }

  test("win_cutler_rsi: bounded in [0, 100], no NULL in the 60-day report tail") {
    val rows = queries.Extras121.winCutlerRsi(spark, sf).collect()
    assert(rows.length == 60)
    // the series is years long, so the report tail is past the warmup
    rows.foreach { r =>
      assert(!r.isNullAt(1), s"${r.get(0)}: NULL rsi in tail")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 100.0)
    }
  }
}
