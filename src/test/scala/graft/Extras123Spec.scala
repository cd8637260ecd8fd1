package graft

import org.apache.spark.sql.functions._

/** Wave-23 properties the DuckDB oracle can't express. */
class Extras123Spec extends SparkSpec {

  test("embed_cosine_histogram: buckets in [-10, 10], pair count conserved") {
    val rows = queries.Extras123.embedCosineHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) >= -10 && r.getLong(0) <= 10))
    val nprobe = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 500).count()
    assert(rows.map(_.getLong(1)).sum == nprobe * (nprobe - 1) / 2)
  }

  test("agg_trimmed_mean: keeps ~80%, lies between min and max, robust vs raw mean") {
    val rows = queries.Extras123.aggTrimmedMean(spark, sf).collect()
    val totals = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach { r =>
      val (n, lo, hi) = totals(r.getString(0))
      assert(r.getLong(1) == n - 2 * (n / 10), s"${r.getString(0)}: kept ${r.getLong(1)} of $n")
      assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi)
    }
  }

  test("sql_window_exclude: emulation equals direct leave-one-out recompute") {
    // recompute avg_others from the daily series directly
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect()
      .map(r => (r.get(0), r.getLong(1)))
    val expected = daily.zipWithIndex.map { case ((day, _), i) =>
      val lo = math.max(0, i - 5)
      val hi = math.min(daily.length - 1, i + 5)
      val others = (lo to hi).filter(_ != i).map(j => daily(j)._2)
      day -> math.rint(others.sum.toDouble / others.length / 100 * 1e6) / 1e6
    }.toMap
    val got = queries.Extras123.sqlWindowExclude(spark, sf).collect()
    assert(got.length == 50)
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - expected(r.get(0))) < 1e-6,
        s"${r.get(0)}: ${r.getDouble(2)} != ${expected(r.get(0))}")
    }
  }

  test("stat_cramer_von_mises: T >= lower bound -(4nm-1)/(6nm... ) sanity and symmetry inputs") {
    val r = queries.Extras123.statCramerVonMises(spark, sf).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na > 0 && nb >= na)
    // theoretical minimum of T is 1/(6N) - (something small); assert loose bound
    assert(r.getDouble(2) > -1.0 && r.getDouble(2) < 10.0)
  }

  test("graph_rich_club: phi in [0, 1], candidate-club size shrinks as k grows") {
    val rows = queries.Extras123.graphRichClub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getLong(2) <= r.getLong(1) * (r.getLong(1) - 1) / 2)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(1) <= a.getLong(1), "N_k not monotone")
      case _ =>
    }
  }

  test("win_sma_cross: crosses alternate golden/death along time") {
    val rows = queries.Extras123.winSmaCross(spark, sf).collect()
    assert(rows.nonEmpty, "multi-year series should cross at least once")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(1) != b.getString(1),
          s"consecutive ${a.getString(1)} crosses at ${b.get(0)}")
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(3) > 0))
  }
}
