package graft

import org.apache.spark.sql.functions._

/** Wave-35 properties the DuckDB oracle can't express. */
class Extras135Spec extends SparkSpec {

  test("time_weighted_average: span positive, TWA within the value range of the stream") {
    val rows = queries.Extras135.timeWeightedAverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = Tables.events(spark, sf).groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(2) > 0, "span must be positive")
      assert(r.getDouble(3) >= lo - 0.01 && r.getDouble(3) <= hi + 0.01,
        s"${r.getString(0)}: TWA outside value range")
      assert(r.getDouble(4) >= lo - 0.01 && r.getDouble(4) <= hi + 0.01)
    }
  }

  test("sample_contrastive_pairs: positives same-label consecutive, negatives cross-label buddies") {
    val rows = queries.Extras135.sampleContrastivePairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (a, p, kind) = (r.getLong(0), r.getLong(1), r.getString(4))
      if (kind == "pos") {
        assert(labels(a) == labels(p), "positive pair must share the label")
        assert(p > a, "positive is the NEXT vec_id in the label partition")
      } else {
        assert(labels(a) != labels(p), "negative pair must differ in label")
        assert(p == (a ^ 1L), "negative is the vec_id^1 buddy")
      }
    }
    // every label class with >=2 members contributes positives
    val nPos = rows.count(_.getString(4) == "pos")
    val classes = labels.values.groupBy(identity).view.mapValues(_.size)
    assert(nPos == classes.values.filter(_ >= 2).map(_ - 1).sum)
  }

  test("time_locf_gap_limit: census adds up and filling strictly extends observation") {
    val rows = queries.Extras135.timeLocfGapLimit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, no, nf, nu) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(no + nf + nu == nd, "observed + filled + unfillable = spine days")
      assert(no >= 1 && nf >= 0)
      if (nf > 0) assert(r.getLong(5) > 0, "filled days must carry value")
    }
  }

  test("win_hampel_filter: flagged days genuinely deviate, census vs a brute-force recompute") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val flagged = queries.Extras135.winHampelFilter(spark, sf).collect()
    flagged.foreach(r => assert(r.getDouble(3) > 3.0, "deviation must exceed 3 sigma"))
    // brute-force the census with the same lower-median convention
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val brute = daily.indices.count { i =>
      val hood = daily.slice(math.max(0, i - 5), math.min(daily.length, i + 6))
      val med = lowerMedian(hood)
      val mad = lowerMedian(hood.map(x => math.abs(x - med)))
      mad > 0 && math.abs(daily(i) - med) * 10000 > 44478 * mad
    }
    assert(flagged.length == brute, s"engine ${flagged.length} vs brute $brute outliers")
  }
}
