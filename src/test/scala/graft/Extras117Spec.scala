package graft

import org.apache.spark.sql.functions._

/** Wave-17 properties the DuckDB oracle can't express. */
class Extras117Spec extends SparkSpec {

  test("stat_permutation_pvalue: valid smoothed p, full replicate count") {
    val r = queries.Extras117.statPermutationPvalue(spark, sf).head()
    assert(r.getLong(1) == 64, s"expected 64 replicates, got ${r.getLong(1)}")
    val p = r.getDouble(3)
    assert(p > 0.0 && p <= 1.0, s"p-value $p outside (0,1]")
    // the smoothed estimator can never claim impossible certainty
    assert(p >= 1.0 / 65, s"p-value $p below the 1/(K+1) floor")
  }

  test("stat_mcnemar: discordant pairs bounded by the clicking-user count") {
    val r = queries.Extras117.statMcnemar(spark, sf).head()
    val users = Tables.events(spark, sf)
      .filter(col("event_type") === "click").select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) <= users,
      s"b+c=${r.getLong(0) + r.getLong(1)} exceeds clicking users $users")
  }

  test("text_crossdoc_novelty: rates valid and declining over corpus order") {
    val rows = queries.Extras117.textCrossdocNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
    // a saturating shingle space: the first decile (contains doc 0,
    // whose shingles are all first occurrences) outranks the last
    assert(rows(0L) > rows(9L),
      s"novelty did not decline over corpus order: ${rows.toSeq.sortBy(_._1)}")
  }

  test("dedup_simhash_hamming_profile: complete pair mass over the fixed sample") {
    val rows = queries.Extras117.dedupSimhashHammingProfile(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = math.min(Tables.documents(spark, sf).count(), 500L)
    assert(rows.map(_._2).sum == n * (n - 1) / 2,
      s"histogram mass != C($n,2): ${rows.toSeq}")
    assert(rows.forall { case (b, _) => b >= 0 && b <= 8 })
  }

  test("analytics_funnel_strict_gap: stage counts are monotone") {
    val r = queries.Extras117.analyticsFunnelStrictGap(spark, sf).head()
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2),
      s"funnel not monotone: ${r.mkString(",")}")
  }

  test("sql_qualify_emulation: one row per customer, each the per-customer max") {
    val rows = queries.Extras117.sqlQualifyEmulation(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "duplicate customers")
    val maxes = Tables.orders(spark, sf).filter(col("o_custkey") <= 200)
      .groupBy("o_custkey").agg(max("o_totalprice").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(2) == maxes(r.getLong(0)),
        s"cust ${r.getLong(0)}: ${r.getDouble(2)} != max ${maxes(r.getLong(0))}")
    }
  }
}
