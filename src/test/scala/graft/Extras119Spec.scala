package graft

import org.apache.spark.sql.functions._

/** Wave-19 properties the DuckDB oracle can't express. */
class Extras119Spec extends SparkSpec {

  test("text_topk_coverage: shares monotone in k and bounded by 1") {
    val rows = queries.Extras119.textTopkCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.sortBy(_._1).sliding(2).forall(p => p.length < 2 || p(0)._2 <= p(1)._2),
      s"coverage share not monotone: ${rows.toSeq}")
    assert(rows.forall(_._2 <= 1.0))
  }

  test("text_token_entropy: every document lands in exactly one band") {
    val total = queries.Extras119.textTokenEntropy(spark, sf)
      .agg(sum("n_docs")).head().getLong(0)
    assert(total == Tables.documents(spark, sf).count(),
      s"histogram covers $total docs, corpus has ${Tables.documents(spark, sf).count()}")
  }

  test("stat_ab_srm: arms partition the distinct users") {
    val r = queries.Extras119.statAbSrm(spark, sf).head()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    assert(r.getDouble(2) >= 0.0)
  }

  test("sample_class_balance: every class kept at exactly the min class size") {
    val rows = queries.Extras119.sampleClassBalance(spark, sf).collect()
    val minBefore = rows.map(_.getLong(1)).min
    assert(rows.forall(_.getLong(2) == minBefore),
      s"classes not equalized to $minBefore: ${rows.map(r => (r.getString(0), r.getLong(2))).toSeq}")
  }

  test("ref_track_speed_qc: violation counts bounded by leg counts") {
    val rows = queries.Extras119.refTrackSpeedQc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      s"user ${r.getLong(0)}: impossible ${r.getLong(2)} > legs ${r.getLong(1)}"))
  }
}
