package graft

import org.apache.spark.sql.functions._

/** The PIT join's totality invariant: disjoint half-open versions mean
  * every shipment matches exactly one version, so the rollup must
  * account for every lineitem exactly once.
  */
class Extras114Spec extends SparkSpec {

  test("join_scd2_pointintime accounts for every lineitem exactly once") {
    val out = queries.Extras114.joinScd2Pointintime(spark, sf)
    val matched = out.agg(sum(col("n_items"))).head().getLong(0)
    val total = Tables.lineitem(spark, sf).count()
    assert(matched == total,
      s"PIT join matched $matched of $total lineitems — versions are " +
        "not a disjoint cover of ship dates")
    val revenue = out.agg(sum(col("revenue_cents"))).head().getLong(0)
    val trueRevenue = Tables.lineitem(spark, sf)
      .agg(sum((col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("long"))).head().getLong(0)
    assert(revenue == trueRevenue, "revenue double-counted or dropped")
  }
}
