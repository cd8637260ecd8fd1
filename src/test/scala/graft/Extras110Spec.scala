package graft

import org.apache.spark.sql.functions._

/** Wave-10 properties: dispersion must be a positive finite ratio, and
  * the migration matrix must be a complete partition of the customer
  * population (every customer counted exactly once).
  */
class Extras110Spec extends SparkSpec {

  test("stat_poisson_dispersion: positive, finite, cells consistent") {
    val r = queries.Extras110.statPoissonDispersion(spark, sf).head()
    val (n, total, vmr) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n > 0 && total >= n, s"cells=$n events=$total")
    assert(vmr > 0.0 && !vmr.isNaN && !vmr.isInfinite, s"vmr=$vmr")
  }

  test("analytics_rfm_migration: matrix partitions the customer population") {
    val out = queries.Extras110.analyticsRfmMigration(spark, sf)
    val matrixTotal = out.agg(sum(col("n_customers"))).head().getLong(0)
    val popTotal = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(matrixTotal == popTotal,
      s"matrix counts $matrixTotal customers, population is $popTotal")
    // 'new' can never be a destination, 'churned' never a source
    assert(out.filter(col("seg_to") === "new").count() == 0)
    assert(out.filter(col("seg_from") === "churned").count() == 0)
  }
}
