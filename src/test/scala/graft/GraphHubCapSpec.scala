package graft

import org.apache.spark.sql.functions._

/** The hub cap in the two co-occurrence self-joins
  * (Extras63.graphNeighborJaccard, Extras97.graphBipartiteProjection)
  * promises to be an exact no-op on this corpus — this spec MEASURES
  * that promise instead of assuming it, and pins the cap's contract.
  */
class GraphHubCapSpec extends SparkSpec {

  private def edges = Tables.lineitem(spark, sf)
    .select(col("l_suppkey"), col("l_orderkey"))
    .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
      col("l_orderkey") === col("o_orderkey"))
    .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck")).distinct()

  test("hub cap is a measured no-op: max customer degree is far below the bound") {
    val maxDeg = edges.groupBy("ck").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= graft.queries.Extras63.GraphHubCap,
      s"corpus outgrew the hub cap (max customer degree $maxDeg): the " +
        "graph rows' results now genuinely exclude hub co-occurrence — " +
        "re-derive the recall bound and raise or justify the cap")
    // "far below": if the margin thins to <4x, the no-op claim is at
    // risk at the next sf jump — fail early rather than in the oracle
    assert(maxDeg * 4 <= graft.queries.Extras63.GraphHubCap,
      s"max customer degree $maxDeg within 4x of the cap")
  }

  test("capped pair emission equals the uncapped self-join on this corpus") {
    val e = edges.cache()
    try {
      val uncapped = e.select(col("sk").as("sa"), col("ck"))
        .join(e.select(col("sk").as("sb"), col("ck")), "ck")
        .filter(col("sa") < col("sb")).count()
      val cappedEdges = e
        .withColumn("cdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("ck")))
        .filter(col("cdeg") <= graft.queries.Extras63.GraphHubCap).drop("cdeg")
      val capped = cappedEdges.select(col("sk").as("sa"), col("ck"))
        .join(cappedEdges.select(col("sk").as("sb"), col("ck")), "ck")
        .filter(col("sa") < col("sb")).count()
      assert(capped == uncapped,
        s"cap dropped ${uncapped - capped} of $uncapped pair emissions")
    } finally { e.unpersist(); () }
  }
}
