package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Once-per-corpus stage for the supplier co-purchase PROJECTION —
  * the quadratic heart shared by four graph rows (C291 neighbor
  * Jaccard, C479 Adamic–Adar, C495 rich club, C516 attribute
  * assortativity). Each previously recomputed the capped self-join
  * independently; the pair table with BOTH aggregates (co-customer
  * count and the Adamic–Adar weight sum) is computed once and staged
  * as parquet (ShingleStage/LpaStage discipline — at 100 TB a
  * projection like this is materialized once per release, not once
  * per scorer; the bench charges it to its explicit staging line).
  *
  * The cdeg ∈ [2, GraphHubCap] filter is shared: degree-1 customers
  * cannot produce a pair (so dropping them changes no aggregate) and
  * the hub cap is the fleet-wide quadratic-blowup guard
  * ([[Extras63.GraphHubCap]], no-op on this corpus by
  * GraphHubCapSpec).
  */
private[graft] object CoPurchaseStage {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One row per unordered supplier pair (sa < sb):
    * `n_inter` = shared (hub-capped) customers,
    * `wfx_sum` = Σ floor(1e9/ln(cdeg) + 0.5) over those customers —
    * the exact fixed-point Adamic–Adar numerator.
    */
  def pairStats(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensure(s, d) + "/pairs")

  /** `deg` per supplier over the UNCAPPED distinct edge set — the
    * denominator degree C291's Jaccard has always used (hub-capping
    * applies to pair GENERATION, never to set sizes).
    */
  def degrees(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensure(s, d) + "/degrees")

  private def ensure(s: SparkSession, d: String): String =
    cache.computeIfAbsent(d, _ => {
      val dir = StageTmp.dir("graft_copurchase_")
      val edges0 = lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck")).distinct()
      edges0.groupBy(col("sk"))
        .agg(count(lit(1)).cast("long").as("deg"))
        .write.parquet(dir + "/degrees")
      val edges = edges0
        .withColumn("cdeg", count(lit(1)).over(Window.partitionBy("ck")))
        .filter(col("cdeg") >= 2 && col("cdeg") <= Extras63.GraphHubCap)
        .withColumn("wfx", expr("CAST(floor(1e9 / ln(cdeg) + 0.5) AS BIGINT)"))
      edges.select(col("sk").as("sa"), col("ck"), col("wfx"))
        .join(edges.select(col("sk").as("sb"), col("ck")), "ck")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(count(lit(1)).cast("long").as("n_inter"),
          sum(col("wfx")).cast("long").as("wfx_sum"))
        .write.parquet(dir + "/pairs")
      dir
    })
}
