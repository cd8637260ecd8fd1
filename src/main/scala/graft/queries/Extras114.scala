package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** 114th wave — the POINT-IN-TIME (temporal) dimension join: facts
  * joined to the SCD2 dimension version that was valid on the fact
  * date — the lookup every warehouse with slowly-changing dimensions
  * runs constantly, composing C-dim_scd2_intervals' version table with
  * a validity-interval join.
  */
object Extras114 {

  /** join_scd2_pointintime — each lineitem shipment resolves the
    * customer's order-status VERSION valid on its ship date (the SCD2
    * table from dim_scd2_intervals: each order opens a version, closed
    * by the next order's date). Join shape: an EQUI hash join on
    * custkey with the validity range as a residual filter — versions
    * per customer are bounded (their order count), so the residual
    * scan is O(versions_per_key), not a cartesian; intervals are
    * disjoint half-open [from, to), so AT MOST one version matches
    * and no dedup step exists to get wrong. Shipments dated BEFORE
    * the customer's first version (the generator unties ship dates
    * from order dates — measured: ~8% of lineitems) take the
    * late-arriving-dimension treatment: LEFT join, status 'UNKNOWN' —
    * every fact lands in exactly one bucket (totality spec-asserted
    * against raw lineitem counts and revenue). Output: per-status
    * shipment counts and exact-decimal revenue — the bounded rollup
    * a dashboard reads. At 100 TB the dimension side is
    * broadcast/bucketed by key; the range residual costs nothing
    * extra.
    */
  def joinScd2Pointintime(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val dim = orders(s, d).select(
        col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"))
    val facts = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate"),
        (col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
          .as("cents"))
    facts.join(dim,
        facts("o_custkey") === dim("o_custkey")
          && col("l_shipdate") >= col("valid_from")
          && (col("valid_to").isNull || col("l_shipdate") < col("valid_to")),
        "left")
      .groupBy(coalesce(col("o_orderstatus"), lit("UNKNOWN"))
        .as("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy("o_orderstatus")
  }
  val joinScd2PointintimeSql: String =
    """WITH dim AS (
      |  SELECT o_custkey, o_orderstatus,
      |    o_orderdate AS valid_from,
      |    lead(o_orderdate, 1) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |      AS valid_to
      |  FROM orders),
      |facts AS (
      |  SELECT o.o_custkey, l.l_shipdate,
      |    CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
      |SELECT coalesce(d.o_orderstatus, 'UNKNOWN') AS o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(f.cents) AS BIGINT) AS revenue_cents
      |FROM facts f LEFT JOIN dim d ON d.o_custkey = f.o_custkey
      |  AND f.l_shipdate >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_scd2_pointintime" -> (joinScd2Pointintime _))

  val oracle: Map[String, String] = Map(
    "join_scd2_pointintime" -> joinScd2PointintimeSql)
}
