package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Flagship multi-join analytical queries (TPC-H Q3/Q5 shapes) and
  * subquery forms — the workloads whose physical plans exercise the
  * optimizer end to end: join ordering over a star schema, dimension
  * broadcasting, partial aggregation above a join tree, and subquery
  * decorrelation (RewriteCorrelatedScalarSubquery).
  *
  * Scale shape: facts (lineitem, orders) shuffle only on their join
  * keys; fixed-size dimensions (nation, region) are broadcast;
  * scale-factor-dependent tables (customer, supplier) are left to
  * AQE so they broadcast while small and shuffle once they don't fit;
  * aggregations sit above the joins with map-side combine. This is
  * the plan a 1000-executor cluster wants for a star-schema rollup.
  */
object Analytics {

  /** analytics_q3_shape — top-10 open orders by potential revenue
    * within a market segment (TPC-H Q3 shape: σ on two dims, 3-way
    * join, agg, top-k).
    */
  def analyticsQ3Shape(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp_ntz"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsumx(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  val analyticsQ3ShapeSql: String =
    s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
       |  ${dsumxSql(s"${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")}")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1996-06-30'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** analytics_q5_shape — revenue by nation across the full star
    * (TPC-H Q5 shape: 6-way join, fact keys shuffled, aggregate at
    * the top).
    *
    * Broadcast hints only on the FIXED-cardinality dims (nation=25,
    * region=5). customer and supplier grow with scale factor — a
    * forced broadcast() hint overrides autoBroadcastJoinThreshold and
    * would make the driver materialize multi-GB tables at 100×. They
    * are left to AQE: auto-broadcast while small, shuffle join once
    * they outgrow the threshold. PlanSpec asserts no forced-broadcast
    * hint sits on a scaling table here.
    */
  def analyticsQ5Shape(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dsumx(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  val analyticsQ5ShapeSql: String =
    s"""SELECT r_name, n_name,
       |  ${dsumxSql(s"${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")}")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** subquery_scalar_agg — correlated scalar subquery: parts priced
    * within 5.00 of their brand's maximum. Catalyst decorrelates
    * this into an aggregate + join (no per-row subquery execution).
    * max over exact decimals keeps the threshold comparison exact in
    * both engines (an avg-of-doubles threshold would be shuffle-order
    * dependent at the comparison boundary).
    */
  def subqueryScalarAgg(s: SparkSession, d: String): DataFrame = {
    part(s, d).createOrReplaceTempView("graft_part_sq")
    s.sql("""
      SELECT p_partkey, p_brand, p_retailprice
      FROM graft_part_sq p
      WHERE CAST(p_retailprice AS DECIMAL(14,2)) >
            (SELECT max(CAST(p_retailprice AS DECIMAL(14,2))) - CAST(5.00 AS DECIMAL(14,2))
             FROM graft_part_sq i WHERE i.p_brand = p.p_brand)
      ORDER BY p_partkey
    """)
  }
  val subqueryScalarAggSql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |WHERE CAST(p_retailprice AS DECIMAL(14,2)) >
      |      (SELECT max(CAST(p_retailprice AS DECIMAL(14,2))) - CAST(5.00 AS DECIMAL(14,2))
      |       FROM part i WHERE i.p_brand = p.p_brand)
      |ORDER BY p_partkey""".stripMargin

  /** subquery_in_uncorrelated — IN-subquery over an aggregated set
    * (rewritten to a semi-join): orders of the 10 biggest spenders.
    */
  def subqueryInUncorrelated(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_orders_sq")
    s.sql(s"""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM graft_orders_sq
      WHERE o_custkey IN (
        SELECT o_custkey FROM graft_orders_sq
        GROUP BY o_custkey
        ORDER BY CAST(sum(${decSql("o_totalprice")}) AS DOUBLE) DESC, o_custkey ASC
        LIMIT 10)
      ORDER BY o_orderkey
    """)
  }
  val subqueryInUncorrelatedSql: String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice
       |FROM orders
       |WHERE o_custkey IN (
       |  SELECT o_custkey FROM orders
       |  GROUP BY o_custkey
       |  ORDER BY CAST(sum(${decSql("o_totalprice")}) AS DOUBLE) DESC, o_custkey ASC
       |  LIMIT 10)
       |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_q3_shape" -> (analyticsQ3Shape _),
    "analytics_q5_shape" -> (analyticsQ5Shape _),
    "subquery_scalar_agg" -> (subqueryScalarAgg _),
    "subquery_in_uncorrelated" -> (subqueryInUncorrelated _),
  )
  val oracle: Map[String, String] = Map(
    "analytics_q3_shape" -> analyticsQ3ShapeSql,
    "analytics_q5_shape" -> analyticsQ5ShapeSql,
    "subquery_scalar_agg" -> subqueryScalarAggSql,
    "subquery_in_uncorrelated" -> subqueryInUncorrelatedSql,
  )
}
