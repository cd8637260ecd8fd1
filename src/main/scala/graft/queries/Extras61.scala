package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-first wave: two more canonical analytics shapes — TPC-H Q7
  * (volume shipping between nation pairs) and Q14 (promo revenue
  * share), adapted to the testdata's columns with the repo's exact-
  * decimal aggregation discipline.
  */
object Extras61 {

  /** analytics_q7_shape — the TPC-H Q7 volume-shipping shape: revenue
    * between DISTINGUISHED NATION PAIRS (supplier nation, customer
    * nation) per year, with the symmetric OR pair predicate. The scale
    * lessons: nation is a fixed-cardinality dim — both copies
    * broadcast; the pair predicate applies AFTER the two broadcast
    * joins as a cheap residual (never a join-explosion condition); the
    * fact table shuffles only for its keyed joins to orders/supplier.
    * Revenue is the exact-decimal Σ price·(1−disc) pattern.
    */
  def analyticsQ7Shape(s: SparkSession, d: String): DataFrame = {
    val supNation = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsumx(dec(col("l_extendedprice")) *
        (lit(1).cast(F) - col("l_discount").cast(F))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }
  val analyticsQ7ShapeSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
      |   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** analytics_q14_shape — the TPC-H Q14 promo-revenue shape: the
    * share of one month's revenue from PROMO parts — a conditional
    * ratio of two aggregates over ONE pass (a CASE'd numerator beside
    * the full denominator, never two scans). Both sums are exact
    * decimals; the percentage is the single final IEEE division.
    * part is the smaller side and broadcasts.
    */
  def analyticsQ14Shape(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp_ntz"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("rev", dec(col("l_extendedprice")) *
        (lit(1).cast(F) - col("l_discount").cast(F)))
      .agg(
        count(lit(1)).as("n_lines"),
        (lit(100.0) * sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast(M))).cast("double") /
          sum(col("rev")).cast("double")).as("promo_pct"))
  val analyticsQ14ShapeSql: String =
    """SELECT count(*) AS n_lines,
      |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(14,2))
      |           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |      AS DOUBLE) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-03-01'
      |  AND l_shipdate < TIMESTAMP '1995-04-01'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_q7_shape" -> (analyticsQ7Shape _),
    "analytics_q14_shape" -> (analyticsQ14Shape _))

  val oracle: Map[String, String] = Map(
    "analytics_q7_shape" -> analyticsQ7ShapeSql,
    "analytics_q14_shape" -> analyticsQ14ShapeSql)
}
