package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-eighth wave: four more TPC-H analytics shapes — Q15 (top
  * supplier, max-of-aggregate), Q19 (disjunctive bracket predicates as
  * join residual), Q21 (waiting-supplier EXISTS/NOT-EXISTS collapsed
  * to one per-order aggregate), Q22 (scalar-average + anti-join),
  * adapted to the testdata's columns.
  */
object Extras68 {

  /** analytics_q15_shape — the TPC-H Q15 top-supplier shape: revenue
    * per supplier over one quarter, keep the supplier(s) achieving the
    * GLOBAL MAX — the max-of-aggregate pattern. Scale: one keyed
    * shuffle for the per-supplier aggregate; the global max is a
    * 1-row frame cross-joined back (a broadcast of one row — never a
    * global sort or single-partition window). Revenue stays exact
    * decimal so the max-equality test is bit-safe in both engines.
    */
  def analyticsQ15Shape(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast(F) - col("l_discount").cast(F))).as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(top), col("total_rev") === col("max_rev"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }
  val analyticsQ15ShapeSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |    AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1995-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** analytics_q19_shape — the TPC-H Q19 disjunctive-bracket shape:
    * revenue from three OR'd (brand, quantity-range, size-range)
    * brackets. The scale lesson: the disjunction is a RESIDUAL on top
    * of the single partkey equi-join — Catalyst keeps the hash join on
    * the conjunct l_partkey = p_partkey and evaluates the OR per
    * matched row (a naive reading produces a nested-loop over the OR).
    * part broadcasts; the revenue sum is exact decimal.
    */
  def analyticsQ19Shape(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 15))))
      .agg(dsumx(dec(col("l_extendedprice")) *
        (lit(1).cast(F) - col("l_discount").cast(F))).as("revenue"),
        count(lit(1)).as("n_lines"))
  val analyticsQ19ShapeSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
      |       AND p_size BETWEEN 1 AND 5)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
      |       AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
      |       AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** analytics_q21_shape — the TPC-H Q21 waiting-supplier shape:
    * suppliers whose line was LATE (shipped >60 days after the order
    * date — the testdata has no receipt/commit dates) on a
    * multi-supplier order where they were the ONLY late supplier.
    * The classic EXISTS / NOT-EXISTS pair over the same fact COLLAPSES
    * into one per-order aggregate: count distinct suppliers and
    * distinct LATE suppliers per order (one orderkey shuffle), then
    * join back to the late lines — two correlated subqueries become
    * one exchange-reusing pass. Top 10 suppliers by waiting count.
    */
  def analyticsQ21Shape(s: SparkSession, d: String): DataFrame = {
    val lines = lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
    val perOrder = lines.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    lines.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(10)
  }
  val analyticsQ21ShapeSql: String =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |per_order AS (
      |  SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      |  FROM lines GROUP BY 1)
      |SELECT s_name, count(*) AS numwait
      |FROM lines JOIN per_order ON l_orderkey = ok
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE late AND n_supp >= 2 AND n_late_supp = 1
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** analytics_q22_shape — the TPC-H Q22 sales-opportunity shape:
    * customers with above-average positive balance and NO orders,
    * grouped by nation (the testdata has no phone column — nationkey
    * stands in for the country code). The scalar-average subquery is
    * rearranged to EXACT arithmetic: bal·cnt > Σbal over positive
    * balances (decimal × integer both sides — no IEEE division on the
    * comparison path, same trick as C331), the average a 1-row
    * broadcast; the "no recent orders" test (date-filtered, so the
    * pushed predicate shrinks the anti side before it shuffles) is a
    * LEFT ANTI join on custkey, never a NOT IN (which at 100 TB would
    * demand a null-safe broadcast of every custkey).
    */
  def analyticsQ22Shape(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), dec(col("c_acctbal")).as("bal"))
    val avgPos = cust.filter(col("bal") > lit(0).cast(M))
      .agg(sum(col("bal")).as("sum_bal"), count(lit(1)).as("cnt_bal"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal") * col("cnt_bal") > col("sum_bal"))
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        .select(col("o_custkey")), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsumx(col("bal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }
  val analyticsQ22ShapeSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(c_acctbal AS DECIMAL(14,2)) AS bal
      |  FROM customer),
      |avg_pos AS (
      |  SELECT sum(bal) AS sum_bal, count(*) AS cnt_bal
      |  FROM cust WHERE bal > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(bal) AS DOUBLE) AS totacctbal
      |FROM cust, avg_pos
      |WHERE bal * cnt_bal > sum_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_q15_shape" -> (analyticsQ15Shape _),
    "analytics_q19_shape" -> (analyticsQ19Shape _),
    "analytics_q21_shape" -> (analyticsQ21Shape _),
    "analytics_q22_shape" -> (analyticsQ22Shape _))

  val oracle: Map[String, String] = Map(
    "analytics_q15_shape" -> analyticsQ15ShapeSql,
    "analytics_q19_shape" -> analyticsQ19ShapeSql,
    "analytics_q21_shape" -> analyticsQ21ShapeSql,
    "analytics_q22_shape" -> analyticsQ22ShapeSql)
}
