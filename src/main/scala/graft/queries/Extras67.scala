package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-seventh wave: three more canonical TPC-H analytics shapes
  * (Q12 late-shipment priority census, Q13 customer-order-count
  * distribution, Q17 small-quantity revenue) adapted to the testdata's
  * columns with the repo's exact-arithmetic discipline.
  */
object Extras67 {

  /** analytics_q12_shape — the TPC-H Q12 shape: for each shipment
    * class (l_returnflag stands in for l_shipmode; the testdata has no
    * commit/receipt dates so "late" = shipped more than 60 days after
    * the order date), how many LATE lines came from high-priority vs
    * low-priority orders. Scale: ONE keyed shuffle join
    * lineitem⋈orders on orderkey (both sides large at 100 TB — no
    * broadcast), the priority CASE evaluated as two conditional sums
    * inside one partial-aggregating pass; the late test is a cheap
    * row-local residual after the join (it needs columns from both
    * sides, so it cannot push below it — but it runs before the
    * aggregate shuffles anything).
    */
  def analyticsQ12Shape(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("l_returnflag")
  val analyticsQ12ShapeSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** analytics_q13_shape — the TPC-H Q13 shape: the distribution of
    * customers by how many orders they placed, INCLUDING zero-order
    * customers (the part naive inner joins silently drop). Scale: the
    * orders side collapses to (custkey, count) FIRST — a partial-agg
    * shuffle on the fact's own key — and only that reduced frame joins
    * customer (left outer, so customers with no orders survive with
    * count 0); the final histogram aggregates a customer-cardinality
    * frame down to a handful of rows. No window, no distinct.
    */
  def analyticsQ13Shape(s: SparkSession, d: String): DataFrame = {
    val perCust = orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c_count"))
    customer(s, d).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
  val analyticsQ13ShapeSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, coalesce(oc.c_count, 0) AS c_count
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY 1) oc
      |  ON c_custkey = o_custkey) t
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** analytics_q17_shape — the TPC-H Q17 small-quantity-order revenue
    * shape: average yearly revenue lost if small-quantity orders (qty
    * below 20% of the part's mean order quantity) for one brand were
    * not taken. Scale: the per-part mean is a groupBy on l_partkey
    * JOINED BACK to the same scan — both sides hash-partition on
    * partkey so the join reuses the aggregate's exchange; the brand
    * filter broadcasts through part and prunes BOTH passes at the
    * scan. The threshold test 5·qty·cnt < Σqty is EXACT integer/
    * decimal arithmetic (the algebraic rearrangement of
    * qty < 0.2·avg avoids the IEEE division entirely — two exact
    * products compare bit-identically in any engine); the one final
    * division by 7 is the only IEEE step.
    */
  def analyticsQ17Shape(s: SparkSession, d: String): DataFrame = {
    val brandLines = lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_brand") === "Brand#3")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice")).as("price"))
    val perPart = brandLines.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
    brandLines.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("qty") * lit(5) * col("cnt") < col("sum_qty"))
      .agg((dsumx(col("price")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }
  val analyticsQ17ShapeSql: String =
    """WITH brand_lines AS (
      |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(14,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(14,2)) AS price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3'),
      |per_part AS (
      |  SELECT l_partkey AS pk, sum(qty) AS sum_qty, count(*) AS cnt
      |  FROM brand_lines GROUP BY 1)
      |SELECT CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_small
      |FROM brand_lines JOIN per_part ON l_partkey = pk
      |WHERE qty * 5 * cnt < sum_qty""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_q12_shape" -> (analyticsQ12Shape _),
    "analytics_q13_shape" -> (analyticsQ13Shape _),
    "analytics_q17_shape" -> (analyticsQ17Shape _))

  val oracle: Map[String, String] = Map(
    "analytics_q12_shape" -> analyticsQ12ShapeSql,
    "analytics_q13_shape" -> analyticsQ13ShapeSql,
    "analytics_q17_shape" -> analyticsQ17ShapeSql)
}
