package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational core operators (SURVEY.md §2-B B1–B17, B25–B30).
  *
  * Design rules applied throughout:
  *  - R1: every output ends with a total-order sort on a unique key set.
  *  - R2: all double aggregates use the decimal pattern (Tables.dsum).
  *  - Joins: small dims (region/nation/supplier/part/customer) are
  *    broadcast explicitly so the plan stays BroadcastHashJoin at any
  *    scale factor; the fact tables (lineitem/orders/events) only ever
  *    shuffle on their join/group keys.
  */
object Relational {

  /** B1 scan_project_filter — σ(shipdate range ∧ discount band) π(5 cols).
    * Filter + projection push into the parquet scan (PushedFilters /
    * ReadSchema in explain); at 100 TB this is the difference between
    * reading 5 columns of a date-pruned subset and reading everything.
    */
  def scanProjectFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  val scanProjectFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** B12 agg_hash_groupby — TPC-H Q1 shape: partial+final HashAggregate,
    * map-side combine means the shuffle carries one row per (flag,status)
    * per task, not per input row — the canonical 100 TB-safe aggregation.
    */
  def aggHashGroupby(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumx(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("sum_disc_price"),
        dsumx(dec(col("l_extendedprice")) * oneMinus(col("l_discount")) * onePlus(col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggHashGroupbySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumxSql(s"${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")}")} AS sum_disc_price,
       |  ${dsumxSql(s"${decSql("l_extendedprice")} * ${oneMinusSql("l_discount")} * ${onePlusSql("l_tax")}")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_project_filter" -> (scanProjectFilter _),
    "agg_hash_groupby" -> (aggHashGroupby _),
  )

  val oracle: Map[String, String] = Map(
    "scan_project_filter" -> scanProjectFilterSql,
    "agg_hash_groupby" -> aggHashGroupbySql,
  )
}
