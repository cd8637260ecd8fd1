package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fifty-seventh wave: a from-scratch DataSource V2 connector with both
  * pushdown mixins, EXECUTE IMMEDIATE parameterized SQL, and a rolling
  * regression slope window.
  */
object Extras57 {

  /** source_custom_dsv2 — reading a CUSTOM DataSource V2 connector
    * ([[graft.sources.GraftSeqProvider]]): the library-author surface
    * every external system integration needs. The connector implements
    * SupportsPushDownFilters (id-range predicates NARROW the per-split
    * generation range — a filtered scan produces |match| rows, not
    * |table| rows) and SupportsPushDownRequiredColumns (only the
    * pruned schema is materialized), and splits into contiguous
    * id-range input partitions for parallel read. The oracle replays
    * the deterministic generation rule via generate_series. PlanSpec
    * asserts the pushed filters and the pruned read schema on the
    * BatchScan, plus the partition count.
    */
  def sourceCustomDsv2(s: SparkSession, d: String): DataFrame =
    s.read.format(classOf[graft.sources.GraftSeqProvider].getName)
      .option("rows", 100000L).option("parts", 8)
      .load()
      .filter(col("id") >= 1000L && col("id") < 50000L)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), sum(col("val1")).as("sum_val"))
      .orderBy("tag")
  val sourceCustomDsv2Sql: String =
    """WITH t AS (
      |  SELECT i AS id, (i * 7) % 100 AS val1,
      |    chr(97 + CAST(i % 3 AS INT)) AS tag
      |  FROM generate_series(0, 99999) s(i))
      |SELECT tag, count(*) AS n, CAST(sum(val1) AS BIGINT) AS sum_val
      |FROM t WHERE id >= 1000 AND id < 50000
      |GROUP BY tag ORDER BY tag""".stripMargin

  /** sql_execute_immediate — EXECUTE IMMEDIATE with USING parameters
    * (Spark 4's dynamic-SQL surface, C304's session variables as the
    * argument source): the query text is a value, the parameter binds
    * positionally — the injection-safe way to run caller-supplied SQL
    * with caller-supplied arguments, which is exactly what a query
    * service front door does. Oracle inlines the bound value.
    */
  def sqlExecuteImmediate(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_ei")
    s.sql("DECLARE OR REPLACE VARIABLE v_status STRING DEFAULT 'O'")
    s.sql("SET VAR v_status = 'F'")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT o_orderpriority, count(*) AS n FROM orders_ei
        |   WHERE o_orderstatus = ? GROUP BY o_orderpriority
        |   ORDER BY o_orderpriority'
        |  USING v_status""".stripMargin)
  }
  val sqlExecuteImmediateSql: String =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** win_rolling_slope — rolling least-squares SLOPE per station (the
    * drift detector a sensor archive runs): over each click's last 7
    * observations (per user, ordered by ts with event_id tiebreak,
    * x = the per-user observation index, y = value), slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). x is a SMALL dense integer
    * (row_number per user — rule N4 tie-free), y an exact 2-decimal,
    * so every window sum is exact DECIMAL/integer arithmetic and the
    * slope is one fixed IEEE expression per row — order-independent,
    * engine-identical; the final report keeps each station's largest
    * absolute slope (max — order-independent). 8-dp rounded.
    */
  def winRollingSlope(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val frame = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, 0)
    events(s, d).filter(col("event_type") === "click")
      .withColumn("x", row_number().over(byUser).cast("long"))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("sx", sum(col("x")).over(frame))
      .withColumn("sxx", sum(col("x") * col("x")).over(frame))
      .withColumn("sy", sum(dec(col("value"))).over(frame).cast("double"))
      .withColumn("sxy", sum(dec(col("value")) * col("x")).over(frame).cast("double"))
      .filter(col("n") === 7) // full frames only: partial-frame slopes are noise
      .withColumn("slope",
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 8))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_frames"), max(abs(col("slope"))).as("max_abs_slope"))
      .orderBy("user_id")
  }
  val winRollingSlopeSql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
      |  FROM events WHERE event_type = 'click'),
      |w AS (
      |  SELECT user_id,
      |    count(*) OVER f AS n,
      |    sum(x) OVER f AS sx,
      |    sum(x * x) OVER f AS sxx,
      |    CAST(sum(CAST(value AS DECIMAL(14,2))) OVER f AS DOUBLE) AS sy,
      |    CAST(sum(CAST(value AS DECIMAL(14,2)) * x) OVER f AS DOUBLE) AS sxy
      |  FROM c
      |  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |sl AS (
      |  SELECT user_id,
      |    round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 8) AS slope
      |  FROM w WHERE n = 7)
      |SELECT user_id, count(*) AS n_frames, max(abs(slope)) AS max_abs_slope
      |FROM sl GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_custom_dsv2" -> (sourceCustomDsv2 _),
    "sql_execute_immediate" -> (sqlExecuteImmediate _),
    "win_rolling_slope" -> (winRollingSlope _))

  val oracle: Map[String, String] = Map(
    "source_custom_dsv2" -> sourceCustomDsv2Sql,
    "sql_execute_immediate" -> sqlExecuteImmediateSql,
    "win_rolling_slope" -> winRollingSlopeSql)
}
