package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Twenty-sixth wave: SQL null-semantics traps (NOT IN), the remaining
  * window value functions, calendar interval arithmetic, the
  * multi-distinct Expand plan, deterministic hash sampling, and the
  * map higher-order battery.
  */
object Extras26 {

  /** subquery_not_in_null_trap — THE classic SQL semantics trap: a
    * `NOT IN` subquery whose result contains one NULL returns ZERO
    * rows (three-valued logic: `x <> NULL` is unknown for every x),
    * while `NOT EXISTS` returns the intuitive complement. Catalyst
    * plans the former as a null-aware anti join, the latter as a plain
    * left-anti — different physical operators, different answers, both
    * standard. The graded row carries all three censuses (NOT IN over
    * a null-free list, NOT IN with a planted NULL, NOT EXISTS) so the
    * oracle pins the exact three-valued behavior cross-engine.
    */
  def subqueryNotInNullTrap(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_nit_orders")
    customer(s, d).createOrReplaceTempView("g_nit_customer")
    s.sql(
      """SELECT
        |  (SELECT count(*) FROM g_nit_orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM g_nit_customer WHERE c_acctbal > 9000))
        |    AS n_not_in_clean,
        |  (SELECT count(*) FROM g_nit_orders
        |   WHERE o_custkey NOT IN
        |     (SELECT CASE WHEN c_acctbal > 9990 THEN NULL ELSE c_custkey END
        |      FROM g_nit_customer WHERE c_acctbal > 9000))
        |    AS n_not_in_nulled,
        |  (SELECT count(*) FROM g_nit_orders o
        |   WHERE NOT EXISTS
        |     (SELECT 1 FROM g_nit_customer c
        |      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000))
        |    AS n_not_exists""".stripMargin)
  }
  val subqueryNotInNullTrapSql: String =
    """SELECT
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN
      |     (SELECT c_custkey FROM customer WHERE c_acctbal > 9000))
      |    AS n_not_in_clean,
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN
      |     (SELECT CASE WHEN c_acctbal > 9990 THEN NULL ELSE c_custkey END
      |      FROM customer WHERE c_acctbal > 9000))
      |    AS n_not_in_nulled,
      |  (SELECT count(*) FROM orders o
      |   WHERE NOT EXISTS
      |     (SELECT 1 FROM customer c
      |      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000))
      |    AS n_not_exists""".stripMargin

  /** win_percent_rank_nth — the remaining window VALUE functions:
    * percent_rank (exact (rank−1)/(n−1) — integer-derived IEEE
    * division, identical both engines) and nth_value with its
    * default-frame subtlety: the standard frame is RANGE UNBOUNDED
    * PRECEDING .. CURRENT ROW, so nth_value(x, 3) is NULL until the
    * third peer arrives — pinned here with the explicit full frame so
    * every row sees the partition's true third value.
    */
  def winPercentRankNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).filter(col("o_orderkey") % 50 === 0)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        round(percent_rank().over(w), 8).as("pct_rank"),
        nth_value(col("o_orderkey"), 3).over(wFull).as("third_key"))
      .orderBy("o_orderpriority", "o_orderkey")
  }
  val winPercentRankNthSql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  round(percent_rank() OVER w, 8) AS pct_rank,
      |  nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
      |FROM orders WHERE o_orderkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** date_interval_funcs — calendar INTERVAL arithmetic (the date_funcs
    * battery covered extraction; this is mutation): month addition
    * with end-of-month clamping (Jan 31 + 1 month = Feb 28 in BOTH
    * engines), last_day, whole-day differences and quarter truncation.
    * Everything returns TIMESTAMP_NTZ (never DATE — the comparator's
    * dtype contract).
    */
  def dateIntervalFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).cast("timestamp_ntz").as("plus_3m"),
        last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
        datediff(lit("1998-12-31"), col("o_orderdate")).cast("long").as("days_to_end"),
        date_trunc("quarter", col("o_orderdate")).cast("timestamp_ntz").as("quarter_start"))
      .orderBy("o_orderkey")
  val dateIntervalFuncsSql: String =
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 3 MONTH AS plus_3m,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      |  date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS days_to_end,
      |  date_trunc('quarter', o_orderdate) AS quarter_start
      |FROM orders WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** agg_multi_distinct — several DISTINCT aggregates with different
    * argument sets in ONE aggregation: Catalyst plans this via the
    * Expand operator (one input row fans out per distinct group, then
    * a two-level aggregate) — the structure that makes multi-distinct
    * a single pass instead of N self-joins. The 100 TB cost model:
    * Expand multiplies rows by the distinct-set count BEFORE the
    * shuffle, the partial aggregate collapses them again — still one
    * shuffle.
    */
  def aggMultiDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        countDistinct(col("l_quantity").cast("long")).as("nd_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  val aggMultiDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS nd_parts,
      |  count(DISTINCT l_suppkey) AS nd_supps,
      |  count(DISTINCT CAST(l_quantity AS BIGINT)) AS nd_qty,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** sample_hash_topk — deterministic uniform sampling by hash order:
    * the k rows with the smallest md5(key) — reproducible across
    * engines and runs (unlike TABLESAMPLE/rand), uniform because the
    * hash is uniform, and plan-efficient because ORDER BY + LIMIT
    * plans as TakeOrderedAndProject (per-partition top-k, then one
    * k-row merge on the driver — no global sort, the only correct
    * sample shape at 100 TB).
    */
  def sampleHashTopk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        md5(col("o_orderkey").cast("string").cast("binary")).as("h"))
      .orderBy(col("h").asc)
      .limit(100)
      .orderBy("h")
  val sampleHashTopkSql: String =
    """SELECT o_orderkey, o_totalprice, md5(CAST(o_orderkey AS VARCHAR)) AS h
      |FROM orders ORDER BY h LIMIT 100""".stripMargin

  /** hof_map_battery — the MAP higher-order functions (arrays had
    * C66/C157): per user the event-type census becomes a map, then
    * map_filter prunes rare types, transform_values rescales, and
    * map_entries + explode returns to rows (R4: the map itself never
    * reaches the output). The oracle is the group-by the round trip
    * must reproduce.
    */
  def hofMapBattery(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"),
        explode(map_entries(
          transform_values(
            map_filter(col("m"), (_, v) => v >= 5L),
            (_, v) => v * 2L))).as("e"))
      .select(col("user_id"), col("e.key").as("event_type"),
        col("e.value").as("cnt2"))
      .orderBy("user_id", "event_type")
  val hofMapBatterySql: String =
    """SELECT user_id, event_type, count(*) * 2 AS cnt2
      |FROM events GROUP BY 1, 2 HAVING count(*) >= 5
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subquery_not_in_null_trap" -> (subqueryNotInNullTrap _),
    "win_percent_rank_nth" -> (winPercentRankNth _),
    "date_interval_funcs" -> (dateIntervalFuncs _),
    "agg_multi_distinct" -> (aggMultiDistinct _),
    "sample_hash_topk" -> (sampleHashTopk _),
    "hof_map_battery" -> (hofMapBattery _))

  val oracle: Map[String, String] = Map(
    "subquery_not_in_null_trap" -> subqueryNotInNullTrapSql,
    "win_percent_rank_nth" -> winPercentRankNthSql,
    "date_interval_funcs" -> dateIntervalFuncsSql,
    "agg_multi_distinct" -> aggMultiDistinctSql,
    "sample_hash_topk" -> sampleHashTopkSql,
    "hof_map_battery" -> hofMapBatterySql)
}
