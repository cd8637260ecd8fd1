package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fifteenth wave of coverage operators: the interval-overlap join,
  * exact weighted averages, and run-length (streak) windows — each
  * with a DuckDB oracle.
  */
object Extras15 {

  /** join_interval_overlap — interval×interval overlap join (C55's
    * two-sided sibling: there the probe was a point, here BOTH sides
    * are intervals): for every order, how many same-priority orders
    * have overlapping 3-day windows. A naive theta join is O(n²);
    * instead each interval explodes into its covering week buckets
    * (≤2), candidates meet in a bucket equi-join, the exact overlap
    * predicate prunes, and the classic first-common-bucket guard
    * (bucket = max(start buckets)) makes each pair count exactly ONCE
    * without a distinct. Buckets are Spark-internal plumbing — the
    * oracle states the pure overlap semantics as a direct inequality
    * join. Zero-overlap orders survive via the left join back.
    */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    def wk(name: String): Column =
      expr(s"(unix_micros(cast($name as timestamp)) div 86400000000) div 7")
    val base = orders(s, d).select(
      col("o_orderkey").as("id"), col("o_orderpriority").as("pr"),
      col("o_orderdate").as("s0"),
      (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("e0"))
      .withColumn("bk_s", wk("s0"))
      .withColumn("bk_e", wk("e0"))
    val a = base.select(col("id").as("a_id"), col("pr"), col("s0").as("a_s"),
      col("e0").as("a_e"), col("bk_s").as("a_bks"),
      explode(expr("sequence(bk_s, bk_e)")).as("bk"))
    val b = base.select(col("id").as("b_id"), col("pr").as("b_pr"),
      col("s0").as("b_s"), col("e0").as("b_e"), col("bk_s").as("b_bks"),
      explode(expr("sequence(bk_s, bk_e)")).as("b_bk"))
    val pairs = a.join(b,
        col("pr") === col("b_pr") && col("bk") === col("b_bk") &&
        col("a_id") =!= col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("bk") === greatest(col("a_bks"), col("b_bks")))
      .groupBy("a_id").agg(count(lit(1)).as("n_overlaps"))
    base.select(col("id"))
      .join(pairs, col("id") === col("a_id"), "left_outer")
      .select(col("id"), coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy("id")
  }
  val joinIntervalOverlapSql: String =
    """SELECT a.o_orderkey AS id, count(b.o_orderkey) AS n_overlaps
      |FROM orders a LEFT JOIN orders b
      |  ON a.o_orderpriority = b.o_orderpriority
      | AND a.o_orderkey <> b.o_orderkey
      | AND a.o_orderdate <= b.o_orderdate + INTERVAL 3 DAY
      | AND b.o_orderdate <= a.o_orderdate + INTERVAL 3 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** agg_weighted_avg — exact weighted mean (quantity-weighted unit
    * price per return flag): Σ(w·x) and Σw both accumulate as EXACT
    * decimals (2-dp × 2-dp products are exact at 4 dp), each cast to
    * double once, one IEEE division — the determinism-hardened form of
    * the most common reporting aggregate after plain avg. Single
    * partial-aggregable pass.
    */
  def aggWeightedAvg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        (sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).cast("double") /
         sum(dec(col("l_quantity"))).cast("double")).as("wavg_price"))
      .orderBy("l_returnflag")
  val aggWeightedAvgSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |           * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
      |  / CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** win_streak_length — run-length encoding / longest streak: per
    * user, the longest run of CONSECUTIVE same-type events in time
    * order (the value-change islands twin of the time-gap
    * sessionization family). Change flags → running island ids →
    * per-island lengths → per-user max, with the island machinery
    * riding ONE window shuffle on user_id (the per-island and per-user
    * folds reuse the same partitioning). Streak analytics =
    * engagement/retention bread and butter.
    */
  def winStreakLength(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wRun = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("island", sum(col("chg")).over(wRun))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }
  val winStreakLengthSql: String =
    """WITH m AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |i AS (
      |  SELECT user_id,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM m),
      |runs AS (
      |  SELECT user_id, island, count(*) AS len
      |  FROM i GROUP BY user_id, island)
      |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "agg_weighted_avg" -> (aggWeightedAvg _),
    "win_streak_length" -> (winStreakLength _),
  )

  val oracle: Map[String, String] = Map(
    "join_interval_overlap" -> joinIntervalOverlapSql,
    "agg_weighted_avg" -> aggWeightedAvgSql,
    "win_streak_length" -> winStreakLengthSql,
  )
}
