package graft.queries

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fourteenth wave of coverage operators: count-min frequency sketches,
  * the text-SQL entry path, and the MERGE join hint — each with a
  * DuckDB oracle.
  */
object Extras14 {

  /** agg_countmin_freq — count-min sketch point-frequency estimation
    * (completing the sketch tier beside HLL, MinHash and SimHash): one
    * mergeable sub-linear pass builds the sketch (partial-aggregable
    * binary state — at 100 TB each executor sketches locally and the
    * driver merges), then known hot keys are probed against it. Width
    * is sized (ε=10⁻⁵ → 200k counters) so collisions across this key
    * domain are ~impossible and the estimates are EXACT — which is
    * what lets the exact group-by oracle grade a sketch: the same
    * sizing discipline a production top-k uses for its verify pass.
    */
  def aggCountminFreq(s: SparkSession, d: String): DataFrame = {
    val bin = events(s, d)
      .agg(expr(
        "count_min_sketch(user_id, cast(0.00001 as double), cast(0.999 as double), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new ByteArrayInputStream(bin))
    import s.implicits._
    (0L to 4L).map(u => (u, cms.estimateCount(java.lang.Long.valueOf(u))))
      .toDF("user_id", "est_n")
      .orderBy("user_id")
  }
  val aggCountminFreqSql: String =
    """SELECT user_id, count(*) AS est_n
      |FROM events WHERE user_id BETWEEN 0 AND 4
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** sql_text_entry — the text-SQL front door: tables registered as
    * temp views, the whole query authored as a SQL string through
    * `spark.sql` — proving the engine's surface is reachable from the
    * SQL API with byte-identical results to the DataFrame path (same
    * Catalyst plan underneath; a reference user who writes SQL, not
    * Scala, loses nothing). The query itself is a 3-table
    * dimension-chain rollup.
    */
  def sqlTextEntry(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_orders")
    customer(s, d).createOrReplaceTempView("g_customer")
    nation(s, d).createOrReplaceTempView("g_nation")
    s.sql(
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |FROM g_orders
        |JOIN g_customer ON o_custkey = c_custkey
        |JOIN g_nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }
  val sqlTextEntrySql: String =
    """SELECT n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** join_merge_hint — the MERGE hint: forces a sort-merge join where
    * the optimizer might pick hash (completing the physical join menu
    * exhibits beside B5 broadcast and C48 shuffle-hash). SMJ is the
    * spill-safe choice when BOTH sides are huge — sorted runs stream
    * against each other with O(1) memory per key — exactly the shape a
    * fact-to-fact join needs at 100 TB. PlanSpec asserts the SMJ.
    */
  def joinMergeHint(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).hint("MERGE")
      .join(orders(s, d).hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  val joinMergeHintSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  ${dsumSql("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_countmin_freq" -> (aggCountminFreq _),
    "sql_text_entry" -> (sqlTextEntry _),
    "join_merge_hint" -> (joinMergeHint _),
  )

  val oracle: Map[String, String] = Map(
    "agg_countmin_freq" -> aggCountminFreqSql,
    "sql_text_entry" -> sqlTextEntrySql,
    "join_merge_hint" -> joinMergeHintSql,
  )
}
