package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Tenth wave of coverage operators: month-over-month growth, top-N%
  * selection, window-based exact distinct counts, and a higher-order
  * zip_with/aggregate fold — each with a DuckDB oracle.
  */
object Extras10 {

  /** analytics_mom_growth — month-over-month revenue growth: monthly
    * exact-decimal aggregates, then lag() across the month series and
    * one IEEE division per row for the growth rate (NULL for the first
    * month, never a fake 0). The month series is tiny after
    * aggregation, so the window shuffle is a no-op at any scale — the
    * canonical report query whose COST is entirely in the first
    * partial-aggregable pass over the fact table.
    */
  def analyticsMomGrowth(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy(col("month").asc)
    monthly
      .select(col("month"), col("n_orders"), col("revenue"),
        lag(col("revenue"), 1).over(w).as("prev_revenue"))
      .select(col("month"), col("n_orders"), col("revenue"),
        round((col("revenue") - col("prev_revenue")) / col("prev_revenue"), 8)
          .as("mom_growth"))
      .orderBy("month")
  }
  val analyticsMomGrowthSql: String =
    s"""WITH m AS (
       |  SELECT date_trunc('month', o_orderdate) AS month,
       |    count(*) AS n_orders, ${dsumSql("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1)
       |SELECT month, n_orders, revenue,
       |  round((revenue - lag(revenue, 1) OVER (ORDER BY month ASC))
       |    / lag(revenue, 1) OVER (ORDER BY month ASC), 8) AS mom_growth
       |FROM m ORDER BY month""".stripMargin

  /** win_top_percent — top-10%-by-value selection per group via
    * percent_rank (rank-based, so the cut is exact-rational — no
    * float threshold to disagree on): the per-segment "head of the
    * distribution" slice every quality-filter pipeline uses. Unique
    * (value, key) tie-break keeps both the ranking and the boundary
    * row deterministic; one window shuffle on the group key, and the
    * census output stays small regardless of input size.
    */
  def winTopPercent(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"),
        percent_rank().over(w).as("pr"))
      .filter(col("pr") <= 0.1)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_top"),
        dsum(col("o_totalprice")).as("top_revenue"),
        min(col("o_totalprice")).as("cutoff_value"))
      .orderBy("o_orderpriority")
  }
  val winTopPercentSql: String =
    s"""WITH r AS (
       |  SELECT o_orderpriority, o_totalprice, o_orderkey,
       |    percent_rank() OVER (PARTITION BY o_orderpriority
       |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS pr
       |  FROM orders)
       |SELECT o_orderpriority, count(*) AS n_top,
       |  ${dsumSql("o_totalprice")} AS top_revenue,
       |  min(o_totalprice) AS cutoff_value
       |FROM r WHERE pr <= 0.1
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** win_distinct_count — EXACT distinct counts as window values: COUNT
    * (DISTINCT) OVER is unsupported in both engines, but max(dense_rank)
    * over the same ordering IS the distinct count — every row learns
    * "how many distinct users does my event type have" without
    * collapsing the rows (the enrich-don't-aggregate shape). Two
    * window passes share ONE shuffle (same partitioning); ranks are
    * integers, so the result is exact everywhere.
    */
  def winDistinctCount(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy(col("user_id").asc)
    val wAll = Window.partitionBy("event_type")
    events(s, d)
      .select(col("event_id"), col("event_type"), col("user_id"),
        dense_rank().over(wOrd).as("dr"))
      .select(col("event_id"), col("event_type"), col("user_id"),
        max(col("dr")).over(wAll).cast("long").as("n_distinct_users"))
      .orderBy("event_id")
  }
  val winDistinctCountSql: String =
    """SELECT event_id, event_type, user_id,
      |  CAST(max(dr) OVER (PARTITION BY event_type) AS BIGINT)
      |    AS n_distinct_users
      |FROM (
      |  SELECT event_id, event_type, user_id,
      |    dense_rank() OVER (PARTITION BY event_type
      |      ORDER BY user_id ASC) AS dr
      |  FROM events) t
      |ORDER BY event_id""".stripMargin

  /** hof_zip_norm — higher-order zip_with ∘ aggregate fold: the squared
    * L2 norm of each embedding computed as a pure lambda pipeline
    * (zip the array with itself, multiply, strict left-fold sum) —
    * the HOF formulation of what C104's native expression codegens.
    * The left fold is sequential by spec, so it is bit-identical to
    * DuckDB's list_reduce mirror; norms are THE precomputation that
    * turns dot products into cosine similarities at scale (store once,
    * reuse in every query). Row-local; no shuffle but the output sort.
    */
  def hofZipNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        round(expr(
          """aggregate(
            |  zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)),
            |  cast(0.0 as double), (acc, v) -> acc + v)""".stripMargin), 6)
          .as("norm_sq"))
      .orderBy("vec_id")
  val hofZipNormSql: String =
    """SELECT vec_id, CAST(label AS INT) AS label,
      |  round(list_reduce(list_transform(generate_series(1, 64),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |    (x, y) -> x + y), 6) AS norm_sq
      |FROM embeddings ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_mom_growth" -> (analyticsMomGrowth _),
    "win_top_percent" -> (winTopPercent _),
    "win_distinct_count" -> (winDistinctCount _),
    "hof_zip_norm" -> (hofZipNorm _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_mom_growth" -> analyticsMomGrowthSql,
    "win_top_percent" -> winTopPercentSql,
    "win_distinct_count" -> winDistinctCountSql,
    "hof_zip_norm" -> hofZipNormSql,
  )
}
