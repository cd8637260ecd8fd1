package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-eighth wave: interval union length, monthly order-value
  * medians, and kNN label-precision evaluation.
  */
object Extras98 {

  /** time_interval_union — total COVERED time per user (the union
    * length of overlapping 30-minute activity intervals — billing's
    * "don't double-count overlap" primitive): the sweep-line from C373
    * reused with a lead window — a segment [t, next_t) counts iff the
    * running coverage is positive — all in EXACT microsecond integers.
    * One keyed exchange; per-user state is its boundary list.
    */
  def timeIntervalUnion(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val bounds = e.select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"), lit(1L).as("delta"))
      .unionAll(e.select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")) + 1800000000L, lit(-1L)))
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("delta").desc)
    val covered = bounds
      .withColumn("conc", sum(col("delta")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_t", lead(col("t"), 1).over(wOrd))
      .filter(col("conc") > 0 && col("next_t").isNotNull)
      .groupBy("user_id")
      .agg((sum(col("next_t") - col("t")) / 1000000L).cast("long")
        .as("covered_s"),
        count(lit(1)).as("n_segments"))
    covered.orderBy("user_id")
  }
  val timeIntervalUnionSql: String =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts) + 1800000000, -1 FROM events),
      |c AS (
      |  SELECT user_id, t,
      |    sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc,
      |    lead(t, 1) OVER (PARTITION BY user_id ORDER BY t, delta DESC)
      |      AS next_t
      |  FROM b)
      |SELECT user_id,
      |  CAST(sum(next_t - t) // 1000000 AS BIGINT) AS covered_s,
      |  count(*) AS n_segments
      |FROM c WHERE conc > 0 AND next_t IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** analytics_monthly_aov_median — median and p90 order value per
    * month by percentile_disc ELEMENT selection (exact decimal, an
    *  actual order's value): the aggregation is keyed by month so each
    * group's selection buffer holds one month, not the table — the
    * grouped-percentile shape that stays bounded as history grows.
    */
  def analyticsMonthlyAovMedian(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(date_trunc("month", col("o_orderdate"))
        .cast("timestamp_ntz").as("month"), dec(col("o_totalprice")).as("v"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
          .cast("double").as("median_aov"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)")
          .cast("double").as("p90_aov"))
      .orderBy("month")
  val analyticsMonthlyAovMedianSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  count(*) AS n_orders,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (
      |    ORDER BY CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |    AS median_aov,
      |  CAST(percentile_disc(0.9) WITHIN GROUP (
      |    ORDER BY CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |    AS p90_aov
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** embed_knn_label_precision — the retrieval-eval loop: for a FIXED
    * PROBE SET of query vectors, the top-5 corpus neighbors by EXACT
    * integer dot product (quantized components), precision@5 = how
    * many neighbors share the dominant corpus label.
    *
    * Probe-set contract (the scale fix over the r6 all-pairs shape): a
    * retrieval eval does not score every query in the corpus — it
    * scores a fixed, deterministic probe budget. Probes = label-0
    * vectors with `vec_id < 600` (a CONSTANT, corpus-size-independent
    * budget: ~200 probes at any sf ≥ 0.1; at tiny sf it degenerates to
    * "all label-0", which is the same result as before). The probe
    * component table is ≤ 600×64 rows → explicitly `broadcast()`, so
    * the corpus side streams map-side with NO shuffle before the
    * map-side-combined (qid, tid) partial aggregation: total work is
    * O(P·n·d) with constant P — linear in corpus size, never n².
    * Ranking window partitions by probe (≤600 partitions, no skew);
    * top-5 ties broken by id in both engines.
    */
  /** The kNN eval's fixed probe budget: label-0 vectors with
    * `vec_id < KnnProbeBudget` qualify as probes. ONE definition
    * interpolated into BOTH the DataFrame plan and the DuckDB oracle —
    * the two engines cannot drift (the r7 ADVICE parity hazard).
    */
  val KnnProbeBudget = 600

  def embedKnnLabelPrecision(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
        floor(col("col").cast("double") * 1000000d + 0.5d).as("fx"))
    val q = comp.filter(col("label") === 0 && col("vec_id") < KnnProbeBudget)
      .select(col("vec_id").as("qid"), col("dim"), col("fx").as("fq"))
    val t = comp.filter(col("label") =!= 0)
      .select(col("vec_id").as("tid"), col("label"), col("dim"),
        col("fx").as("ft"))
    val dots = broadcast(q).join(t, "dim")
      .groupBy("qid", "tid", "label")
      .agg(sum(col("fq") * col("ft")).as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("tid"))
    dots.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy("qid")
      .agg(count(lit(1)).as("k"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_label1"),
        min(col("dot")).as("min_top_dot"))
      .orderBy("qid")
  }
  val embedKnnLabelPrecisionSql: String =
    s"""WITH comp AS (
      |  SELECT vec_id, label, dim,
      |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000 + 0.5)
      |      AS BIGINT) AS fx
      |  FROM embeddings, generate_series(1, 64) AS g(dim)),
      |dots AS (
      |  SELECT q.vec_id AS qid, t.vec_id AS tid, t.label,
      |    sum(q.fx * t.fx) AS dot
      |  FROM comp q JOIN comp t ON q.dim = t.dim
      |  WHERE q.label = 0 AND q.vec_id < $KnnProbeBudget AND t.label <> 0
      |  GROUP BY 1, 2, 3),
      |rk AS (
      |  SELECT qid, label, dot,
      |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, tid) AS rk
      |  FROM dots)
      |SELECT qid, count(*) AS k,
      |  CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_label1,
      |  CAST(min(dot) AS BIGINT) AS min_top_dot
      |FROM rk WHERE rk <= 5 GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_interval_union" -> (timeIntervalUnion _),
    "analytics_monthly_aov_median" -> (analyticsMonthlyAovMedian _),
    "embed_knn_label_precision" -> (embedKnnLabelPrecision _))

  val oracle: Map[String, String] = Map(
    "time_interval_union" -> timeIntervalUnionSql,
    "analytics_monthly_aov_median" -> analyticsMonthlyAovMedianSql,
    "embed_knn_label_precision" -> embedKnnLabelPrecisionSql)
}
