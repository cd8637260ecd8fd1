package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-fifth wave: maximum drawdown, cohort lifetime value, and the
  * context-length packing-efficiency curve.
  */
object Extras85 {

  /** win_drawdown — maximum drawdown of cumulative daily revenue (the
    * canonical running-peak-to-trough risk metric): cumulative sum and
    * running max both EXACT decimal over the O(days) aggregate frame,
    * so the drawdown comparison and the argmax trough day are exact;
    * one IEEE cast at output. The fact table never enters a window.
    */
  def winDrawdown(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("runmax", max(col("cum")).over(w))
      .withColumn("dd", col("runmax") - col("cum"))
      .agg(count(lit(1)).as("n_days"),
        min(struct((-col("dd")).as("nd"), col("day"))).as("pk"))
      .select(col("n_days"),
        round((-col("pk.nd")).cast("double"), 2).as("max_drawdown"),
        col("pk.day").cast("timestamp_ntz").as("trough_day"))
  }
  val winDrawdownSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT day, rev,
      |    max(sum_cum) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sum_cum AS dd
      |  FROM (
      |    SELECT day, rev,
      |      sum(rev) OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_cum
      |    FROM daily))
      |SELECT count(*) AS n_days,
      |  round(CAST(-(min(struct_pack(nd := -dd, day := day)).nd) AS DOUBLE), 2)
      |    AS max_drawdown,
      |  CAST(min(struct_pack(nd := -dd, day := day)).day AS TIMESTAMP)
      |    AS trough_day
      |FROM c""".stripMargin

  /** analytics_cohort_ltv — cumulative lifetime value per signup
    * cohort (the LTV companion to C-series retention counts): cohort =
    * first order month per customer, month index pure date arithmetic,
    * revenue exact decimal; the cumulative walk runs over the bounded
    * O(cohorts × 12) matrix, never the fact. The cohort-size frame is
    * O(cohorts) and broadcast back.
    */
  def analyticsCohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val coh = o.groupBy(col("o_custkey"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("cm"))
    val sizes = coh.groupBy(col("cm")).agg(count(lit(1)).as("n_customers"))
    val cell = o.join(coh, "o_custkey")
      .withColumn("midx",
        months_between(date_trunc("month", col("o_orderdate")), col("cm"))
          .cast("long"))
      .filter(col("midx") <= 11)
      .groupBy(col("cm"), col("midx"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.partitionBy("cm").orderBy("midx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .join(broadcast(sizes), "cm")
      .select(col("cm").cast("timestamp_ntz").as("cohort_month"),
        col("midx"), col("n_customers"),
        col("cum_rev").cast("double").as("cum_rev"))
      .orderBy("cohort_month", "midx")
  }
  val analyticsCohortLtvSql: String =
    """WITH coh AS (
      |  SELECT o_custkey,
      |    min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cm
      |  FROM orders GROUP BY 1),
      |sizes AS (SELECT cm, count(*) AS n_customers FROM coh GROUP BY 1),
      |cell AS (
      |  SELECT cm,
      |    date_diff('month', cm, date_trunc('month', CAST(o_orderdate AS DATE)))
      |      AS midx,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders JOIN coh ON orders.o_custkey = coh.o_custkey
      |  WHERE date_diff('month', cm,
      |    date_trunc('month', CAST(o_orderdate AS DATE))) <= 11
      |  GROUP BY 1, 2)
      |SELECT CAST(cell.cm AS TIMESTAMP) AS cohort_month,
      |  CAST(midx AS BIGINT) AS midx, n_customers,
      |  CAST(sum(rev) OVER (PARTITION BY cell.cm ORDER BY midx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS cum_rev
      |FROM cell JOIN sizes ON cell.cm = sizes.cm
      |ORDER BY cohort_month, midx""".stripMargin

  /** pipeline_pack_efficiency — the context-length selection curve:
    * for four candidate lengths L, the concat-and-chop packing cost
    * (sequences, boundary-crossing docs, tail waste) is PURE ARITHMETIC
    * on one shared GlobalRank exclusive prefix-sum pass (C344's
    * machinery) — the corpus is scanned once, the per-L fan-out is a
    * 4-row explode over already-tiny per-doc arithmetic. At 100 TB this
    * is the difference between one pass and four.
    */
  def pipelinePackEfficiency(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
      md5(col("doc_id").cast("string")).as("h"))
    val pre = graft.plans.GlobalRank.withExclusivePrefixSum(
      docs, "tok_before", col("n_tok"), Seq(col("h").asc))
    pre
      .select(col("n_tok"), col("tok_before"),
        explode(array(lit(256L), lit(512L), lit(1024L), lit(2048L))).as("cap"))
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        ceil(sum(col("n_tok")).cast("double") / col("cap").cast("double"))
          .cast("long").as("n_seqs"),
        sum(when(expr("tok_before div cap")
          =!= expr("(tok_before + n_tok - 1) div cap"), 1L)
          .otherwise(0L)).as("n_crossing"),
        (pmod(-sum(col("n_tok")), col("cap"))).as("tail_waste"))
      .select(col("cap"), col("n_docs"), col("n_tokens"), col("n_seqs"),
        col("n_crossing"),
        round(col("n_crossing").cast("double")
          / col("n_docs").cast("double"), 6).as("pct_crossing"),
        col("tail_waste"))
      .orderBy("cap")
  }
  val pipelinePackEfficiencySql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |pre AS (
      |  SELECT n_tok,
      |    coalesce(sum(n_tok) OVER (ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS tok_before
      |  FROM docs),
      |x AS (
      |  SELECT pre.*, cap
      |  FROM pre CROSS JOIN (VALUES (256), (512), (1024), (2048)) AS l(cap))
      |SELECT CAST(cap AS BIGINT) AS cap, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(ceil(CAST(sum(n_tok) AS DOUBLE) / cap) AS BIGINT) AS n_seqs,
      |  CAST(sum(CASE WHEN tok_before // cap
      |    <> (tok_before + n_tok - 1) // cap THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_crossing,
      |  round(CAST(sum(CASE WHEN tok_before // cap
      |      <> (tok_before + n_tok - 1) // cap THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS pct_crossing,
      |  CAST((cap - sum(n_tok) % cap) % cap AS BIGINT) AS tail_waste
      |FROM x GROUP BY cap ORDER BY cap""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_drawdown" -> (winDrawdown _),
    "analytics_cohort_ltv" -> (analyticsCohortLtv _),
    "pipeline_pack_efficiency" -> (pipelinePackEfficiency _))

  val oracle: Map[String, String] = Map(
    "win_drawdown" -> winDrawdownSql,
    "analytics_cohort_ltv" -> analyticsCohortLtvSql,
    "pipeline_pack_efficiency" -> pipelinePackEfficiencySql)
}
