package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-second wave: linear-counting sketch, length-bucketed batch
  * packing, and the 2×2 odds ratio.
  */
object Extras92 {

  /** agg_linear_counting — the Linear Counting distinct estimator
    * (the small-cardinality regime where HLL is biased), validated
    * against the exact answer in the same row: the m=1024 bitmap
    * buckets come from a DETERMINISTIC md5 slot (no RNG), occupied
    * slots are one distinct pass over the O(m)-bounded slot frame,
    * and n̂ = m·ln(m/z) is one IEEE expression from exact integers.
    * The estimate/exact pair is the op's own error certificate.
    */
  def aggLinearCounting(s: SparkSession, d: String): DataFrame = {
    val m = 1024
    val e = events(s, d).filter(col("event_type") === "click")
      .select(col("user_id"))
    val slots = e
      .select(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(m.toLong)).as("slot"))
      .distinct().agg(count(lit(1)).as("occupied"))
    val exact = e.distinct().agg(count(lit(1)).as("n_exact"))
    slots.crossJoin(exact)
      .select(lit(m.toLong).as("m"), col("occupied"), col("n_exact"),
        round(lit(m.toDouble)
          * log(lit(m.toDouble) / (lit(m.toDouble) - col("occupied")
            .cast("double"))), 2).as("n_est"))
  }
  val aggLinearCountingSql: String =
    """WITH e AS (
      |  SELECT user_id FROM events WHERE event_type = 'click'),
      |slots AS (
      |  SELECT count(*) AS occupied FROM (
      |    SELECT DISTINCT
      |      CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      |        AS BIGINT) % 1024 AS slot
      |    FROM e)),
      |exact AS (
      |  SELECT count(DISTINCT user_id) AS n_exact FROM e)
      |SELECT CAST(1024 AS BIGINT) AS m, occupied, n_exact,
      |  round(1024.0 * ln(1024.0 / (1024.0 - occupied)), 2) AS n_est
      |FROM slots, exact""".stripMargin

  /** pipeline_length_bucket_batching — the padding-waste case for
    * length-bucketed batching: documents rank globally (GlobalRank,
    * no single-partition window) in two orders — by content hash
    * (random batching) and by (length, id) (length-bucketed) — batch
    * = rank div 32, per-batch padding waste = Σ(batch max − len) as
    * exact integers off one keyed aggregate per strategy. The two
    * waste totals in one row quantify why every serving stack
    * length-buckets. Corpus scanned once; both rank passes run on the
    * same slim (id, len, hash) projection.
    */
  def pipelineLengthBucketBatching(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("len"),
      md5(col("doc_id").cast("string")).as("h"))
    def waste(ranked: DataFrame): DataFrame = ranked
      .withColumn("batch", expr("(rn - 1) div 32"))
      .groupBy("batch")
      .agg(count(lit(1)).as("bn"), max(col("len")).as("mx"),
        sum(col("len")).as("sl"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("bn") * col("mx") - col("sl")).as("pad_waste"))
    val rand = waste(graft.plans.GlobalRank.withGlobalRowNumber(
      docs, "rn", Seq(col("h"))))
    val buck = waste(graft.plans.GlobalRank.withGlobalRowNumber(
      docs, "rn", Seq(col("len"), col("doc_id"))))
    rand.select(col("n_batches"), col("pad_waste").as("waste_random"))
      .crossJoin(buck.select(col("pad_waste").as("waste_bucketed")))
      .select(col("n_batches"), col("waste_random"), col("waste_bucketed"),
        round(lit(1.0d) - col("waste_bucketed").cast("double")
          / col("waste_random").cast("double"), 6).as("waste_reduction"))
  }
  val pipelineLengthBucketBatchingSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS len,
      |    md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |r1 AS (
      |  SELECT len, (row_number() OVER (ORDER BY h) - 1) // 32 AS batch
      |  FROM docs),
      |w1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_batches,
      |    CAST(sum(bn * mx - sl) AS BIGINT) AS waste_random
      |  FROM (SELECT batch, count(*) AS bn, max(len) AS mx, sum(len) AS sl
      |        FROM r1 GROUP BY 1)),
      |r2 AS (
      |  SELECT len,
      |    (row_number() OVER (ORDER BY len, doc_id) - 1) // 32 AS batch
      |  FROM docs),
      |w2 AS (
      |  SELECT CAST(sum(bn * mx - sl) AS BIGINT) AS waste_bucketed
      |  FROM (SELECT batch, count(*) AS bn, max(len) AS mx, sum(len) AS sl
      |        FROM r2 GROUP BY 1))
      |SELECT n_batches, waste_random, waste_bucketed,
      |  round(1.0 - CAST(waste_bucketed AS DOUBLE)
      |    / CAST(waste_random AS DOUBLE), 6) AS waste_reduction
      |FROM w1, w2""".stripMargin

  /** stat_odds_ratio — the 2×2 odds ratio with Woolf's log-CI (does
    * clicking associate with purchasing?): the four cells come from
    * ONE pass over per-user behavior flags (two conditional distinct
    * aggregates collapsed to an O(users) frame), the OR and its CI
    * are a single IEEE block from exact integer cells with the
    * standard +0.5 Haldane correction.
    */
  def statOddsRatio(s: SparkSession, d: String): DataFrame = {
    val flags = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicked"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchased"))
    val cells = flags.agg(
      sum(when(col("clicked") === 1 && col("purchased") === 1, 1L)
        .otherwise(0L)).as("a"),
      sum(when(col("clicked") === 1 && col("purchased") === 0, 1L)
        .otherwise(0L)).as("b"),
      sum(when(col("clicked") === 0 && col("purchased") === 1, 1L)
        .otherwise(0L)).as("c"),
      sum(when(col("clicked") === 0 && col("purchased") === 0, 1L)
        .otherwise(0L)).as("dd"))
    def h(c: String) = col(c).cast("double") + 0.5d
    cells.select(col("a"), col("b"), col("c"), col("dd"),
      round(h("a") * h("dd") / (h("b") * h("c")), 6).as("odds_ratio"),
      round(exp(log(h("a") * h("dd") / (h("b") * h("c")))
        - lit(1.959964d) * sqrt(lit(1.0d) / h("a") + lit(1.0d) / h("b")
          + lit(1.0d) / h("c") + lit(1.0d) / h("dd"))), 6).as("ci_lo"),
      round(exp(log(h("a") * h("dd") / (h("b") * h("c")))
        + lit(1.959964d) * sqrt(lit(1.0d) / h("a") + lit(1.0d) / h("b")
          + lit(1.0d) / h("c") + lit(1.0d) / h("dd"))), 6).as("ci_hi"))
  }
  val statOddsRatioSql: String =
    """WITH flags AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS purchased
      |  FROM events GROUP BY 1),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN clicked = 1 AND purchased = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN clicked = 1 AND purchased = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN clicked = 0 AND purchased = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN clicked = 0 AND purchased = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dd
      |  FROM flags)
      |SELECT a, b, c, dd,
      |  round((a + 0.5) * (dd + 0.5) / ((b + 0.5) * (c + 0.5)), 6)
      |    AS odds_ratio,
      |  round(exp(ln((a + 0.5) * (dd + 0.5) / ((b + 0.5) * (c + 0.5)))
      |    - 1.959964 * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
      |      + 1.0 / (c + 0.5) + 1.0 / (dd + 0.5))), 6) AS ci_lo,
      |  round(exp(ln((a + 0.5) * (dd + 0.5) / ((b + 0.5) * (c + 0.5)))
      |    + 1.959964 * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
      |      + 1.0 / (c + 0.5) + 1.0 / (dd + 0.5))), 6) AS ci_hi
      |FROM cells""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_linear_counting" -> (aggLinearCounting _),
    "pipeline_length_bucket_batching" -> (pipelineLengthBucketBatching _),
    "stat_odds_ratio" -> (statOddsRatio _))

  val oracle: Map[String, String] = Map(
    "agg_linear_counting" -> aggLinearCountingSql,
    "pipeline_length_bucket_batching" -> pipelineLengthBucketBatchingSql,
    "stat_odds_ratio" -> statOddsRatioSql)
}
