package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-third wave: Friedman rank test, tokenizer fertility, and
  * distinct aggregation under ROLLUP.
  */
object Extras93 {

  /** stat_friedman_test — the Friedman within-block rank test (do the
    * five streams differ, blocking by day?): daily exact-decimal
    * totals form the O(days × streams) block matrix, within-day ranks
    * come from a day-partitioned window (5-row partitions — the
    * partition key is the BLOCK, so no data skew and no global sort),
    * ties broken by stream name for cross-engine determinism
    * (documented; exact-decimal ties are rare), rank sums are exact
    * integers, and the χ² is one IEEE block on a 1-row frame joined
    * back to the per-stream sums.
    */
  def statFriedmanTest(s: SparkSession, d: String): DataFrame = {
    val cell = events(s, d)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(sum(dec(col("value"))).as("v"))
    val w = Window.partitionBy("day").orderBy(col("v"), col("event_type"))
    val ranked = cell.withColumn("r", row_number().over(w).cast("long"))
    val rs = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("r")).as("rank_sum"))
    val chi = rs.agg(count(lit(1)).as("k"), max(col("n_days")).as("n"),
        sum(col("rank_sum") * col("rank_sum")).as("sr2"))
      .select(col("k"), col("n"),
        round(lit(12.0d) / (col("n").cast("double") * col("k").cast("double")
          * (col("k") + 1).cast("double")) * col("sr2").cast("double")
          - lit(3.0d) * col("n").cast("double")
            * (col("k") + 1).cast("double"), 6).as("chi2"))
    rs.crossJoin(broadcast(chi))
      .select(col("event_type"), col("n_days"), col("rank_sum"),
        col("k"), col("chi2"))
      .orderBy("event_type")
  }
  val statFriedmanTestSql: String =
    """WITH cell AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |    sum(CAST(value AS DECIMAL(14,2))) AS v
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (PARTITION BY day ORDER BY v, event_type)
      |      AS BIGINT) AS r
      |  FROM cell),
      |rs AS (
      |  SELECT event_type, count(*) AS n_days,
      |    CAST(sum(r) AS BIGINT) AS rank_sum
      |  FROM ranked GROUP BY 1),
      |chi AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(max(n_days) AS BIGINT) AS n,
      |    round(12.0 / (CAST(max(n_days) AS DOUBLE) * count(*)
      |        * (count(*) + 1)) * CAST(sum(rank_sum * rank_sum) AS DOUBLE)
      |      - 3.0 * CAST(max(n_days) AS DOUBLE) * (count(*) + 1), 6) AS chi2
      |  FROM rs)
      |SELECT event_type, n_days, rank_sum, k, chi2
      |FROM rs, chi ORDER BY event_type""".stripMargin

  /** pipeline_tokenizer_fertility — tokenizer fertility by language
    * (subword tokens per whitespace word — the multilingual-cost
    * metric every tokenizer eval reports): both token counts are
    * row-local regex work riding the scan (the C152 BPE-ish
    * pretokenizer vs whitespace words), per-lang sums are exact
    * integers, fertility is one IEEE division per language.
    */
  def pipelineTokenizerFertility(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("words"),
        size(expr(
          "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .cast("long").as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("n_words"), sum(col("toks")).as("n_tokens"),
        round(sum(col("toks")).cast("double")
          / sum(col("words")).cast("double"), 6).as("fertility"))
      .orderBy("lang")
  val pipelineTokenizerFertilitySql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(words) AS BIGINT) AS n_words,
      |  CAST(sum(toks) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(toks) AS DOUBLE) / CAST(sum(words) AS DOUBLE), 6)
      |    AS fertility
      |FROM (
      |  SELECT lang,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS words,
      |    CAST(len(regexp_extract_all(text,
      |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** agg_distinct_rollup — count(DISTINCT user) under ROLLUP (the
    * execution shape where partial aggregates CANNOT merge distinct
    * states: Spark plans Expand + a two-phase distinct aggregate per
    * grouping set): per-stream, per-(stream, month) and grand-total
    * distinct users in one statement. The revenue column rides along
    * as an exact-decimal sum to prove mixed distinct/plain aggs
    * coexist.
    */
  def aggDistinctRollup(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("month", date_trunc("month", col("ts")).cast("timestamp_ntz"))
      .rollup(col("event_type"), col("month"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("month").asc_nulls_first)
  val aggDistinctRollupSql: String =
    """SELECT event_type,
      |  CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
      |  count(DISTINCT user_id) AS n_users, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY ROLLUP (event_type, date_trunc('month', ts))
      |ORDER BY event_type NULLS FIRST, month NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_friedman_test" -> (statFriedmanTest _),
    "pipeline_tokenizer_fertility" -> (pipelineTokenizerFertility _),
    "agg_distinct_rollup" -> (aggDistinctRollup _))

  val oracle: Map[String, String] = Map(
    "stat_friedman_test" -> statFriedmanTestSql,
    "pipeline_tokenizer_fertility" -> pipelineTokenizerFertilitySql,
    "agg_distinct_rollup" -> aggDistinctRollupSql)
}
