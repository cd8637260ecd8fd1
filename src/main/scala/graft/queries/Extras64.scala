package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-fourth wave: growth accounting (new vs returning users,
  * cumulative uniques) and sentence-segmentation statistics.
  */
object Extras64 {

  /** analytics_cumulative_users — the growth-accounting report every
    * product analytics stack runs: per day, active users, NEW users
    * (first-ever activity that day) and the CUMULATIVE distinct user
    * count. The scale shape: "cumulative distinct" is NOT a windowed
    * COUNT(DISTINCT) over an ever-growing frame (quadratic state) —
    * each user collapses to one first-seen row first (keyed shuffle),
    * so the running sum over per-day new-user counts runs on the
    * BOUNDED day domain (a ≤ |days| frame, window-safe at any corpus
    * size).
    */
  def analyticsCumulativeUsers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val active = ev.distinct().groupBy("day").agg(count(lit(1)).as("n_active"))
    val firstSeen = ev.groupBy("user_id").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    active
      .join(firstSeen, Seq("day"), "left_outer")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // day as ISO string: parquet DATE surfaces as python date vs
      // pandas timestamp across the two engines' readers
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_new"), col("cum_users"))
      .orderBy("day")
  }
  val analyticsCumulativeUsersSql: String =
    """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |active AS (SELECT day, count(*) AS n_active FROM ev GROUP BY day),
      |fs AS (
      |  SELECT day, count(*) AS n_new FROM (
      |    SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
      |  GROUP BY day)
      |SELECT strftime(a.day, '%Y-%m-%d') AS day, a.n_active,
      |  CAST(COALESCE(f.n_new, 0) AS BIGINT) AS n_new,
      |  CAST(sum(COALESCE(f.n_new, 0)) OVER (ORDER BY a.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM active a LEFT JOIN fs f USING (day)
      |ORDER BY day""".stripMargin

  /** text_sentence_stats — sentence segmentation statistics (the
    * length profile a curriculum/quality pass needs BELOW the document
    * level): split on terminal punctuation followed by whitespace,
    * drop empty segments, report per-language sentence counts and the
    * corpus mean sentence length in tokens — the mean from exact
    * integer sums with one final division (never a float avg of
    * per-row ratios). Pure row-local regex split riding the scan.
    */
  def textSentenceStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        filter(split(col("text"), "[.!?]\\s+|[.!?]$"), t => length(trim(t)) > 0)
          .as("sents"))
      .withColumn("n_sents", size(col("sents")).cast("long"))
      .withColumn("n_toks", expr(
        "aggregate(sents, 0L, (acc, x) -> acc + cast(size(filter(split(x, ' '), w -> length(w) > 0)) as long))"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_sents")).as("n_sentences"),
        round(sum(col("n_toks")).cast("double") /
          sum(col("n_sents")).cast("double"), 6).as("mean_sent_tokens"))
      .orderBy("lang")
  val textSentenceStatsSql: String =
    """WITH t AS (
      |  SELECT lang,
      |    list_filter(regexp_split_to_array(text, '[.!?]\s+|[.!?]$'),
      |      x -> len(trim(x)) > 0) AS sents
      |  FROM documents),
      |m AS (
      |  SELECT lang, len(sents) AS n_sents,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(sents,
      |      x -> CAST(len(list_filter(string_split(x, ' '), w -> len(w) > 0))
      |           AS BIGINT))),
      |      (a, b) -> a + b) AS n_toks
      |  FROM t)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_sents) AS BIGINT) AS n_sentences,
      |  round(CAST(sum(n_toks) AS DOUBLE) / CAST(sum(n_sents) AS DOUBLE), 6)
      |    AS mean_sent_tokens
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_cumulative_users" -> (analyticsCumulativeUsers _),
    "text_sentence_stats" -> (textSentenceStats _))

  val oracle: Map[String, String] = Map(
    "analytics_cumulative_users" -> analyticsCumulativeUsersSql,
    "text_sentence_stats" -> textSentenceStatsSql)
}
