package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fifty-ninth wave: robust (median/MAD) outlier detection and the
  * intra-document repetition filter every pretraining cleanup runs.
  */
object Extras59 {

  /** agg_mad_robust — robust outlier census via MEDIAN ABSOLUTE
    * DEVIATION (the heavy-tail-safe twin of C144's z-score): per
    * event type, med = the DISCRETE median of value (element
    * SELECTION — percentile_disc picks an actual data element, so the
    * result is an exact 2-decimal input value, bit-comparable across
    * engines, unlike interpolating percentile), MAD = discrete median
    * of |value − med|, and the outlier census counts rows with
    * |value − med| > 3·MAD. Two grouped selection aggregates + one
    * broadcast-back pass — no sort of the full table, no window.
    */
  def aggMadRobust(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val withDev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = withDev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
    withDev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }
  val aggMadRobustSql: String =
    """WITH med AS (
      |  SELECT event_type,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT d.event_type, count(*) AS n, max(d.med) AS med, max(m.mad) AS mad,
      |  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  /** text_repetition_filter — the INTRA-document repetition rules a
    * pretraining cleanup runs (the duplicate-n-gram family of quality
    * heuristics): per document, the duplicate-2-gram fraction
    * (1 − distinct/total bigrams) and the top-token fraction (share
    * of the single most frequent token), each pure row-local array
    * arithmetic riding the scan — the shape that filters a 100 TB
    * corpus with zero shuffle before the census. Per-language census
    * of documents flagged by either rule (dup-2gram > 0.2 or
    * top-token > 0.1; each per-doc fraction is ONE IEEE division of
    * exact integers — deterministic per row), plus the corpus-level
    * aggregate fractions derived from exact INTEGER sums with one
    * final division each (a float `avg` of per-doc ratios would be
    * accumulation-order-dependent).
    */
  def textRepetitionFilter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        filter(split(lower(col("text")), " "), t => length(t) > 0).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") >= 2)
      .withColumn("bigrams", expr(
        "transform(sequence(1, cast(n_tok as int) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
      .withColumn("dup2_frac",
        lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
          (col("n_tok") - 1).cast("double"))
      .withColumn("top_cnt", expr(
        """aggregate(array_distinct(toks), 0L,
          |  (acc, t) -> greatest(acc, cast(size(filter(toks, x -> x = t)) as long)))"""
          .stripMargin))
      .withColumn("top_tok_frac",
        col("top_cnt").cast("double") / col("n_tok").cast("double"))
      .withColumn("flagged",
        col("dup2_frac") > 0.2 || col("top_tok_frac") > 0.1)
      .withColumn("n_dist2", size(array_distinct(col("bigrams"))).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        round(lit(1.0) - sum(col("n_dist2")).cast("double") /
          sum(col("n_tok") - 1).cast("double"), 6).as("corpus_dup2_frac"),
        round(sum(col("top_cnt")).cast("double") /
          sum(col("n_tok")).cast("double"), 6).as("corpus_top_tok_frac"))
      .orderBy("lang")
  val textRepetitionFilterSql: String =
    """WITH t AS (
      |  SELECT lang,
      |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
      |  FROM documents),
      |m AS (
      |  SELECT lang, len(toks) AS n_tok,
      |    list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1]) AS bigrams,
      |    toks
      |  FROM t WHERE len(toks) >= 2),
      |f AS (
      |  SELECT lang, n_tok,
      |    len(list_distinct(bigrams)) AS n_dist2,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(list_distinct(toks),
      |          t -> CAST(len(list_filter(toks, x -> x = t)) AS BIGINT))),
      |        (a, b) -> greatest(a, b)) AS top_cnt
      |  FROM m),
      |g AS (
      |  SELECT lang, n_tok, n_dist2, top_cnt,
      |    1.0 - CAST(n_dist2 AS DOUBLE) / CAST(n_tok - 1 AS DOUBLE) AS dup2_frac,
      |    CAST(top_cnt AS DOUBLE) / CAST(n_tok AS DOUBLE) AS top_tok_frac
      |  FROM f)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN dup2_frac > 0.2 OR top_tok_frac > 0.1
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  round(1.0 - CAST(sum(n_dist2) AS DOUBLE)
      |        / CAST(sum(n_tok - 1) AS DOUBLE), 6) AS corpus_dup2_frac,
      |  round(CAST(sum(top_cnt) AS DOUBLE)
      |        / CAST(sum(n_tok) AS DOUBLE), 6) AS corpus_top_tok_frac
      |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mad_robust" -> (aggMadRobust _),
    "text_repetition_filter" -> (textRepetitionFilter _))

  val oracle: Map[String, String] = Map(
    "agg_mad_robust" -> aggMadRobustSql,
    "text_repetition_filter" -> textRepetitionFilterSql)
}
