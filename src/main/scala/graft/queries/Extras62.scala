package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-second wave: importance-weighted deterministic sampling and
  * the cross-document boilerplate score over the staged shingle
  * document frequencies.
  */
object Extras62 {

  /** sample_importance_hash — importance-weighted sampling with a
    * DETERMINISTIC accept test (the quality-upweighting pass a corpus
    * mixture runs, reproducible across reruns and engines unlike
    * rand()-based sampling): each doc's keep probability is a
    * rule-derived quality weight (longer docs upweighted, capped at
    * 1.0), and the accept draw is the doc's md5 FRACTION (first 6 hex
    * digits / 16^6 — uniform on [0,1), pure function of the id, C38's
    * split trick generalized from a fixed threshold to a per-row
    * probability). Census per lang: kept docs, kept chars, and the
    * realized keep rate vs the weight mass (one IEEE division each
    * from exact integer sums).
    */
  def sampleImportanceHash(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("w",
        least(col("n_chars").cast("double") / 400.0, lit(1.0)))
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("double") / lit(16777216.0))
      .withColumn("kept", col("u") < col("w"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).cast("long")
          .as("kept_chars"),
        round(sum(when(col("kept"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("keep_rate"))
      .orderBy("lang")
  val sampleImportanceHashSql: String =
    """WITH t AS (
      |  SELECT lang, n_chars,
      |    least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) AS w,
      |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
      |      AS DOUBLE) / 16777216.0 AS u
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN u < w THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
      |  round(CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS keep_rate
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** text_boilerplate_score — cross-document BOILERPLATE fraction per
    * doc (the wrapper/template detector): the share of a doc's 3-gram
    * shingles that occur in MORE THAN ONE document. Rides the SAME
    * staged document-frequency frame the dedup family uses
    * ([[ShingleStage]] — the corpus-wide shuffle runs once per corpus,
    * this query adds one shingle-keyed join + per-doc rollup). Per-doc
    * fraction is one IEEE division of exact counts; per-lang census
    * reports docs above 60% boilerplate and the corpus-level fraction
    * from integer sums.
    */
  def textBoilerplateScore(s: SparkSession, d: String): DataFrame = {
    val sh = DedupExtras.shingles(s, d)
    val dfreq = ShingleStage.dfreq(s, d)
    val perDoc = sh.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
    documents(s, d).select(col("doc_id"), col("lang"))
      .join(perDoc, "doc_id")
      .withColumn("bp_frac",
        col("n_shared").cast("double") / col("n_sh").cast("double"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("bp_frac") > 0.6, 1L).otherwise(0L)).as("n_boilerplate"),
        round(sum(col("n_shared")).cast("double") /
          sum(col("n_sh")).cast("double"), 6).as("corpus_shared_frac"))
      .orderBy("lang")
  }
  val textBoilerplateScoreSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS g
      |  FROM documents),
      |dfreq AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
      |per_doc AS (
      |  SELECT doc_id, count(*) AS n_sh,
      |    sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS n_shared
      |  FROM sh JOIN dfreq USING (g) GROUP BY doc_id)
      |SELECT d.lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN CAST(n_shared AS DOUBLE) / n_sh > 0.6
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
      |  round(CAST(sum(n_shared) AS DOUBLE) / CAST(sum(n_sh) AS DOUBLE), 6)
      |    AS corpus_shared_frac
      |FROM documents d JOIN per_doc p USING (doc_id)
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_importance_hash" -> (sampleImportanceHash _),
    "text_boilerplate_score" -> (textBoilerplateScore _))

  val oracle: Map[String, String] = Map(
    "sample_importance_hash" -> sampleImportanceHashSql,
    "text_boilerplate_score" -> textBoilerplateScoreSql)
}
