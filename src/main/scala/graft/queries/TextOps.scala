package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for the training-data pipeline (builder
  * brief: language-ID, quality scoring, token counting, document
  * fingerprinting) — all beyond SURVEY §2-B's B43/B44 but graded as
  * first-class.
  *
  * Scale notes: quality/token-count/fingerprint are per-row expression
  * work fused into the scan (no shuffle but the R1 sort). The langid
  * pipeline is explode → two hash aggregations → broadcast-sized model
  * join → per-doc argmax window — the shuffles are keyed by token and
  * (doc, lang), both high-cardinality and skew-free.
  *
  * Determinism: every ratio is a single IEEE division of exact integer
  * counts; langid scores are fixed-point integers (cnt·10⁹ div total),
  * so the argmax is integer-exact with a lexicographic tie-break.
  */
object TextOps {

  /** Stopword list for quality scoring (vocabulary-appropriate). */
  private val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"

  /** text_quality_score — per-document quality features: token count,
    * stopword ratio, average token length, and a blended score. The
    * score arithmetic is written in identical operation order in both
    * engines, so doubles match bit-for-bit.
    */
  def textQualityScore(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", size(expr(s"filter(toks, t -> t IN $stopSql)")))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        ((col("n_chars") - (col("n_tokens") - lit(1))).cast("double") / col("n_tokens"))
          .as("avg_tok_len"),
        (lit(0.3) * (col("n_stop").cast("double") / col("n_tokens")) +
         lit(0.7) * (least(col("n_tokens"), lit(100)).cast("double") / lit(100.0)))
          .as("quality"))
      .orderBy("doc_id")
  val textQualityScoreSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN $stopSql)) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stop_ratio,
       |  CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS avg_tok_len,
       |  0.3 * (CAST(len(list_filter(string_split(text, ' '), t -> t IN $stopSql)) AS DOUBLE)
       |         / len(string_split(text, ' ')))
       |  + 0.7 * (CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  /** text_token_count — whitespace tokens vs a BPE-ish greedy-chunk
    * regex count ([a-z]{1,4} pieces, digit runs, stray punctuation) per
    * document. Same simple regex class in both engines' dialects.
    */
  def textTokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]', 0)"))
          .as("n_bpe_tokens"),
        col("n_chars"))
      .orderBy("doc_id")
  val textTokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]')) AS INTEGER)
      |    AS n_bpe_tokens,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** text_fingerprint — order/duplication-insensitive content
    * fingerprint: md5 over the sorted distinct token set, grouped like
    * dedup_exact. Catches shuffled/repeated-token near-copies that
    * exact text hashing misses.
    */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))).cast("binary"))
        .as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("fingerprint")
  val textFingerprintSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
      |    AS fingerprint,
      |  count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  /** text_langid_confusion — n-gram-profile language ID, self-trained:
    * per-language token rates become the model (fixed-point integers:
    * cnt·10⁹ div lang_total), each document scores every language by
    * summing its tokens' rates, argmax predicts. Output is the
    * (actual, predicted) confusion matrix.
    *
    * The model side (token×lang rates) is dictionary-sized —
    * broadcast-joined against the exploded corpus at any scale.
    */
  def textLangidConfusion(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val totals = toks.groupBy(col("lang").as("m_lang")).agg(count(lit(1)).as("total"))
    val rates = toks.groupBy(col("tok").as("m_tok"), col("lang").as("m_lang"))
      .agg(count(lit(1)).as("cnt"))
      .join(totals, "m_lang")
      .select(col("m_tok"), col("m_lang"), expr("cnt * 1000000000 DIV total").as("rate"))
    val scores = toks
      .join(broadcast(rates), col("tok") === col("m_tok"))
      .groupBy(col("doc_id"), col("lang"), col("m_lang"))
      .agg(sum(col("rate")).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("m_lang").asc)
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("lang"), col("m_lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }
  val textLangidConfusionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
      |), totals AS (
      |  SELECT lang AS m_lang, count(*) AS total FROM toks GROUP BY 1
      |), rates AS (
      |  SELECT tok AS m_tok, lang AS m_lang, count(*) * 1000000000 // max(total) AS rate
      |  FROM toks JOIN totals ON totals.m_lang = toks.lang
      |  GROUP BY tok, lang
      |), scores AS (
      |  SELECT t.doc_id, t.lang, r.m_lang, sum(r.rate) AS score
      |  FROM toks t JOIN rates r ON t.tok = r.m_tok
      |  GROUP BY t.doc_id, t.lang, r.m_lang
      |), pred AS (
      |  SELECT doc_id, lang, m_lang AS pred_lang,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, m_lang ASC) AS rn
      |  FROM scores)
      |SELECT lang, pred_lang, count(*) AS n_docs
      |FROM pred WHERE rn = 1
      |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_score" -> (textQualityScore _),
    "text_token_count" -> (textTokenCount _),
    "text_fingerprint" -> (textFingerprint _),
    "text_langid_confusion" -> (textLangidConfusion _),
  )

  val oracle: Map[String, String] = Map(
    "text_quality_score" -> textQualityScoreSql,
    "text_token_count" -> textTokenCountSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_langid_confusion" -> textLangidConfusionSql,
  )
}
