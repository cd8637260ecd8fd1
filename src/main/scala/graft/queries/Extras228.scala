package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 128 (C916–C919): four training-data-curation primitives —
  * DSIR importance weights, the Gopher quality-rule census, winnowing
  * fingerprint selection, and per-document character entropy.
  *
  * Shared discipline: DSIR's 256-bucket log-likelihood table is
  * ·10⁹-quantized ONCE and broadcast so per-doc weights are exact
  * integer sums; every Gopher rule is an exact integer inequality
  * (3n ≤ Σlen ≤ 10n, 5·alpha ≥ 4·n); winnowing window-min identities
  * ride a single h·2²⁴+pos BIGINT (no struct aggregates — engine-
  * portable); per-(doc,char) entropy terms quantize ·10¹² before the
  * per-doc integer sum.
  */
object Extras228 {

  /** C916 pipeline_dsir_weights — Data Selection via Importance
    * Resampling (hashed-n-gram variant): 256 md5 unigram buckets,
    * target = English docs, source = full corpus, +1-smoothed bucket
    * probabilities, per-doc importance log-weight Σ_tok q(ln p_t/p_s)
    * as an exact integer sum of the broadcast ·10⁹-quantized table.
    * Reported per language: the EN rows must self-select (sanity the
    * output pins). The standard cheap proxy for "looks like the target
    * distribution" when curating pretraining mixes.
    * Scale: one token explode + two 256-row histograms; the per-doc
    * pass joins a 256-row broadcast.
    */
  def pipelineDsirWeights(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("long").as("b"))
    val srcH = toks.groupBy("b").agg(count(lit(1)).cast("long").as("cs"))
    val tgtH = toks.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).cast("long").as("ct"))
    val tots = srcH.agg(sum(col("cs")).cast("long").as("ts"))
      .crossJoin(broadcast(tgtH.agg(sum(col("ct")).cast("long").as("tt"))))
    val table = srcH.join(tgtH, Seq("b"), "left").crossJoin(broadcast(tots))
      .select(col("b"), expr(
        """CAST(floor((ln((CAST(coalesce(ct, 0L) AS DOUBLE) + 1) / (CAST(tt AS DOUBLE) + 256))
          | - ln((CAST(cs AS DOUBLE) + 1) / (CAST(ts AS DOUBLE) + 256))) * 1e9 + 0.5) AS BIGINT)""".stripMargin)
        .as("lw"))
    val perDoc = toks.join(broadcast(table), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("lw")).cast("long").as("dlw"), count(lit(1)).cast("long").as("ntok"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(expr("CAST(floor(CAST(dlw AS DOUBLE) / ntok + 0.5) AS BIGINT)")).cast("long").as("slwpt"),
        sum(expr("CASE WHEN dlw > 0 THEN 1L ELSE 0L END")).cast("long").as("pos"))
      .selectExpr("lang", "n_docs",
        "round(CAST(slwpt AS DOUBLE) / n_docs / 1e9, 6) AS mean_logweight_per_token",
        "round(CAST(pos AS DOUBLE) / n_docs, 6) AS frac_selected")
      .orderBy("lang")
  }
  val pipelineDsirWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(CAST('0x' || substr(md5(tok), 1, 2) AS BIGINT) AS BIGINT) AS b
      |  FROM (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents)),
      |srch AS (SELECT b, CAST(count(*) AS BIGINT) AS cs FROM toks GROUP BY 1),
      |tgth AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM toks WHERE lang = 'en' GROUP BY 1),
      |tots AS (
      |  SELECT (SELECT CAST(sum(cs) AS BIGINT) FROM srch) AS ts,
      |    (SELECT CAST(sum(ct) AS BIGINT) FROM tgth) AS tt),
      |tbl AS (
      |  SELECT srch.b,
      |    CAST(floor((ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1) / (CAST(tt AS DOUBLE) + 256))
      |     - ln((CAST(cs AS DOUBLE) + 1) / (CAST(ts AS DOUBLE) + 256))) * 1e9 + 0.5) AS BIGINT) AS lw
      |  FROM srch LEFT JOIN tgth ON srch.b = tgth.b CROSS JOIN tots),
      |perdoc AS (
      |  SELECT doc_id, lang, CAST(sum(lw) AS BIGINT) AS dlw, CAST(count(*) AS BIGINT) AS ntok
      |  FROM toks JOIN tbl ON toks.b = tbl.b GROUP BY 1, 2)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(CAST(floor(CAST(dlw AS DOUBLE) / ntok + 0.5) AS BIGINT)) AS DOUBLE)
      |    / count(*) / 1e9, 6) AS mean_logweight_per_token,
      |  round(CAST(sum(CASE WHEN dlw > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS frac_selected
      |FROM perdoc GROUP BY 1 ORDER BY lang""".stripMargin

  /** C917 pipeline_gopher_rules — the Gopher-style quality-rule census
    * over the corpus: R1 word count ∈ [50, 100000], R2 mean word
    * length ∈ [3, 10] (exact 3n ≤ Σlen ≤ 10n), R3 ≥80% of words
    * contain a Latin letter (exact 5·alpha ≥ 4·n), R4 ≥2 stopwords
    * from a fixed 8-word list. Per-rule failure counts + the pass-all
    * rate — the first thing a curation run reports before any model
    * ever trains. Zero FP in any rule decision.
    */
  def pipelineGopherRules(s: SparkSession, d: String): DataFrame = {
    val f = documents(s, d)
      .select(split(lower(col("text")), " ").as("t"))
      .select(size(col("t")).cast("long").as("nw"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("tl"),
        expr("CAST(size(filter(t, x -> x rlike '[a-z]')) AS BIGINT)").as("alpha"),
        expr("""CAST(size(filter(t, x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT)""")
          .as("stop"))
      .select(
        expr("CASE WHEN nw >= 50 AND nw <= 100000 THEN 0L ELSE 1L END").as("f1"),
        expr("CASE WHEN 3 * nw <= tl AND tl <= 10 * nw THEN 0L ELSE 1L END").as("f2"),
        expr("CASE WHEN 5 * alpha >= 4 * nw THEN 0L ELSE 1L END").as("f3"),
        expr("CASE WHEN stop >= 2 THEN 0L ELSE 1L END").as("f4"))
    f.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("f1")).cast("long").as("fail_word_count"),
        sum(col("f2")).cast("long").as("fail_mean_word_len"),
        sum(col("f3")).cast("long").as("fail_alpha_ratio"),
        sum(col("f4")).cast("long").as("fail_stopwords"),
        sum(expr("CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1L ELSE 0L END"))
          .cast("long").as("pass_all"))
      .selectExpr("n_docs", "fail_word_count", "fail_mean_word_len",
        "fail_alpha_ratio", "fail_stopwords", "pass_all",
        "round(CAST(pass_all AS DOUBLE) / n_docs, 6) AS pass_rate")
  }
  val pipelineGopherRulesSql: String =
    """WITH f AS (
      |  SELECT
      |    CASE WHEN nw >= 50 AND nw <= 100000 THEN 0 ELSE 1 END AS f1,
      |    CASE WHEN 3 * nw <= tl AND tl <= 10 * nw THEN 0 ELSE 1 END AS f2,
      |    CASE WHEN 5 * alpha >= 4 * nw THEN 0 ELSE 1 END AS f3,
      |    CASE WHEN stop >= 2 THEN 0 ELSE 1 END AS f4
      |  FROM (
      |    SELECT CAST(len(t) AS BIGINT) AS nw,
      |      CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS tl,
      |      CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha,
      |      CAST(len(list_filter(t, x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop
      |    FROM (SELECT string_split(lower(text), ' ') AS t FROM documents)))
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(f1) AS BIGINT) AS fail_word_count,
      |  CAST(sum(f2) AS BIGINT) AS fail_mean_word_len,
      |  CAST(sum(f3) AS BIGINT) AS fail_alpha_ratio,
      |  CAST(sum(f4) AS BIGINT) AS fail_stopwords,
      |  CAST(sum(CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
      |  round(CAST(sum(CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pass_rate
      |FROM f""".stripMargin

  /** C918 dedup_winnowing — winnowing fingerprint selection (Schleimer
    * et al., the MOSS algorithm): 3-token k-gram md5 hashes, window
    * w=4 minimum selection with the h·2²⁴+min(pos,2²⁴−1) combined
    * BIGINT (min-by-hash then earliest-position, no struct aggregates),
    * distinct selected fingerprints per doc, and the cross-document
    * collision census — the guaranteed-detection substring-match tier
    * between exact hashing and MinHash. Density must sit near the
    * theoretical 2/(w+1).
    * Scale: per-doc windows (partitioned by doc_id — hash-distributed),
    * one groupBy for the collision census; linear in tokens.
    */
  private def winnowKgrams(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("i", "tok")))
    val w3 = Window.partitionBy("doc_id").orderBy("i")
    toks
      .withColumn("t1", lag(col("tok"), 1).over(w3))
      .withColumn("t2", lag(col("tok"), 2).over(w3))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("i"),
        conv(substring(md5(concat_ws(" ", col("t2"), col("t1"), col("tok"))), 1, 8), 16, 10)
          .cast("long").as("h"))
  }

  private def winnowSel(s: SparkSession, d: String): DataFrame = {
    val hk = winnowKgrams(s, d).select(col("doc_id"), col("i"),
      expr("h * 16777216L + least(i, 16777215L)").as("hk"))
    val wWin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-3, 0)
    hk
      .withColumn("rnk", row_number().over(Window.partitionBy("doc_id").orderBy("i")))
      .withColumn("fp", min(col("hk")).over(wWin))
      .filter(col("rnk") >= 4)
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Test support: the selected fingerprints of one document. */
  def dedupWinnowingDocFps(s: SparkSession, d: String, docId: Long): Array[Long] =
    winnowSel(s, d).filter(col("doc_id") === docId)
      .collect().map(_.getLong(1))

  def dedupWinnowing(s: SparkSession, d: String): DataFrame = {
    val kgrams = winnowKgrams(s, d)
    val sel = winnowSel(s, d)
    val stats = kgrams.agg(count(lit(1)).cast("long").as("n_kgrams"),
      countDistinct(col("doc_id")).cast("long").as("n_docs"))
    val fps = sel.agg(count(lit(1)).cast("long").as("n_fps"))
    // decode the hash part for the cross-doc census
    val census = sel.select(col("doc_id"), expr("fp div 16777216L").as("h"))
      .distinct()
      .groupBy("h").agg(countDistinct(col("doc_id")).cast("long").as("nd"))
      .agg(sum(expr("CASE WHEN nd >= 2 THEN 1L ELSE 0L END")).cast("long").as("shared_hashes"),
        max(col("nd")).as("max_docs_per_hash"))
    stats.crossJoin(broadcast(fps)).crossJoin(broadcast(census))
      .selectExpr("n_docs", "n_kgrams", "n_fps",
        "round(CAST(n_fps AS DOUBLE) / n_kgrams, 6) AS density",
        "shared_hashes", "max_docs_per_hash")
  }
  val dedupWinnowingSql: String =
    """WITH toks AS (
      |  SELECT doc_id, i0 - 1 AS i, t[i0] AS tok
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(t))) AS i0)),
      |kgrams AS (
      |  SELECT doc_id, i,
      |    CAST(CAST('0x' || substr(md5(t2 || ' ' || t1 || ' ' || tok), 1, 8) AS BIGINT) AS BIGINT) AS h
      |  FROM (
      |    SELECT doc_id, i, tok,
      |      lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1,
      |      lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS t2
      |    FROM toks)
      |  WHERE t2 IS NOT NULL),
      |hk AS (
      |  SELECT doc_id, i, h * 16777216 + least(i, 16777215) AS hk FROM kgrams),
      |sel AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rnk,
      |      min(hk) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
      |    FROM hk)
      |  WHERE rnk >= 4),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_kgrams,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |  FROM kgrams),
      |fps AS (SELECT CAST(count(*) AS BIGINT) AS n_fps FROM sel),
      |census AS (
      |  SELECT CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_hashes,
      |    CAST(max(nd) AS BIGINT) AS max_docs_per_hash
      |  FROM (
      |    SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      |    FROM (SELECT DISTINCT doc_id, fp // 16777216 AS h FROM sel) GROUP BY 1))
      |SELECT n_docs, n_kgrams, n_fps,
      |  round(CAST(n_fps AS DOUBLE) / n_kgrams, 6) AS density,
      |  shared_hashes, max_docs_per_hash
      |FROM stats, fps, census""".stripMargin

  /** C919 text_char_entropy — per-document character-level Shannon
    * entropy (nats): per-(doc,char) terms (c/n)·ln(n/c) quantized
    * ·10¹² then integer-summed per doc, reported as per-language means
    * with the min-entropy doc flagged. The compression-proxy quality
    * signal — boilerplate and generator loops score low, natural prose
    * high — every curation stack thresholds on.
    * Scale: one position explode (linear in chars) + two groupBys.
    */
  def textCharEntropy(s: SparkSession, d: String): DataFrame = {
    val chars = documents(s, d)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 1) // sequence(1, 0) would DESCEND in Spark
      .select(col("doc_id"), col("lang"), length(col("t")).cast("long").as("n"),
        explode(expr("sequence(1, length(t))")).as("i"), col("t"))
      .select(col("doc_id"), col("lang"), col("n"), expr("substring(t, i, 1)").as("ch"))
    val terms = chars.groupBy("doc_id", "lang", "n", "ch")
      .agg(count(lit(1)).cast("long").as("c"))
      .select(col("doc_id"), col("lang"),
        expr("""CAST(floor(CAST(c AS DOUBLE) / n * ln(CAST(n AS DOUBLE) / c) * 1e12 + 0.5) AS BIGINT)""")
          .as("tq"))
    val perDoc = terms.groupBy("doc_id", "lang")
      .agg(sum(col("tq")).cast("long").as("hq"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("hq")).cast("decimal(38,0)").as("sh"),
        min(col("hq")).as("minh"), max(col("hq")).as("maxh"))
      .selectExpr("lang", "n_docs",
        "round(CAST(sh AS DOUBLE) / n_docs / 1e12, 6) AS mean_entropy_nats",
        "round(CAST(minh AS DOUBLE) / 1e12, 6) AS min_entropy",
        "round(CAST(maxh AS DOUBLE) / 1e12, 6) AS max_entropy")
      .orderBy("lang")
  }
  val textCharEntropySql: String =
    """WITH chars AS (
      |  SELECT doc_id, lang, n, substr(t, i, 1) AS ch
      |  FROM (SELECT doc_id, lang, lower(text) AS t,
      |          CAST(length(lower(text)) AS BIGINT) AS n
      |        FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, CAST(n AS BIGINT))) AS i)),
      |terms AS (
      |  SELECT doc_id, lang,
      |    CAST(floor(CAST(c AS DOUBLE) / n * ln(CAST(n AS DOUBLE) / c) * 1e12 + 0.5) AS BIGINT) AS tq
      |  FROM (SELECT doc_id, lang, n, ch, CAST(count(*) AS BIGINT) AS c
      |        FROM chars GROUP BY 1, 2, 3, 4)),
      |perdoc AS (
      |  SELECT doc_id, lang, CAST(sum(tq) AS BIGINT) AS hq FROM terms GROUP BY 1, 2)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(CAST(sum(CAST(hq AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*) / 1e12, 6) AS mean_entropy_nats,
      |  round(CAST(min(hq) AS DOUBLE) / 1e12, 6) AS min_entropy,
      |  round(CAST(max(hq) AS DOUBLE) / 1e12, 6) AS max_entropy
      |FROM perdoc GROUP BY 1 ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dsir_weights" -> (pipelineDsirWeights _),
    "pipeline_gopher_rules" -> (pipelineGopherRules _),
    "dedup_winnowing" -> (dedupWinnowing _),
    "text_char_entropy" -> (textCharEntropy _),
  )

  val oracle: Map[String, String] = Map(
    "pipeline_dsir_weights" -> pipelineDsirWeightsSql,
    "pipeline_gopher_rules" -> pipelineGopherRulesSql,
    "dedup_winnowing" -> dedupWinnowingSql,
    "text_char_entropy" -> textCharEntropySql,
  )
}
