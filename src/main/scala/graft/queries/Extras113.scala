package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** 113th wave — per-language token-distribution divergence: the text
  * counterpart of the C451/C452 drift metrics, and the measurement a
  * multilingual-corpus curator reads before reweighting a mix.
  */
object Extras113 {

  /** Fixed reference-vocabulary size — the top-V corpus tokens by
    * (count DESC, token ASC), a deterministic selection; everything
    * else folds into an OOV bucket so the distributions are complete.
    */
  val KlVocab = 50L

  /** text_lang_token_kl — KL divergence (bits) of each language's
    * token distribution from the corpus-wide distribution, over the
    * fixed top-50 vocabulary + OOV bucket: KL(lang ‖ corpus) =
    * Σ p·log2(p/q) with +1-smoothed exact-count rationals, folded over
    * the token-sorted list (the C-entropy parity discipline). The
    * ranked-vocab selection is a total order (count DESC, token ASC);
    * the dense (lang × support) grid plus a smoothing constant equal
    * to the OBSERVED support size keep both distributions normalized
    * over the same support (a fixed vocab+1 constant de-normalized
    * them on this 31-token generator corpus — KL went measurably
    * negative, the Gibbs bound is the spec's tripwire), so KL is
    * finite, well-defined, ≥ 0. Shapes: one token-count pass, a
    * 51-row broadcast vocabulary, one per-(lang,token) aggregation and
    * a per-lang sorted fold — no quadratic anything; at 100 TB the
    * vocab is a staged dictionary artifact.
    */
  def textLangTokenKl(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint(true) // 3 consumers: vocab, corpus dist, lang dist
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(KlVocab.toInt)
      .select(col("w"))
    val mapped = toks.join(broadcast(vocab.withColumn("inv", lit(true))),
        Seq("w"), "left")
      .select(col("lang"),
        when(col("inv"), col("w")).otherwise(lit("<oov>")).as("tok"))
    val corpus = mapped.groupBy("tok").agg(count(lit(1)).as("cq"))
    val perLang = mapped.groupBy("lang", "tok").agg(count(lit(1)).as("cp"))
    // DENSE (lang x token) grid: a vocab token a language never uses
    // still contributes its smoothed (0+1)/(tp+k) term — dropping the
    // row would silently truncate the distribution's support
    val grid = mapped.select("lang").distinct()
      .crossJoin(broadcast(corpus))
    val joined = grid.join(perLang, Seq("lang", "tok"), "left")
      .select(col("lang"), col("tok"), col("cq"),
        coalesce(col("cp"), lit(0L)).as("cp"))
    val totals = mapped.groupBy("lang").agg(count(lit(1)).as("tp"))
    val grand = mapped.count()
    // smoothing constant = the ACTUAL support size (size(bl)): the
    // generator corpus has only 31 distinct tokens, so a fixed
    // vocab+1 constant would de-normalize both distributions (Σp < 1
    // breaks Gibbs and KL went measurably negative)
    joined.join(broadcast(totals), "lang")
      .groupBy("lang")
      .agg(max(col("tp")).as("n_tokens"),
        sort_array(collect_list(struct(col("tok"), col("cp"), col("cq"),
          col("tp")))).as("bl"))
      .select(col("lang"), col("n_tokens"),
        round(expr(
          s"""aggregate(bl, 0D, (acc, b) ->
             |  acc + (CAST(b.cp + 1 AS DOUBLE) / CAST(b.tp + size(bl) AS DOUBLE))
             |    * log2((CAST(b.cp + 1 AS DOUBLE) / CAST(b.tp + size(bl) AS DOUBLE))
             |      / (CAST(b.cq + 1 AS DOUBLE) / CAST($grand + size(bl) AS DOUBLE))))"""
            .stripMargin), 8).as("kl_bits"))
      .orderBy("lang")
  }
  val textLangTokenKlSql: String = {
    s"""WITH toks AS (
       |  SELECT lang, w FROM (
       |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, count(*) AS n FROM toks GROUP BY 1
       |    ORDER BY n DESC, w ASC LIMIT $KlVocab)),
       |mapped AS (
       |  SELECT t.lang,
       |    CASE WHEN v.w IS NOT NULL THEN t.w ELSE '<oov>' END AS tok
       |  FROM toks t LEFT JOIN vocab v ON v.w = t.w),
       |corpus AS (SELECT tok, CAST(count(*) AS BIGINT) AS cq
       |  FROM mapped GROUP BY 1),
       |grand AS (SELECT CAST(count(*) AS BIGINT) AS g FROM mapped),
       |perlang AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cp
       |  FROM mapped GROUP BY 1, 2),
       |grid AS (
       |  SELECT l.lang, c.tok, c.cq
       |  FROM (SELECT DISTINCT lang FROM mapped) l CROSS JOIN corpus c),
       |dense AS (
       |  SELECT g.lang, g.tok, g.cq, coalesce(p.cp, 0) AS cp
       |  FROM grid g LEFT JOIN perlang p
       |    ON p.lang = g.lang AND p.tok = g.tok),
       |totals AS (SELECT lang, CAST(count(*) AS BIGINT) AS tp
       |  FROM mapped GROUP BY 1),
       |g AS (
       |  SELECT d.lang, t.tp AS n_tokens,
       |    list_sort(list(struct_pack(tok := d.tok, cp := d.cp, cq := d.cq,
       |      tp := t.tp, g := gr.g))) AS bl
       |  FROM dense d
       |  JOIN totals t ON t.lang = d.lang
       |  CROSS JOIN grand gr
       |  GROUP BY 1, 2)
       |SELECT lang, n_tokens,
       |  round(list_reduce(list_prepend(0.0, list_transform(bl, b ->
       |    (CAST(b.cp + 1 AS DOUBLE) / CAST(b.tp + len(bl) AS DOUBLE))
       |    * log2((CAST(b.cp + 1 AS DOUBLE) / CAST(b.tp + len(bl) AS DOUBLE))
       |      / (CAST(b.cq + 1 AS DOUBLE)
       |         / CAST(b.g + len(bl) AS DOUBLE))))),
       |    (x, y) -> x + y), 8) AS kl_bits
       |FROM g ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_lang_token_kl" -> (textLangTokenKl _))

  val oracle: Map[String, String] = Map(
    "text_lang_token_kl" -> textLangTokenKlSql)
}
