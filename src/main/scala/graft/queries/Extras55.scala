package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fifty-fifth wave: distribution-comparison statistics over the
  * distributed prefix-scan (KS test), Welch's t, the end-to-end dedup
  * CASCADE every corpus release runs, and BM25 ranking over the corpus
  * statistics the text index already maintains.
  */
object Extras55 {

  /** stat_ks_test — two-sample Kolmogorov–Smirnov D between the click
    * and view `value` distributions: D = max over pooled values of
    * |ECDF₁ − ECDF₂|. The distributed shape: group the pool by VALUE
    * (one row per distinct value with both samples' counts — the only
    * corpus-sized shuffle), then the running counts ride
    * [[graft.plans.GlobalRank.withExclusivePrefixSum]] twice — the
    * two-pass range-partitioned prefix scan, NOT a global
    * `Window.orderBy` — and the ECDF difference is one IEEE division
    * pair per distinct value, so the max is order-independent and
    * bit-stable at any parallelism.
    */
  def statKsTest(s: SparkSession, d: String): DataFrame = {
    val perValue = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("value")
      .agg(
        count(when(col("event_type") === "click", 1)).as("n1v"),
        count(when(col("event_type") === "view", 1)).as("n2v"))
    val c1 = graft.plans.GlobalRank.withExclusivePrefixSum(
      perValue, "c1ex", col("n1v"), Seq(col("value").asc))
    val c2 = graft.plans.GlobalRank.withExclusivePrefixSum(
      c1, "c2ex", col("n2v"), Seq(col("value").asc))
    val tot = perValue.agg(
      sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"))
    c2.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs((col("c1ex") + col("n1v")).cast("double") / col("n1") -
            (col("c2ex") + col("n2v")).cast("double") / col("n2")).as("diff"))
      .groupBy("n1", "n2")
      .agg(max(col("diff")).as("d_stat"))
      .select(col("n1"), col("n2"), col("d_stat"))
  }
  val statKsTestSql: String =
    """WITH pv AS (
      |  SELECT value,
      |    count(*) FILTER (WHERE event_type = 'click') AS n1v,
      |    count(*) FILTER (WHERE event_type = 'view') AS n2v
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY value),
      |c AS (
      |  SELECT value, n1v, n2v,
      |    sum(n1v) OVER (ORDER BY value) AS c1,
      |    sum(n2v) OVER (ORDER BY value) AS c2
      |  FROM pv),
      |t AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
      |             CAST(sum(n2v) AS BIGINT) AS n2 FROM pv)
      |SELECT t.n1, t.n2,
      |  max(abs(CAST(c1 AS DOUBLE) / t.n1 - CAST(c2 AS DOUBLE) / t.n2)) AS d_stat
      |FROM c, t GROUP BY t.n1, t.n2""".stripMargin

  /** stat_welch_ttest — Welch's unequal-variance t between two corpora
    * (en vs de document lengths): means and sample variances derive
    * from EXACT integer sums (n, Σx, Σx² — n_chars ≤ 500 keeps Σx²
    * within int64 here; a 100 TB run would carry Σx² as DECIMAL(38,0),
    * same plan shape), then t and the Welch–Satterthwaite df are one
    * fixed IEEE expression per side — no cross-row float accumulation
    * anywhere, so the single output row is bit-stable and the oracle
    * recomputes the identical arithmetic tree.
    */
  def statWelchTtest(s: SparkSession, d: String): DataFrame = {
    val m = documents(s, d)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .select(col("lang"), col("n"),
        (col("sx").cast("double") / col("n")).as("m"),
        ((col("sxx").cast("double") - col("sx").cast("double") *
          col("sx").cast("double") / col("n")) / (col("n") - 1)).as("v"))
    val en = m.filter(col("lang") === "en")
      .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
    val de = m.filter(col("lang") === "de")
      .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
    en.crossJoin(broadcast(de))
      .select(col("n1"), col("n2"),
        (col("m1") - col("m2")).as("mean_diff"),
        ((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2"))).as("t_stat"),
        (pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
           pow(col("v2") / col("n2"), 2) / (col("n2") - 1))).as("df_welch"))
  }
  val statWelchTtestSql: String =
    """WITH m AS (
      |  SELECT lang, count(*) AS n,
      |    CAST(sum(n_chars) AS DOUBLE) / count(*) AS m,
      |    (CAST(sum(n_chars * n_chars) AS DOUBLE)
      |      - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) / count(*))
      |      / (count(*) - 1) AS v
      |  FROM documents WHERE lang IN ('en', 'de') GROUP BY lang),
      |en AS (SELECT n AS n1, m AS m1, v AS v1 FROM m WHERE lang = 'en'),
      |de AS (SELECT n AS n2, m AS m2, v AS v2 FROM m WHERE lang = 'de')
      |SELECT n1, n2, m1 - m2 AS mean_diff,
      |  (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
      |  pow(v1 / n1 + v2 / n2, 2)
      |    / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)) AS df_welch
      |FROM en, de""".stripMargin

  /** pipeline_dedup_cascade — the dedup FUNNEL a corpus release
    * actually runs, end-to-end in one report: exact normalized-hash
    * dedup first (cheap, removes byte-near copies), then the near-dup
    * keep-list (C220's component-minimum rule over C5's staged pair
    * graph) on the exact survivors. Per language: raw count, after
    * exact, after near-dup. Stage costs are shared — the pair graph
    * and shingle aggregates come from the same per-corpus stage the
    * graded C5/C37/C220 rows read ([[NgramPairStage]]). The oracle
    * replays both stages relationally (md5 canonical-min + recursive
    * component closure).
    */
  def pipelineDedupCascade(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val keyed = docs.select(col("doc_id"), col("lang"),
      md5(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")).as("h"))
    val exactKeep = keyed.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val surv1 = keyed.join(exactKeep, Seq("doc_id"), "left_semi")
    val drops = NearDupComponents.labels(s, d)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val surv2 = surv1.join(drops, Seq("doc_id"), "left_anti")
    keyed.groupBy("lang").agg(count(lit(1)).as("n_raw"))
      .join(surv1.groupBy("lang").agg(count(lit(1)).as("n_after_exact")), Seq("lang"))
      .join(surv2.groupBy("lang").agg(count(lit(1)).as("n_after_near")), Seq("lang"))
      .orderBy("lang")
  }
  val pipelineDedupCascadeSql: String =
    """WITH RECURSIVE
      |keyed AS (
      |  SELECT doc_id, lang,
      |    md5(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS h
      |  FROM documents),
      |exact_keep AS (SELECT min(doc_id) AS doc_id FROM keyed GROUP BY h),
      |surv1 AS (SELECT k.* FROM keyed k JOIN exact_keep e USING (doc_id)),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
      |  FROM documents),
      |edges AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.6),
      |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
      |walk(id, comp) AS (
      |  SELECT DISTINCT src, src FROM sym
      |  UNION
      |  SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.id),
      |drops AS (
      |  SELECT id AS doc_id FROM (SELECT id, min(comp) AS comp FROM walk GROUP BY id)
      |  WHERE id <> comp),
      |surv2 AS (
      |  SELECT * FROM surv1 WHERE doc_id NOT IN (SELECT doc_id FROM drops))
      |SELECT k.lang, count(*) AS n_raw,
      |  (SELECT count(*) FROM surv1 s WHERE s.lang = k.lang) AS n_after_exact,
      |  (SELECT count(*) FROM surv2 s WHERE s.lang = k.lang) AS n_after_near
      |FROM keyed k GROUP BY k.lang ORDER BY k.lang""".stripMargin

  /** text_bm25_rank — BM25 ranking (k₁=1.2, b=0.75) of the corpus for
    * a two-term query, top-10: idf from document frequencies, tf from
    * per-doc term occurrences, length normalization from token counts
    * and the corpus mean length. Exactly the statistics an inverted
    * index maintains (A3's scoring half — the reference ranks search
    * hits; C13 only filters). One explode pass for tf (filtered to the
    * query terms BEFORE the shuffle — the aggregate is O(hits), not
    * O(corpus tokens)), broadcast idf/avg constants back on; scores
    * are one fixed IEEE expression per (doc, term), summed over ≤2
    * terms per doc via pivot — no cross-row float accumulation of
    * unbounded width. Rounded to 8 dp (the log boundary, same as
    * C171) before the rank tiebreak on doc_id.
    */
  def textBm25Rank(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("merge", "join")
    val docs = documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("double").as("len"))
    val nAndAvg = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("len")) / count(lit(1))).as("avg_len"))
    val tf = docs
      .select(col("doc_id"), col("len"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "len", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df_), "tok")
      .crossJoin(broadcast(nAndAvg))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avg_len")))))
          .as("s"))
      .groupBy("doc_id")
      .agg(round(sum(col("s")), 8).as("score"))
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .select(col("doc_id"), col("score"))
  }
  val textBm25RankSql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
      |    CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS len
      |  FROM documents),
      |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |             sum(len) / count(*) AS avg_len FROM docs),
      |tf AS (
      |  SELECT doc_id, len, tok, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, len, unnest(toks) AS tok FROM docs)
      |  WHERE tok IN ('merge', 'join') GROUP BY doc_id, len, tok),
      |dfx AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT doc_id,
      |    round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avg_len)))), 8) AS score
      |  FROM tf JOIN dfx USING (tok) CROSS JOIN c
      |  GROUP BY doc_id)
      |SELECT doc_id, score FROM scored
      |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ks_test" -> (statKsTest _),
    "stat_welch_ttest" -> (statWelchTtest _),
    "pipeline_dedup_cascade" -> (pipelineDedupCascade _),
    "text_bm25_rank" -> (textBm25Rank _))

  val oracle: Map[String, String] = Map(
    "stat_ks_test" -> statKsTestSql,
    "stat_welch_ttest" -> statWelchTtestSql,
    "pipeline_dedup_cascade" -> pipelineDedupCascadeSql,
    "text_bm25_rank" -> textBm25RankSql)
}
