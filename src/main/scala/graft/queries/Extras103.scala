package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.Tables._

/** 103rd wave — RAKE keyword extraction (the classic unsupervised
  * keyword algorithm the text family lacked) and the left-SEMI
  * stream-stream join (a distinct Structured Streaming join type with
  * its own state-eviction semantics).
  */
object Extras103 {

  /** RAKE stopword list (Rose et al. 2010 use a full English stoplist;
    * this is the high-frequency core — the algorithm's structure, not
    * the list, is what's under test). Shared by both engines.
    */
  val RakeStops = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "for", "on", "with", "as", "by", "at", "it",
    "that", "this", "be", "from")

  /** Max words per candidate phrase — RAKE's standard cap against
    * degenerate stopword-free runs.
    */
  val RakeMaxPhrase = 4

  /** text_keyword_rake — RAKE keyword extraction (Rapid Automatic
    * Keyword Extraction, Rose et al. 2010): candidate phrases are
    * maximal runs of non-stopword tokens; each word scores
    * degree/frequency over all candidate occurrences; a phrase scores
    * the sum of its member word scores; top-15 by score. Engineering
    * choices for a distributed, oracle-exact build: (1) phrase
    * segmentation is pure RELATIONAL gaps-and-islands (pos −
    * row_number over non-stop tokens, per doc) instead of a
    * stopword-alternation regex — Java and RE2 regex dialects never
    * enter the semantics; (2) word scores are FIXED-POINT integers
    * ((degree·10⁶) div freq), so phrase scores are order-free integer
    * sums — no float summation order anywhere; (3) punctuation strips
    * per-token with the dialect-safe class [^a-z0-9]; (4) English
    * docs only (CJK has no whitespace tokens for this algorithm).
    * Scale: one per-doc window (bounded partitions), then
    * hash-bucketed group-bys on words/phrases — no pairwise anything;
    * the top-15 is a global rank over O(distinct phrases).
    */
  def textKeywordRake(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).filter(col("lang") === "en")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"),
        regexp_replace(col("raw"), "[^a-z0-9]", "").as("w"))
    val ns = toks
      .filter(col("w") =!= "" && !col("w").isin(RakeStops: _*))
      .withColumn("grp",
        col("pos") - row_number().over(
          Window.partitionBy("doc_id").orderBy("pos")))
    val phrases = ns.groupBy("doc_id", "grp")
      .agg(array_join(expr(
          "transform(sort_array(collect_list(struct(pos, w))), x -> x.w)"),
          " ").as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= RakeMaxPhrase)
      .select("phrase", "plen")
      .localCheckpoint(true) // 3 consumers: word stats, occ counts, uniq
    val ws = phrases
      .select(col("plen"), explode(split(col("phrase"), " ")).as("wd"))
      .groupBy("wd")
      .agg(expr("(sum(plen) * 1000000L) div count(1)").as("smu"))
    val occ = phrases.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
    val psc = phrases.select("phrase").distinct()
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("wd"))
      .join(ws, "wd")
      .groupBy("phrase").agg(sum(col("smu")).as("score_mu"))
    psc.join(occ, "phrase")
      .orderBy(col("score_mu").desc, col("phrase").asc)
      .limit(15)
      .select("phrase", "n_occ", "score_mu")
  }
  val textKeywordRakeSql: String = {
    val stops = RakeStops.map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tl
       |  FROM documents WHERE lang = 'en'),
       |toks AS (
       |  SELECT doc_id, pos, regexp_replace(tl[pos], '[^a-z0-9]', '', 'g') AS w
       |  FROM (SELECT doc_id, tl,
       |          unnest(generate_series(1, len(tl))) AS pos FROM docs)),
       |ns AS (
       |  SELECT doc_id, pos, w,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM toks WHERE w <> '' AND w NOT IN ($stops)),
       |phrases AS (
       |  SELECT phrase, plen FROM (
       |    SELECT string_agg(w, ' ' ORDER BY pos) AS phrase,
       |      CAST(count(*) AS BIGINT) AS plen
       |    FROM ns GROUP BY doc_id, grp) x
       |  WHERE plen <= $RakeMaxPhrase),
       |ws AS (
       |  SELECT wd, (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS smu
       |  FROM (SELECT plen, unnest(string_split(phrase, ' ')) AS wd
       |        FROM phrases) pw
       |  GROUP BY wd),
       |occ AS (
       |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ
       |  FROM phrases GROUP BY phrase),
       |psc AS (
       |  SELECT uw.phrase, CAST(sum(ws.smu) AS BIGINT) AS score_mu
       |  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS wd
       |        FROM (SELECT DISTINCT phrase FROM phrases) u) uw
       |  JOIN ws USING (wd)
       |  GROUP BY uw.phrase)
       |SELECT p.phrase, o.n_occ, p.score_mu
       |FROM psc p JOIN occ o USING (phrase)
       |ORDER BY score_mu DESC, phrase ASC LIMIT 15""".stripMargin
  }

  /** stream_stream_left_semi — purchases with AT LEAST ONE view by the
    * same user in the preceding hour, as a watermarked stream-stream
    * LEFT SEMI join. Distinct from the inner join (B-family
    * stream_stream_join): semi emits each left row AT MOST ONCE and
    * keeps NO right-side output columns, so the right state exists
    * only to answer existence — the state-eviction semantics Spark
    * ships specifically for this join type. Same watermark/time-bound
    * requirements as the inner join; the 1h bound + 2h watermark keep
    * per-user state O(window), not O(stream). Oracle: the batch EXISTS
    * formulation.
    */
  def streamStreamLeftSemi(s: SparkSession, d: String): DataFrame = {
    val sch = Streaming.rawSchema(s, d)
    val dir = Streaming.stageDir(s, d, copies = 1, sentinels = false)
    def side(tpe: String, prefix: String): DataFrame =
      s.readStream.schema(sch).parquet(dir)
        .withColumn("ets", col("ts").cast("timestamp"))
        .filter(col("event_type") === tpe)
        .select(
          col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          col("ets").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "2 hours")
    val joined = side("purchase", "p").join(
      side("view", "v"),
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"),
      "left_semi")
    Streaming.runToBatch(s, joined, "append")
      .select(col("p_id"), col("p_user"),
        col("p_ts").cast(TimestampNTZType).as("p_ts"))
      .orderBy("p_id")
  }
  val streamStreamLeftSemiSql: String =
    """SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts
      |FROM events p
      |WHERE p.event_type = 'purchase' AND EXISTS (
      |  SELECT 1 FROM events v
      |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
      |    AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts)
      |ORDER BY p_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_keyword_rake" -> (textKeywordRake _),
    "stream_stream_left_semi" -> (streamStreamLeftSemi _))

  val oracle: Map[String, String] = Map(
    "text_keyword_rake" -> textKeywordRakeSql,
    "stream_stream_left_semi" -> streamStreamLeftSemiSql)
}
