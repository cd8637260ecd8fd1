package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-ninth wave: Mann–Kendall trend test, Theil's U forecast
  * accuracy, and blocking-scheme evaluation.
  */
object Extras99 {

  /** stat_mann_kendall — the Mann–Kendall monotonic-trend test per
    * stream (hydrology's standard "is it rising" screen): S counts
    * sign agreements over the calendar²-bounded day-pair self-join
    * (C364/C372's shape) with EXACT decimal daily totals, the tie
    * correction aggregates the per-value tie group sizes, and the
    * variance-normalized Z assembles in one IEEE block per stream.
    */
  def statMannKendall(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).as("v"))
    val l = daily.select(col("event_type"), col("day").as("d1"), col("v").as("v1"))
    val r = daily.select(col("event_type"), col("day").as("d2"), col("v").as("v2"))
    val sCount = l.join(r, Seq("event_type")).filter(col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n0"),
        sum(when(col("v2") > col("v1"), 1L)
          .when(col("v2") < col("v1"), -1L).otherwise(0L)).as("s"))
    val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ties = daily.groupBy("event_type", "v").agg(count(lit(1)).as("tg"))
      .filter(col("tg") > 1)
      .groupBy("event_type")
      .agg(sum(col("tg") * (col("tg") - 1) * (lit(2) * col("tg") + 5))
        .as("tie_term"))
    sCount.join(broadcast(nDays), "event_type")
      .join(broadcast(ties), Seq("event_type"), "left")
      .withColumn("tie_term", coalesce(col("tie_term"), lit(0L)))
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
          .cast("double") / 18.0d)
      .select(col("event_type"), col("n"), col("s"),
        round(when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(0.0d), 6).as("z"))
      .orderBy("event_type")
  }
  val statMannKendallSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(14,2))) AS v
      |  FROM events GROUP BY 1, 2),
      |sc AS (
      |  SELECT l.event_type, count(*) AS n0,
      |    CAST(sum(CASE WHEN r.v > l.v THEN 1
      |      WHEN r.v < l.v THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM daily l JOIN daily r
      |    ON l.event_type = r.event_type AND l.day < r.day
      |  GROUP BY 1),
      |nd AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
      |ties AS (
      |  SELECT event_type,
      |    CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, v, count(*) AS tg FROM daily GROUP BY 1, 2)
      |  WHERE tg > 1 GROUP BY 1),
      |x AS (
      |  SELECT sc.event_type, n, s,
      |    CAST(n * (n - 1) * (2 * n + 5)
      |      - coalesce(tie_term, 0) AS DOUBLE) / 18.0 AS var_s
      |  FROM sc JOIN nd ON sc.event_type = nd.event_type
      |  LEFT JOIN ties ON sc.event_type = ties.event_type)
      |SELECT event_type, n, s,
      |  round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
      |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
      |    ELSE 0.0 END, 6) AS z
      |FROM x ORDER BY event_type""".stripMargin

  /** stat_theil_u — Theil's U₂ accuracy of the naive seasonal
    * (lag-7) forecast of daily revenue: forecast errors and actuals
    * square in EXACT decimal on the O(days) frame, so both sums are
    * order-independent, and U is one final IEEE square root. U < 1
    * means the naive forecast beats a random walk — the baseline
    * every forecasting pipeline must report.
    */
  def statTheilU(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    daily
      .withColumn("f", lag(col("rev"), 7).over(w))
      .filter(col("f").isNotNull)
      .agg(count(lit(1)).as("n_days"),
        sum((col("rev") - col("f")) * (col("rev") - col("f"))).as("sse"),
        sum(col("rev") * col("rev")).as("ssa"))
      .select(col("n_days"),
        round(sqrt(col("sse").cast("double") / col("ssa").cast("double")), 6)
          .as("theil_u"))
  }
  val statTheilUSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |f AS (
      |  SELECT day, rev, lag(rev, 7) OVER (ORDER BY day) AS f FROM daily)
      |SELECT count(*) AS n_days,
      |  round(sqrt(CAST(sum((rev - f) * (rev - f)) AS DOUBLE)
      |    / CAST(sum(rev * rev) AS DOUBLE)), 6) AS theil_u
      |FROM f WHERE f IS NOT NULL""".stripMargin

  /** pipeline_blocking_eval — precision/recall of a cheap BLOCKING
    * key against the true near-dup pairs (the design loop for every
    * dedup blocking scheme): candidates pair within (first-3-words
    * fingerprint, length bucket) blocks — bounded per block, never
    * all-pairs — and the truth is C5's staged n-gram Jaccard pairs
    * (computed once per corpus, shared with the graded C5 row). Hits
    * via one LEFT SEMI join of true pairs into candidates; P/R are
    * two IEEE divisions from exact counts.
    */
  def pipelineBlockingEval(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      md5(concat_ws(" ",
        slice(split(lower(trim(col("text"))), "\\s+"), 1, 3))).as("fp"),
      (length(col("text")) / 64L).cast("long").as("lb"))
    val cand = docs.select(col("fp"), col("lb"), col("doc_id").as("doc_a"))
      .join(docs.select(col("fp"), col("lb"), col("doc_id").as("doc_b")),
        Seq("fp", "lb"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val truth = DedupExtras.dedupNgramJaccard(s, d).select("doc_a", "doc_b")
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nHit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nCand.crossJoin(nTrue).crossJoin(nHit)
      .select(col("n_candidates"), col("n_true"), col("n_hit"),
        round(col("n_hit").cast("double")
          / col("n_candidates").cast("double"), 6).as("precision"),
        round(col("n_hit").cast("double")
          / col("n_true").cast("double"), 6).as("recall"))
  }
  val pipelineBlockingEvalSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
      |  FROM documents),
      |truth AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.6),
      |docs AS (
      |  SELECT doc_id,
      |    md5(array_to_string(
      |      string_split_regex(lower(trim(text)), '\s+')[1:3], ' ')) AS fp,
      |    length(text) // 64 AS lb
      |  FROM documents),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM docs a JOIN docs b
      |    ON a.fp = b.fp AND a.lb = b.lb AND a.doc_id < b.doc_id),
      |c AS (SELECT count(*) AS n_candidates FROM cand),
      |t AS (SELECT count(*) AS n_true FROM truth),
      |h AS (
      |  SELECT count(*) AS n_hit FROM truth
      |  WHERE EXISTS (SELECT 1 FROM cand
      |    WHERE cand.doc_a = truth.doc_a AND cand.doc_b = truth.doc_b))
      |SELECT n_candidates, n_true, n_hit,
      |  round(CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE), 6)
      |    AS precision,
      |  round(CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE), 6) AS recall
      |FROM c, t, h""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_mann_kendall" -> (statMannKendall _),
    "stat_theil_u" -> (statTheilU _),
    "pipeline_blocking_eval" -> (pipelineBlockingEval _))

  val oracle: Map[String, String] = Map(
    "stat_mann_kendall" -> statMannKendallSql,
    "stat_theil_u" -> statTheilUSql,
    "pipeline_blocking_eval" -> pipelineBlockingEvalSql)
}
