package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Ninety-fifth wave: T5 span corruption census, delta-method ratio
  * metrics, and multi-source harmonic centrality.
  */
object Extras95 {

  /** pipeline_span_corruption — the T5/UL2 span-corruption planning
    * census: span count is tokens div 20, each span's length comes
    * from a DETERMINISTIC hash of (doc, span index) — no RNG state,
    * reproducible under any partitioning — and the per-language
    * corruption ratio aggregates exact integers. Spark explodes a
    * DYNAMIC sequence(1, n_spans) (no wasted rows at scale); the
    * oracle uses the bounded-series + filter idiom DuckDB requires.
    */
  def pipelineSpanCorruption(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("n_spans", expr("n_tok div 20"))
    val spans = docs.filter(col("n_spans") > 0)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("n_spans"),
        explode(expr("sequence(1L, n_spans)")).as("i"))
      .withColumn("span_len",
        (col("doc_id") * 31L + col("i") * 7L) % 5L + 1L)
      .groupBy("doc_id")
      .agg(sum(col("span_len")).as("corrupted"))
    docs.join(spans, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_spans")).as("n_spans"),
        sum(coalesce(col("corrupted"), lit(0L))).as("n_corrupted"),
        round(sum(coalesce(col("corrupted"), lit(0L))).cast("double")
          / sum(col("n_tok")).cast("double"), 6).as("corruption_ratio"))
      .orderBy("lang")
  }
  val pipelineSpanCorruptionSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tok,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) // 20
      |      AS n_spans
      |  FROM documents),
      |spans AS (
      |  SELECT doc_id, sum((doc_id * 31 + i * 7) % 5 + 1) AS corrupted
      |  FROM docs, generate_series(1, 1000) AS g(i)
      |  WHERE i <= n_spans GROUP BY 1)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
      |  CAST(sum(coalesce(corrupted, 0)) AS BIGINT) AS n_corrupted,
      |  round(CAST(sum(coalesce(corrupted, 0)) AS DOUBLE)
      |    / CAST(sum(n_tok) AS DOUBLE), 6) AS corruption_ratio
      |FROM docs LEFT JOIN spans USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** stat_ratio_metric_delta — the A/B-testing ratio-metric standard
    * error by the delta method (revenue-per-click is a ratio of two
    * per-user sums, so the naive SE is wrong): per-user numerators and
    * denominators collapse to an O(users) frame with EXACT decimal/
    * integer moments (x², y², xy as decimal products), and R, SE and
    * the CI assemble in one final IEEE block. The fact is read once.
    */
  def statRatioMetricDelta(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", dec(col("value")))
        .otherwise(lit(0).cast(M))).cast(DecimalType(18, 2)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .filter(col("y") > 0)
    val m = u.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y").cast(M)).cast("double").as("sxy"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    m.select(col("n"),
        round(col("sx") / col("sy"), 6).as("ratio"),
        round(sqrt(
          (col("sxx") - lit(2.0d) * (col("sx") / col("sy")) * col("sxy")
            + (col("sx") / col("sy")) * (col("sx") / col("sy")) * col("syy"))
          / (col("sy") * col("sy"))), 6).as("se_delta"))
      .select(col("n"), col("ratio"), col("se_delta"),
        round(col("ratio") - lit(1.959964d) * col("se_delta"), 6).as("ci_lo"),
        round(col("ratio") + lit(1.959964d) * col("se_delta"), 6).as("ci_hi"))
  }
  val statRatioMetricDeltaSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(14,2))
      |      ELSE CAST(0 AS DECIMAL(14,2)) END) AS DECIMAL(18,2)) AS x,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY 1
      |  HAVING sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(x * CAST(y AS DECIMAL(14,2))) AS DOUBLE) AS sxy,
      |    CAST(sum(y * y) AS DOUBLE) AS syy
      |  FROM u),
      |r AS (
      |  SELECT n, round(sx / sy, 6) AS ratio,
      |    round(sqrt((sxx - 2.0 * (sx / sy) * sxy
      |      + (sx / sy) * (sx / sy) * syy) / (sy * sy)), 6) AS se_delta
      |  FROM m)
      |SELECT n, ratio, se_delta,
      |  round(ratio - 1.959964 * se_delta, 6) AS ci_lo,
      |  round(ratio + 1.959964 * se_delta, 6) AS ci_hi
      |FROM r""".stripMargin

  /** graph_harmonic_centrality — harmonic centrality estimated from 4
    * pivot sources via MULTI-SOURCE BFS: the source id rides the
    * frontier as a column, so all four searches share every round's
    * single keyed join (frontier ⋈ edges) + anti-join, eagerly
    * materialized per round (C370's lineage rule). Centrality
    * Σ 1/d(s,v) folds over each vertex's ≤4-element source list,
    * top-20 cut tie-broken by vertex id.
    */
  def graphHarmonicCentrality(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    val sources = users.sparkSession.range(4).toDF("s")
    var visited = sources.select(col("s"), col("s").as("v"), lit(0L).as("lvl"))
      .localCheckpoint(true)
    var frontier = visited.select("s", "v")
    for (k <- 1 to 4) {
      frontier = frontier.join(edges, frontier("v") === edges("src"))
        .select(frontier("s").as("s"), edges("dst").as("v")).distinct()
        .join(visited.select("s", "v"), Seq("s", "v"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionAll(frontier.select(col("s"), col("v"), lit(k.toLong).as("lvl")))
        .localCheckpoint(true)
    }
    visited.filter(col("lvl") > 0)
      .groupBy("v")
      .agg(sort_array(collect_list(struct(col("s"), col("lvl")))).as("sl"))
      .select(col("v"),
        round(expr(
          "aggregate(sl, 0D, (acc, t) -> acc + 1.0D / CAST(t.lvl AS DOUBLE))"),
          6).as("harmonic"))
      .orderBy(col("harmonic").desc, col("v")).limit(20)
  }
  val graphHarmonicCentralitySql: String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM users),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id + 2) % n FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
        |  WHERE src <> dst),
        |v0 AS MATERIALIZED (
        |  SELECT s, s AS v, 0 AS lvl FROM generate_series(0, 3) AS g(s))"""
        .stripMargin
    val rounds = (1 to 4).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT DISTINCT w.s, e.dst AS v
         |  FROM v${k - 1} w JOIN edges e ON w.v = e.src
         |  WHERE w.lvl = ${k - 1}
         |    AND NOT EXISTS (SELECT 1 FROM v${k - 1} p
         |      WHERE p.s = w.s AND p.v = e.dst)),
         |v$k AS MATERIALIZED (
         |  SELECT s, v, lvl FROM v${k - 1}
         |  UNION ALL SELECT s, v, $k AS lvl FROM f$k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds +
      """,
        |fold AS (
        |  SELECT v, list_sort(list(struct_pack(s := s, lvl := lvl))) AS sl
        |  FROM v4 WHERE lvl > 0 GROUP BY 1)
        |SELECT v,
        |  round(list_reduce(list_prepend(0.0, list_transform(sl, t ->
        |    1.0 / CAST(t.lvl AS DOUBLE))), (a, b) -> a + b), 6) AS harmonic
        |FROM fold ORDER BY harmonic DESC, v LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_span_corruption" -> (pipelineSpanCorruption _),
    "stat_ratio_metric_delta" -> (statRatioMetricDelta _),
    "graph_harmonic_centrality" -> (graphHarmonicCentrality _))

  val oracle: Map[String, String] = Map(
    "pipeline_span_corruption" -> pipelineSpanCorruptionSql,
    "stat_ratio_metric_delta" -> statRatioMetricDeltaSql,
    "graph_harmonic_centrality" -> graphHarmonicCentralitySql)
}
