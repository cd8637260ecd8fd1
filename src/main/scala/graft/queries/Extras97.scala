package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninety-seventh wave: distinct ordered listagg, Flesch–Kincaid
  * readability, and bipartite graph projection.
  */
object Extras97 {

  /** agg_listagg_distinct — LISTAGG(DISTINCT … ORDER BY …), the
    * dedup-and-order string aggregation DuckDB runs natively: Spark
    * composes it from collect_set (partial-aggregable, dedups
    * map-side) + sort_array + concat_ws — same result, and the
    * distinct set bounds the string, not the row count.
    */
  def aggListaggDistinct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"))
      .orderBy("o_orderpriority")
  val aggListaggDistinctSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
      |    AS statuses
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** text_readability_fk — Flesch reading-ease over the corpus:
    * words/sentences/syllable-proxy (vowel runs) are row-local regex
    * counts riding the scan, the per-document score QUANTIZES to an
    * exact integer (×10⁴) before aggregation so the per-language mean
    * is shuffle-order independent — the rule every IEEE-per-row +
    * aggregate shape in this engine follows.
    */
  def textReadabilityFk(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        greatest(size(split(trim(col("text")), "\\s+")), lit(1))
          .cast("long").as("words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast("long").as("sents"),
        greatest(size(expr(
          "regexp_extract_all(lower(text), '[aeiouy]+', 0)")), lit(1))
          .cast("long").as("sylls"))
      .withColumn("score_q",
        floor((lit(206.835d)
          - lit(1.015d) * (col("words").cast("double")
            / col("sents").cast("double"))
          - lit(84.6d) * (col("sylls").cast("double")
            / col("words").cast("double"))) * 10000.0d).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score_q")).cast("double") / 10000.0d
          / count(lit(1)).cast("double"), 6).as("mean_flesch"),
        round(min(col("score_q")).cast("double") / 10000.0d, 4).as("min_flesch"),
        round(max(col("score_q")).cast("double") / 10000.0d, 4).as("max_flesch"))
      .orderBy("lang")
  val textReadabilityFkSql: String =
    """WITH x AS (
      |  SELECT lang,
      |    CAST(floor((206.835
      |      - 1.015 * (CAST(greatest(len(string_split_regex(trim(text),
      |          '\s+')), 1) AS DOUBLE)
      |        / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
      |          AS DOUBLE))
      |      - 84.6 * (CAST(greatest(len(regexp_extract_all(lower(text),
      |          '[aeiouy]+')), 1) AS DOUBLE)
      |        / CAST(greatest(len(string_split_regex(trim(text), '\s+')), 1)
      |          AS DOUBLE))) * 10000.0) AS BIGINT) AS score_q
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  round(CAST(sum(score_q) AS DOUBLE) / 10000.0 / count(*), 6)
      |    AS mean_flesch,
      |  round(CAST(min(score_q) AS DOUBLE) / 10000.0, 4) AS min_flesch,
      |  round(CAST(max(score_q) AS DOUBLE) / 10000.0, 4) AS max_flesch
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** graph_bipartite_projection — project the supplier↔customer
    * bipartite graph onto suppliers (edge weight = shared customers):
    * the projection pairs come from a self-join KEYED BY CUSTOMER
    * (bounded by Σ deg² per customer, never |edges|²), weights
    * partial-aggregate per pair, and the top-20 cut rides the exact
    * (weight, pair) key. The bipartite edge list distincts once.
    * Per-customer emission is bounded by [[Extras63.GraphHubCap]] (see
    * its recall statement; a no-op on this corpus, the Σ deg² guard at
    * web scale) — the window count shares the self-join's hash
    * partitioning, so the cap costs no extra shuffle.
    */
  def graphBipartiteProjection(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val capped = edges
      .withColumn("cdeg", count(lit(1)).over(Window.partitionBy("ck")))
      .filter(col("cdeg") <= Extras63.GraphHubCap).drop("cdeg")
    capped.select(col("ck"), col("sk").as("sa"))
      .join(capped.select(col("ck"), col("sk").as("sb")), "ck")
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("shared_customers"))
      .orderBy(col("shared_customers").desc, col("sa"), col("sb"))
      .limit(20)
  }
  val graphBipartiteProjectionSql: String =
    s"""WITH edges AS (
      |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |ec AS (
      |  SELECT ck, sk FROM (
      |    SELECT ck, sk, count(*) OVER (PARTITION BY ck) AS cdeg
      |    FROM edges)
      |  WHERE cdeg <= ${Extras63.GraphHubCap})
      |SELECT a.sk AS sa, b.sk AS sb, count(*) AS shared_customers
      |FROM ec a JOIN ec b ON a.ck = b.ck AND a.sk < b.sk
      |GROUP BY 1, 2
      |ORDER BY shared_customers DESC, sa, sb LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_listagg_distinct" -> (aggListaggDistinct _),
    "text_readability_fk" -> (textReadabilityFk _),
    "graph_bipartite_projection" -> (graphBipartiteProjection _))

  val oracle: Map[String, String] = Map(
    "agg_listagg_distinct" -> aggListaggDistinctSql,
    "text_readability_fk" -> textReadabilityFkSql,
    "graph_bipartite_projection" -> graphBipartiteProjectionSql)
}
