package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighth wave of coverage operators: URL canonicalization dedup,
  * schema-drift unions, normalize-then-hash dedup, and an
  * optimizer-behavior exhibit (filter pushdown through a window) —
  * each with a DuckDB oracle.
  */
object Extras8 {

  /** dedup_url_canonicalize — web-corpus URL canonicalization: messy
    * variants (upper-case hosts, utm_* tracking params, unsorted query
    * strings) are synthesized deterministically from document columns,
    * then canonicalized — lower-case host, tracking params dropped,
    * remaining params sorted — entirely with codegen'd string/array
    * expressions (no UDF). Grouping by the canonical form recovers
    * exactly one cluster per underlying document set; the census
    * output proves which variants collapsed. This normalize-before-
    * hash step is the first stage of every crawl dedup at 100 TB —
    * row-local, so it rides the scan with zero extra shuffles.
    */
  def dedupUrlCanonicalize(s: SparkSession, d: String): DataFrame = {
    val host = when(col("doc_id") % 3 === 0,
      concat(upper(col("source")), lit(".EXAMPLE.COM")))
      .otherwise(concat(col("source"), lit(".example.com")))
    val params = when(col("doc_id") % 5 === 0,
      concat(lit("utm_source=feed&lang="), col("lang"), lit("&v=2")))
      .otherwise(concat(lit("v=2&lang="), col("lang")))
    documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        concat(lit("https://"), host, lit("/d/"),
          (col("doc_id") % 100).cast("string"), lit("?"), params).as("url"))
      .select(col("doc_id"), col("url"),
        concat(lower(expr("parse_url(url, 'HOST')")),
          expr("parse_url(url, 'PATH')"), lit("?"),
          concat_ws("&", array_sort(filter(
            split(expr("parse_url(url, 'QUERY')"), "&"),
            p => !p.startsWith("utm_"))))).as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
      .orderBy("canonical")
  }
  val dedupUrlCanonicalizeSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    lower(source) || '.example.com' || '/d/' ||
      |      CAST(doc_id % 100 AS VARCHAR) || '?' ||
      |      array_to_string(list_sort(list_filter(
      |        string_split(CASE WHEN doc_id % 5 = 0
      |          THEN 'utm_source=feed&lang=' || lang || '&v=2'
      |          ELSE 'v=2&lang=' || lang END, '&'),
      |        p -> NOT starts_with(p, 'utm_'))), '&') AS canonical
      |  FROM documents)
      |SELECT canonical, count(*) AS n_variants, min(doc_id) AS first_doc
      |FROM u GROUP BY canonical ORDER BY canonical""".stripMargin

  /** set_union_by_name — schema-drift union: two projections with
    * different column sets and orders combined with
    * `unionByName(allowMissingColumns = true)` — matching by NAME
    * (position-blind), null-backfilling what either side lacks: the
    * append contract when producers evolve independently (the DSv2
    * sibling of C74's mergeSchema-on-read). Row-local; the oracle is
    * DuckDB's `UNION ALL BY NAME`.
    */
  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val v1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val v2 = o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderpriority"), col("o_orderkey")) // different set + order
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }
  val setUnionByNameSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |       CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL BY NAME
      |SELECT o_orderkey, o_orderpriority,
      |       CAST(NULL AS VARCHAR) AS o_orderstatus,
      |       CAST(NULL AS DOUBLE) AS o_totalprice
      |FROM orders WHERE o_orderkey % 2 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** dedup_normalized_hash — normalize-then-hash exact dedup (the
    * production form of B40): lower-case, strip punctuation, squash
    * whitespace, THEN fingerprint — so trivially-reformatted copies
    * collapse to one hash where raw md5 would not. The synthetic
    * variants (upper-cased text for half the docs, doubled spaces for
    * a third) are planted deterministically; the census shows every
    * planted variant collapsing onto its original's hash. All
    * row-local regex/codegen work + one count-distinct-style shuffle.
    */
  def dedupNormalizedHash(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
    val variants = doc.select(col("doc_id") + 1000000L as "doc_id",
      when(col("doc_id") % 2 === 0, upper(col("text")))
        .otherwise(regexp_replace(col("text"), " ", "  ")).as("text"))
    doc.select(col("doc_id"), col("text")).unionByName(variants)
      .select(col("doc_id"),
        md5(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", ""), " +", " ")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc"))
      .groupBy("n_copies")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_copies")
  }
  val dedupNormalizedHashSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    CASE WHEN doc_id % 2 = 0 THEN upper(text)
      |         ELSE regexp_replace(text, ' ', '  ', 'g') END
      |  FROM documents),
      |hashed AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS h
      |  FROM all_docs),
      |clusters AS (
      |  SELECT h, count(*) AS n_copies, min(doc_id) AS canonical_doc
      |  FROM hashed GROUP BY h)
      |SELECT n_copies, count(*) AS n_clusters
      |FROM clusters GROUP BY n_copies ORDER BY n_copies""".stripMargin

  /** win_partition_filter_pushdown — an optimizer-behavior exhibit:
    * a filter on the window's PARTITION key written ABOVE the window
    * is pushed by Catalyst below it, all the way into the parquet scan
    * (PlanSpec asserts the PushedFilter) — legal precisely because a
    * window never mixes rows across partition keys. The difference at
    * 100 TB is windowing 2% of the table instead of all of it and
    * filtering after. Filters on non-partition columns must NOT push
    * (they would change frame contents) — Catalyst's discrimination,
    * not ours, but the exhibit pins it.
    */
  def winPartitionFilterPushdown(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        row_number().over(w).cast("long").as("seq"))
      .filter(col("user_id") < 20) // written above the window; planned below it
      .orderBy("event_id")
  }
  val winPartitionFilterPushdownSql: String =
    """SELECT event_id, user_id, ts,
      |  CAST(row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts ASC, event_id ASC) AS BIGINT) AS seq
      |FROM events WHERE user_id < 20
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_url_canonicalize" -> (dedupUrlCanonicalize _),
    "set_union_by_name" -> (setUnionByName _),
    "dedup_normalized_hash" -> (dedupNormalizedHash _),
    "win_partition_filter_pushdown" -> (winPartitionFilterPushdown _),
  )

  val oracle: Map[String, String] = Map(
    "dedup_url_canonicalize" -> dedupUrlCanonicalizeSql,
    "set_union_by_name" -> setUnionByNameSql,
    "dedup_normalized_hash" -> dedupNormalizedHashSql,
    "win_partition_filter_pushdown" -> winPartitionFilterPushdownSql,
  )
}
