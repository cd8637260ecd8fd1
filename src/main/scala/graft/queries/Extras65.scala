package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixty-fifth wave: business-day calendar arithmetic and chunk-level
  * deduplication for RAG corpora.
  */
object Extras65 {

  /** time_business_days — BUSINESS-day span per order (calendar
    * arithmetic every SLA/fulfilment report needs): each order opens a
    * rule-derived service window (1–13 days by orderkey), and the
    * business-day count EXCLUDES weekends — computed by exploding the
    * bounded per-row date sequence (≤ 13 rows per order, row-local,
    * linear — never a calendar-table range join) and testing the ISO
    * weekday. Census per priority: orders, total and mean business
    * days (mean = one division of exact integer sums).
    */
  def timeBusinessDays(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("d0"),
        expr("CAST(o_orderdate AS DATE) + CAST(o_orderkey % 13 + 1 AS INT)").as("d1"))
      .withColumn("bdays", expr(
        """size(filter(sequence(d0, d1), dt -> weekday(dt) < 5))""").cast("long"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("bdays")).as("total_bdays"),
        round(sum(col("bdays")).cast("double") / count(lit(1)), 6).as("mean_bdays"))
      .orderBy("o_orderpriority")
  val timeBusinessDaysSql: String =
    """WITH t AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(o_orderdate AS DATE) AS d0,
      |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 13 + 1 AS INT) AS d1
      |  FROM orders),
      |b AS (
      |  SELECT o_orderpriority,
      |    len(list_filter(generate_series(d0, d1, INTERVAL 1 DAY),
      |      dt -> isodow(dt) <= 5)) AS bdays
      |  FROM t)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(bdays) AS BIGINT) AS total_bdays,
      |  round(CAST(sum(bdays) AS DOUBLE) / count(*), 6) AS mean_bdays
      |FROM b GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** pipeline_chunk_dedup — CHUNK-level exact deduplication (the RAG
    * corpus pass: C128's overlapping chunks, then identical chunks
    * collapse ACROSS documents so the index stores each span once):
    * chunk identity is the exact chunk text, the keeper is the
    * smallest (doc_id, start), and the per-doc report states how many
    * of its chunks survive as canonical — the coverage a retrieval
    * index will actually hold. Chunking is row-local; dedup is one
    * hash group-by on the chunk text; census one more rollup.
    */
  def pipelineChunkDedup(s: SparkSession, d: String): DataFrame = {
    val chunks = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(size(toks), 1), 40)")).as("start"),
        col("toks"))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        expr("concat_ws(' ', slice(toks, start, 50))").as("chunk_text"))
    val keepers = chunks.groupBy("chunk_text")
      .agg(min(struct(col("doc_id"), col("start"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.start").as("start"))
    chunks.select("doc_id", "start")
      .join(keepers.withColumn("kept", lit(true)), Seq("doc_id", "start"), "left_outer")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_canonical"))
      .orderBy("doc_id")
  }
  val pipelineChunkDedupSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |ch AS (
      |  SELECT doc_id, CAST(start AS BIGINT) AS start,
      |    array_to_string(toks[start:least(start + 49, len(toks))], ' ') AS chunk_text
      |  FROM (SELECT doc_id, toks,
      |          unnest(generate_series(1, greatest(len(toks), 1), 40)) AS start
      |        FROM t)),
      |keep AS (
      |  SELECT chunk_text, min(struct_pack(doc_id := doc_id, start := start)) AS k
      |  FROM ch GROUP BY chunk_text)
      |SELECT c.doc_id, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN EXISTS (
      |    SELECT 1 FROM keep WHERE k.doc_id = c.doc_id AND k.start = c.start)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical
      |FROM ch c GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_business_days" -> (timeBusinessDays _),
    "pipeline_chunk_dedup" -> (pipelineChunkDedup _))

  val oracle: Map[String, String] = Map(
    "time_business_days" -> timeBusinessDaysSql,
    "pipeline_chunk_dedup" -> pipelineChunkDedupSql)
}
