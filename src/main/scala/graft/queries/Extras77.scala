package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-seventh wave: inter-event gap percentiles, a snapshot diff
  * primitive, and Unicode NFC normalization for the text pipeline.
  */
object Extras77 {

  /** time_gap_percentiles — the inter-arrival-time distribution per
    * event stream (the SLO/heartbeat profile: is the p99 gap within
    * budget?): gaps in EXACT microseconds via lag over (user, ts)
    * windows — partitioned by user, parallel across users — then
    * per-stream p50/p90/p99 by percentile_disc ELEMENT selection
    * (exact longs, no interpolation). Scale: one window pass + one
    * keyed aggregate; state O(streams) in the final frame.
    */
  def timeGapPercentiles(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("gap_us", col("us")
        - lag(col("us"), 1).over(Window.partitionBy("user_id")
          .orderBy("us", "event_id")))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p50_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p90_us"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p99_us"),
        max(col("gap_us")).as("max_us"))
      .orderBy("event_type")
  }
  val timeGapPercentilesSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |      AS gap_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS p50_us,
      |  percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us) AS p90_us,
      |  percentile_disc(0.99) WITHIN GROUP (ORDER BY gap_us) AS p99_us,
      |  max(gap_us) AS max_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** table_snapshot_diff — the row-level DIFF between two table
    * snapshots (the data-diff tool run before promoting a corpus
    * version): v2 derives from v1 by deterministic deletes (id%11),
    * text edits (id%7), lang edits (id%13) and inserts (id%17 →
    * shifted ids); ONE full-outer join on the key classifies every
    * row added / removed / changed / same and counts which columns
    * changed. Scale: a single keyed shuffle join — never a collect;
    * column comparison is row-local.
    */
  def tableSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    val base = v1.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, upper(col("text")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 13 === 0, lit("xx"))
          .otherwise(col("lang")).as("lang"))
    val inserts = v1.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"))
    val v2 = base.unionAll(inserts)
    val j = v1.select(col("doc_id"), col("text").as("t1"),
        col("lang").as("l1"))
      .join(v2.select(col("doc_id"), col("text").as("t2"),
        col("lang").as("l2")), Seq("doc_id"), "full_outer")
    j.agg(
      sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_v1"),
      sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_v2"),
      sum(when(col("t1").isNull && col("t2").isNotNull, 1L).otherwise(0L))
        .as("n_added"),
      sum(when(col("t1").isNotNull && col("t2").isNull, 1L).otherwise(0L))
        .as("n_removed"),
      sum(when(col("t1").isNotNull && col("t2").isNotNull
          && (col("t1") =!= col("t2") || col("l1") =!= col("l2")), 1L)
        .otherwise(0L)).as("n_changed"),
      sum(when(col("t1").isNotNull && col("t2").isNotNull
          && col("t1") === col("t2") && col("l1") === col("l2"), 1L)
        .otherwise(0L)).as("n_same"),
      sum(when(col("t1").isNotNull && col("t2").isNotNull
          && col("t1") =!= col("t2"), 1L).otherwise(0L)).as("chg_text"),
      sum(when(col("l1").isNotNull && col("l2").isNotNull
          && col("l1") =!= col("l2"), 1L).otherwise(0L)).as("chg_lang"))
  }
  val tableSnapshotDiffSql: String =
    """WITH v1 AS (SELECT doc_id, text, lang FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text,
      |    CASE WHEN doc_id % 13 = 0 THEN 'xx' ELSE lang END AS lang
      |  FROM v1 WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang FROM v1 WHERE doc_id % 17 = 0),
      |j AS (
      |  SELECT v1.text AS t1, v1.lang AS l1, v2.text AS t2, v2.lang AS l2
      |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      |SELECT
      |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_v1,
      |  CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_v2,
      |  CAST(sum(CASE WHEN t1 IS NULL AND t2 IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
      |    AND (t1 <> t2 OR l1 <> l2) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL
      |    AND t1 = t2 AND l1 = l2 THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
      |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 <> t2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS chg_text,
      |  CAST(sum(CASE WHEN l1 IS NOT NULL AND l2 IS NOT NULL AND l1 <> l2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS chg_lang
      |FROM j""".stripMargin

  /** text_unicode_nfc — Unicode NFC normalization for the cleaning
    * pipeline (web text mixes precomposed and combining-mark forms;
    * dedup and tokenization need ONE canonical form): each doc gets a
    * deterministic combining-mark suffix (e+U+0301, A+U+030A), NFC
    * composes them to é/Å. Spark has no native normalizer so this is
    * the documented scalar-UDF path (`java.text.Normalizer` —
    * row-local, fused into the scan stage; the one non-codegen island
    * in the text family). Census: code-unit lengths before/after and
    * how many rows shrank.
    */
  def textUnicodeNfc(s: SparkSession, d: String): DataFrame = {
    val nfc = udf((t: String) =>
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
    documents(s, d)
      .select(col("doc_id"),
        concat(substring(col("text"), 1, 40), lit("e\u0301A\u030A"))
          .as("raw"))
      .withColumn("norm", nfc(col("raw")))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("raw"))).as("len_raw"),
        sum(length(col("norm"))).as("len_nfc"),
        sum(when(length(col("norm")) < length(col("raw")), 1L)
          .otherwise(0L)).as("n_shrunk"))
  }
  val textUnicodeNfcSql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    substr(text, 1, 40) || 'e' || chr(769) || 'A' || chr(778) AS raw
      |  FROM documents)
      |SELECT count(*) AS n_docs,
      |  CAST(sum(length(raw)) AS BIGINT) AS len_raw,
      |  CAST(sum(length(nfc_normalize(raw))) AS BIGINT) AS len_nfc,
      |  CAST(sum(CASE WHEN length(nfc_normalize(raw)) < length(raw)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_shrunk
      |FROM r""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_gap_percentiles" -> (timeGapPercentiles _),
    "table_snapshot_diff" -> (tableSnapshotDiff _),
    "text_unicode_nfc" -> (textUnicodeNfc _))

  val oracle: Map[String, String] = Map(
    "time_gap_percentiles" -> timeGapPercentilesSql,
    "table_snapshot_diff" -> tableSnapshotDiffSql,
    "text_unicode_nfc" -> textUnicodeNfcSql)
}
