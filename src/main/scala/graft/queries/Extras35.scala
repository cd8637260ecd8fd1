package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.Tables._

/** Thirty-fifth wave: hidden file-metadata columns, dynamic-gap
  * sessions, the dataset-card report, the ocean-color matchup join,
  * and composed typed aggregators.
  */
object Extras35 {

  /** scan_file_metadata — the hidden `_metadata` struct every file
    * source exposes (file_name / file_path / file_size /
    * file_modification_time): the lineage columns an ingest pipeline
    * stamps into bronze tables so every row can be traced to its
    * source file without a join. Constant-folded per file by the
    * scan (no per-row cost); the census proves name + per-file row
    * accounting and that the size column is populated.
    */
  def scanFileMetadata(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/lineitem.parquet")
      .select(col("_metadata.file_name").as("file_name"),
        (col("_metadata.file_size") > 0).as("has_size"))
      .groupBy("file_name", "has_size")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("file_name")
  val scanFileMetadataSql: String =
    """SELECT 'lineitem.parquet' AS file_name, CAST(1 AS BOOLEAN) AS has_size,
      |  count(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** win_session_dynamic_gap — `session_window` with a PER-EVENT gap
    * expression (purchases hold a session open 60 minutes, everything
    * else 20): the native dynamic-gap sessionizer. Semantically each
    * event contributes the interval [ts, ts+gap) and overlapping
    * intervals merge, so the session END is the running MAX of
    * event-ends — not last-event+gap (a long-gap event early can
    * outlive later short-gap ones), which is exactly what the
    * oracle's islands formulation reproduces. One keyed exchange,
    * merging done by the aggregation — same scale shape as C91.
    */
  def winSessionDynamicGap(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"),
        when(col("event_type") === "purchase", "60 minutes").otherwise("20 minutes")))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").cast(TimestampNTZType).as("sess_start"),
        col("session_window.end").cast(TimestampNTZType).as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")
  val winSessionDynamicGapSql: String =
    s"""WITH g AS (
       |  SELECT user_id, ts, value, event_id,
       |    ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
       |              ELSE INTERVAL 20 MINUTE END AS ev_end
       |  FROM events),
       |marked AS (
       |  SELECT user_id, ts, value, ev_end,
       |    CASE WHEN ts > max(ev_end) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS brk
       |  FROM g),
       |islands AS (
       |  SELECT user_id, ts, value, ev_end,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, brk
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM marked)
       |SELECT user_id, min(ts) AS sess_start, max(ev_end) AS sess_end,
       |  count(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM islands GROUP BY user_id, sess
       |ORDER BY user_id, sess_start""".stripMargin

  /** pipeline_dataset_card — the DATASET CARD report every curated
    * corpus release ships: per (language, source) document counts,
    * byte/token totals, exact per-mille share of the corpus, and mean
    * length — ONE conditional-free aggregation pass over the corpus
    * plus a broadcast of the single grand-total row; integer/exact
    * decimal arithmetic throughout so the card is reproducible on any
    * cluster layout.
    */
  def pipelineDatasetCard(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("lang"), col("source"),
      col("n_chars"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val perCell = base.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("n_chars_total"),
      sum(col("n_tokens")).as("n_tokens_total"))
    val total = perCell.agg(sum(col("n_docs")).as("n_total"))
    perCell.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_chars_total"), col("n_tokens_total"),
        ((col("n_docs") * 1000) / col("n_total")).cast("bigint").as("share_permille"),
        (col("n_chars_total").cast("double") / col("n_docs")).as("avg_chars"))
      .orderBy("lang", "source")
  }
  val pipelineDatasetCardSql: String =
    """WITH cell AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_total
      |  FROM documents GROUP BY lang, source)
      |SELECT lang, source, n_docs, n_chars_total, n_tokens_total,
      |  CAST(n_docs * 1000 // (SELECT sum(n_docs) FROM cell) AS BIGINT) AS share_permille,
      |  CAST(n_chars_total AS DOUBLE) / n_docs AS avg_chars
      |FROM cell ORDER BY lang, source""".stripMargin

  /** ref_matchup_join — the reference domain's core validation
    * operation (SURVEY §2-A: in-situ measurements exist to be matched
    * against satellite pixels): a SPATIO-TEMPORAL tolerance join.
    * In-situ points (purchase events) match satellite observations
    * (view events) within a ±1° box and ±2 days, keeping the
    * temporally NEAREST observation per in-situ point. Scale shape =
    * C138's grid-cell equi-join: satellite obs bin once into 1° cells,
    * each in-situ point probes its 3×3 neighborhood (9 exploded rows —
    * bounded fan-out, no theta join), exact box+time predicates after
    * the equi-join, then one arg-min window. Lon/lat derive from the
    * measured-exact 2-decimal columns (C12's derivation); the time
    * delta is exact integer micros.
    */
  def refMatchupJoin(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d).select(col("event_id"), col("event_type"),
      (col("value") % 360.0 - lit(180.0)).as("lon"),
      ((col("user_id") % 180).cast("double") - lit(90.0)).as("lat"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
    val insitu = g.filter(col("event_type") === "purchase")
      .select(col("event_id").as("i_id"), col("lon").as("i_lon"),
        col("lat").as("i_lat"), col("tus").as("i_tus"))
    val sat = g.filter(col("event_type") === "view")
      .select(col("event_id").as("s_id"), col("lon").as("s_lon"),
        col("lat").as("s_lat"), col("tus").as("s_tus"),
        floor(col("lon")).as("cx"), floor(col("lat")).as("cy"))
    val probes = insitu
      .withColumn("cx", explode(array(floor(col("i_lon")) - 1, floor(col("i_lon")),
        floor(col("i_lon")) + 1)))
      .withColumn("cy", explode(array(floor(col("i_lat")) - 1, floor(col("i_lat")),
        floor(col("i_lat")) + 1)))
    val cand = probes.join(sat, Seq("cx", "cy"))
      .filter(abs(col("i_lon") - col("s_lon")) <= 1.0 &&
        abs(col("i_lat") - col("s_lat")) <= 1.0 &&
        abs(col("i_tus") - col("s_tus")) <= 2L * 86400 * 1000000)
      .select(col("i_id"), col("s_id"),
        abs(col("i_tus") - col("s_tus")).as("dt_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("i_id").orderBy(col("dt_us"), col("s_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("i_id"), col("s_id"), col("dt_us"))
      .orderBy("i_id")
  }
  val refMatchupJoinSql: String =
    """WITH g AS (
      |  SELECT event_id, event_type,
      |    value % 360.0 - 180.0 AS lon,
      |    CAST(user_id % 180 AS DOUBLE) - 90.0 AS lat,
      |    epoch_us(ts) AS tus
      |  FROM events),
      |cand AS (
      |  SELECT i.event_id AS i_id, s.event_id AS s_id,
      |    abs(i.tus - s.tus) AS dt_us
      |  FROM g i JOIN g s
      |    ON i.event_type = 'purchase' AND s.event_type = 'view'
      |   AND abs(i.lon - s.lon) <= 1.0 AND abs(i.lat - s.lat) <= 1.0
      |   AND abs(i.tus - s.tus) <= CAST(172800000000 AS BIGINT)),
      |ranked AS (
      |  SELECT i_id, s_id, dt_us,
      |    row_number() OVER (PARTITION BY i_id ORDER BY dt_us, s_id) AS rn
      |  FROM cand)
      |SELECT i_id, s_id, dt_us FROM ranked WHERE rn = 1 ORDER BY i_id""".stripMargin

  /** Exact-cents money sum as a typed Aggregator (2-decimal doubles →
    * integer cents — order-independent long adds).
    */
  private object CentsSum extends Aggregator[(Long, Double, String), Long, Long] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: Long = 0L
    def reduce(acc: Long, x: (Long, Double, String)): Long = acc + Math.round(x._2 * 100)
    def merge(a: Long, b: Long): Long = a + b
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Max order key seen — proves a second independent buffer rides the
    * same shuffle.
    */
  private object MaxKey extends Aggregator[(Long, Double, String), Long, Long] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: Long = Long.MinValue
    def reduce(acc: Long, x: (Long, Double, String)): Long = Math.max(acc, x._1)
    def merge(a: Long, b: Long): Long = Math.max(a, b)
    def finish(acc: Long): Long = acc
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** typed_agg_tuple — COMPOSED typed aggregators: two independent
    * `Aggregator`s (exact-cents revenue, max key) evaluate in ONE
    * `KeyValueGroupedDataset.agg` pass — each keeps its own buffer,
    * both partial-aggregate map-side and merge on the single shuffle
    * (C69 proved one typed agg; this proves composition, the typed
    * mirror of multi-column `agg(...)`). Cents are exact longs, so the
    * result is shuffle-order independent by construction.
    */
  def typedAggTuple(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .as[(Long, Double, String)]
      .groupByKey(_._3)
      .agg(CentsSum.toColumn, MaxKey.toColumn)
      .toDF("o_orderpriority", "revenue_cents", "max_orderkey")
      .orderBy("o_orderpriority")
  }
  val typedAggTupleSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  max(o_orderkey) AS max_orderkey
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_file_metadata" -> (scanFileMetadata _),
    "win_session_dynamic_gap" -> (winSessionDynamicGap _),
    "pipeline_dataset_card" -> (pipelineDatasetCard _),
    "ref_matchup_join" -> (refMatchupJoin _),
    "typed_agg_tuple" -> (typedAggTuple _))

  val oracle: Map[String, String] = Map(
    "scan_file_metadata" -> scanFileMetadataSql,
    "win_session_dynamic_gap" -> winSessionDynamicGapSql,
    "pipeline_dataset_card" -> pipelineDatasetCardSql,
    "ref_matchup_join" -> refMatchupJoinSql,
    "typed_agg_tuple" -> typedAggTupleSql)
}
