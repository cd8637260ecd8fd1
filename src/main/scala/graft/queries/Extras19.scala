package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Nineteenth wave of coverage operators: weighted moving averages,
  * Gini concentration, z-score outlier windows, and train/eval
  * decontamination — each with a DuckDB oracle.
  */
object Extras19 {

  /** win_weighted_ma — linearly-weighted moving average (5-point WMA,
    * the lag-chain form): weights 5..1 over the current and four prior
    * same-user events. Lag products stay EXACT decimals (2-dp × int),
    * the sum is exact, and the single division by the constant weight
    * total is one IEEE op — so unlike a float accumulation the WMA is
    * bit-stable. Rows without a full 5-event history emit NULL (never
    * a silently-shorter window). One window shuffle on user_id.
    */
  def winWeightedMa(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    def l(n: Int) = lag(dec(col("value")), n).over(w)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("wma",
        ((dec(col("value")) * 5 + l(1) * 4 + l(2) * 3 + l(3) * 2 + l(4) * 1)
          .cast("double") / 15.0))
      .select("event_id", "user_id", "value", "wma")
      .orderBy("event_id")
  }
  val winWeightedMaSql: String = {
    val v = "CAST(value AS DECIMAL(14,2))"
    def l(n: Int) = s"lag($v, $n) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"
    s"""SELECT event_id, user_id, value,
       |  CAST($v * 5 + ${l(1)} * 4 + ${l(2)} * 3 + ${l(3)} * 2 + ${l(4)} * 1
       |    AS DOUBLE) / 15.0 AS wma
       |FROM events ORDER BY event_id""".stripMargin
  }

  /** agg_gini_index — Gini concentration of order value per priority
    * (the revenue-concentration / inequality staple): with values
    * ranked ascending on a UNIQUE (value, key) order,
    * G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. Σ(i·xᵢ) and Σx are exact
    * (decimal × int rank), n is an int — the closed form runs in one
    * fixed IEEE sequence. The rank window and the final aggregation
    * share one shuffle on the group key.
    */
  def aggGiniIndex(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    orders(s, d)
      .select(col("o_orderpriority"), dec(col("o_totalprice")).as("x"),
        row_number().over(w).cast("long").as("i"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x") * col("i")).cast("double").as("six"),
        sum(col("x")).cast("double").as("sx"))
      .select(col("o_orderpriority"), col("n").cast("long").as("n"),
        round(lit(2d) * col("six") / (col("n") * col("sx")) -
          (col("n") + 1d) / col("n"), 8).as("gini"))
      .orderBy("o_orderpriority")
  }
  val aggGiniIndexSql: String =
    """SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
      |  round(2 * six / (n * sx) - (n + 1) / n, 8) AS gini
      |FROM (
      |  SELECT o_orderpriority, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(x * i) AS DOUBLE) AS six, CAST(sum(x) AS DOUBLE) AS sx
      |  FROM (
      |    SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(14,2)) AS x,
      |      CAST(row_number() OVER (PARTITION BY o_orderpriority
      |        ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS i
      |    FROM orders) r
      |  GROUP BY o_orderpriority) m
      |ORDER BY o_orderpriority""".stripMargin

  /** win_zscore_outliers — per-row z-scores from exact group moments
    * (the anomaly-detection enrich shape): group mean/variance come
    * from exact decimal window sums over the full partition (C30's
    * algebra as WINDOW aggregates — each row learns its group's
    * moments without collapsing rows), then each row runs one
    * identical IEEE sequence for z = (x−μ)/σ. The census counts
    * |z| > 2 outliers per group; both windows share one shuffle.
    */
  def winZscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(dec(col("value"))).over(w).cast("double")
    val sxx = sum(dec(col("value")) * dec(col("value"))).over(w).cast("double")
    events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - sx / n) /
          sqrt((n * sxx - sx * sx) / (n * n)), 6).as("z"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("z")) > 2, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy("event_type")
  }
  val winZscoreOutliersSql: String = {
    val v = "CAST(value AS DECIMAL(14,2))"
    s"""WITH zz AS (
       |  SELECT event_type,
       |    round((value - sx / n) / sqrt((n * sxx - sx * sx) / (n * n)), 6) AS z
       |  FROM (
       |    SELECT event_type, value,
       |      CAST(count(*) OVER w AS DOUBLE) AS n,
       |      CAST(sum($v) OVER w AS DOUBLE) AS sx,
       |      CAST(sum($v * $v) OVER w AS DOUBLE) AS sxx
       |    FROM events
       |    WINDOW w AS (PARTITION BY event_type)) t)
       |SELECT event_type, count(*) AS n,
       |  CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  round(max(abs(z)), 6) AS max_abs_z
       |FROM zz GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** pipeline_decontaminate — train/eval contamination detection (the
    * eval-integrity step every training pipeline needs): the corpus is
    * doubled with normalized-variant copies (C110's planting — case
    * and whitespace mutations), split 80/20 by the C38 md5-hash rule,
    * then eval docs whose NORMALIZED fingerprint also appears in train
    * are flagged via a fingerprint semi-join — catching exactly the
    * near-copies a raw-text join would miss. One shuffle on the
    * fingerprint; the census output is reshuffle-stable because both
    * the split and the fingerprint are content-derived.
    */
  def pipelineDecontaminate(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
    val variants = doc.select((col("doc_id") + 1000000L).as("doc_id"),
      when(col("doc_id") % 2 === 0, upper(col("text")))
        .otherwise(regexp_replace(col("text"), " ", "  ")).as("text"))
    val all = doc.select(col("doc_id"), col("text")).unionByName(variants)
      .select(col("doc_id"),
        md5(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", ""), " +", " ")).as("fp"),
        // C38's proven ~80/20 hash split: md5-prefix < "cd" → train
        (substring(md5(col("doc_id").cast("string")), 1, 2) >= "cd").as("is_eval"))
    val train = all.filter(!col("is_eval")).select(col("fp")).distinct()
    val eval_ = all.filter(col("is_eval"))
    val contaminated = eval_.join(train, Seq("fp"), "left_semi")
    eval_.agg(count(lit(1)).as("n_eval"))
      .crossJoin(contaminated.agg(count(lit(1)).as("n_contaminated")))
      .select(col("n_eval"), col("n_contaminated"),
        (col("n_eval") - col("n_contaminated")).as("n_clean"))
  }
  val pipelineDecontaminateSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    CASE WHEN doc_id % 2 = 0 THEN upper(text)
      |         ELSE regexp_replace(text, ' ', '  ', 'g') END
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fp,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'cd' AS is_eval
      |  FROM all_docs),
      |train AS (SELECT DISTINCT fp FROM fp WHERE NOT is_eval),
      |ev AS (SELECT * FROM fp WHERE is_eval)
      |SELECT
      |  (SELECT count(*) FROM ev) AS n_eval,
      |  (SELECT count(*) FROM ev WHERE fp IN (SELECT fp FROM train))
      |    AS n_contaminated,
      |  (SELECT count(*) FROM ev) -
      |  (SELECT count(*) FROM ev WHERE fp IN (SELECT fp FROM train))
      |    AS n_clean""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_weighted_ma" -> (winWeightedMa _),
    "agg_gini_index" -> (aggGiniIndex _),
    "win_zscore_outliers" -> (winZscoreOutliers _),
    "pipeline_decontaminate" -> (pipelineDecontaminate _),
  )

  val oracle: Map[String, String] = Map(
    "win_weighted_ma" -> winWeightedMaSql,
    "agg_gini_index" -> aggGiniIndexSql,
    "win_zscore_outliers" -> winZscoreOutliersSql,
    "pipeline_decontaminate" -> pipelineDecontaminateSql,
  )
}
