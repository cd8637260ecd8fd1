package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Fifty-third wave: the χ² contingency report, the GeoJSON+keyset half
  * of find_datasets, rolling trend/residual decomposition, the
  * train/eval contamination REPORT, and the Zipf head profile.
  */
object Extras53 {

  /** stat_chi_square — the χ² independence CONTINGENCY REPORT between
    * language and document-length class: observed counts, expected
    * counts under independence (row·col/N) and each cell's χ²
    * contribution. Emitted PER CELL rather than as one scalar, so no
    * cross-row float summation exists anywhere — every number derives
    * from exact integer counts through one fixed IEEE sequence per
    * row, bit-identical in any engine and at any parallelism (the
    * scalar χ² is the sum of a 15-row column the consumer can take).
    * Shape: one count pass, broadcast row/col/grand totals back on —
    * the contingency matrix is |langs|×|buckets| rows at any corpus
    * size.
    */
  def statChiSquare(s: SparkSession, d: String): DataFrame = {
    val b = documents(s, d).select(col("lang"),
      when(col("n_chars") < 150, "S")
        .when(col("n_chars") < 300, "M")
        .otherwise("L").as("bucket"))
    val obs = b.groupBy("lang", "bucket").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("lang").agg(sum("o").as("rt"))
    val colT = obs.groupBy("bucket").agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("n"))
    // cast EACH total to double before the product: rt*ct in int64
    // wraps silently past ~3e9-row corpora (N² scale), while the
    // double product is exact to 2^53 and matches DuckDB bit-for-bit
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n")
    obs.join(broadcast(rowT), "lang")
      .join(broadcast(colT), "bucket")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("bucket"), col("o"),
        round(e, 6).as("expected"),
        round(pow(col("o") - e, 2) / e, 6).as("contrib"))
      .orderBy("lang", "bucket")
  }
  val statChiSquareSql: String =
    """WITH b AS (
      |  SELECT lang, CASE WHEN n_chars < 150 THEN 'S'
      |                    WHEN n_chars < 300 THEN 'M'
      |                    ELSE 'L' END AS bucket
      |  FROM documents),
      |obs AS (SELECT lang, bucket, count(*) AS o FROM b GROUP BY lang, bucket),
      |rt AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY lang),
      |ct AS (SELECT bucket, sum(o) AS ct FROM obs GROUP BY bucket),
      |n AS (SELECT sum(o) AS n FROM obs)
      |SELECT lang, bucket, o,
      |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n, 6) AS expected,
      |  round(pow(o - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n, 2)
      |        / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n), 6) AS contrib
      |FROM obs JOIN rt USING (lang) JOIN ct USING (bucket) CROSS JOIN n
      |ORDER BY lang, bucket""".stripMargin

  /** ref_dataset_query_geojson — the OTHER half of the find_datasets
    * contract beside C289: `geojson=true` output with a KEYSET cursor
    * page (the scale-safe pagination — C33's constant-cost shape, not
    * an offset rank). Same DSL + bbox + status filters compiled into
    * the one plan; the page is a pushed `doc_id > cursor` filter under
    * TakeOrderedAndProject; each hit publishes as a GeoJSON Point
    * feature with coordinates stringified through DECIMAL(7,2) (C35's
    * determinism trick — shortest-repr double printing is
    * engine-specific, fixed-scale decimal printing is not).
    */
  def refDatasetQueryGeojson(s: SparkSession, d: String): DataFrame = {
    // the DSL's 'merge' term rides the inverted index (same rewrite as
    // C289) — this branch's parquet scan never reads the text column
    RefSurface.enableTextIndex(s, d)
    val meta = Extras52.datasetMeta(s, d)
    meta
      .filter(graft.functions.QueryDsl.predicate(
        meta, "merge AND n_chars:[100 TO 450]", Seq("text")))
      .filter(graft.functions.GeoOps.inBbox(col("lon"), col("lat"), -90.0, -60.0, 90.0, 75.0))
      .filter(col("status").isin("PUBLISHED", "VALIDATED"))
      .filter(col("doc_id") > 120) // keyset cursor: resume after id 120
      .orderBy("doc_id").limit(15)
      .select(col("doc_id"),
        concat(
          lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
          col("lon").cast("decimal(7,2)").cast("string"), lit(","),
          col("lat").cast("decimal(7,2)").cast("string"),
          lit("""]},"properties":{"id":"""), col("doc_id"),
          lit(""","status":""""), col("status"), lit("\"}}")).as("feature"))
      .orderBy("doc_id")
  }
  val refDatasetQueryGeojsonSql: String =
    """WITH meta AS (
      |  SELECT doc_id, text, n_chars,
      |    CAST(doc_id * 7919 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
      |    CAST(doc_id * 4409 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
      |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'PUBLISHED' WHEN 1 THEN 'VALIDATED'
      |         WHEN 2 THEN 'SUBMITTED' ELSE 'CANCELED' END AS status
      |  FROM documents),
      |page AS (
      |  SELECT doc_id, lon, lat, status FROM meta
      |  WHERE lower(text) LIKE '%merge%' AND n_chars BETWEEN 100 AND 450
      |    AND lon BETWEEN -90.0 AND 90.0 AND lat BETWEEN -60.0 AND 75.0
      |    AND status IN ('PUBLISHED', 'VALIDATED') AND doc_id > 120
      |  ORDER BY doc_id LIMIT 15)
      |SELECT doc_id,
      |  '{"type":"Feature","geometry":{"type":"Point","coordinates":[' ||
      |  CAST(CAST(lon AS DECIMAL(7,2)) AS VARCHAR) || ',' ||
      |  CAST(CAST(lat AS DECIMAL(7,2)) AS VARCHAR) ||
      |  ']},"properties":{"id":' || doc_id || ',"status":"' || status || '"}}'
      |    AS feature
      |FROM page ORDER BY doc_id""".stripMargin

  /** win_trend_residual — rolling TREND/RESIDUAL decomposition (the
    * time-series QC pass an in-situ archive runs before matchups):
    * per station (user), the centered 7-row rolling mean is the trend
    * and the largest |observation − trend| flags the anomaly
    * candidate. The rolling mean is an exact-decimal window sum over
    * the frame divided by the frame count — one IEEE division per row,
    * shuffle-order independent — and the per-station rollup keeps only
    * order-independent aggregates (count, max), so the report is
    * bit-stable at any parallelism.
    */
  def winTrendResidual(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 3)
    events(s, d).filter(col("event_type") === "click")
      .withColumn("trend",
        sum(dec(col("value"))).over(w).cast("double") / count(lit(1)).over(w))
      .withColumn("resid", abs(col("value") - col("trend")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_obs"), round(max(col("resid")), 6).as("max_abs_resid"))
      .orderBy("user_id")
  }
  val winTrendResidualSql: String =
    """WITH t AS (
      |  SELECT user_id, value,
      |    CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE)
      |      / count(*) OVER w AS trend
      |  FROM events WHERE event_type = 'click'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
      |SELECT user_id, count(*) AS n_obs,
      |  round(max(abs(value - trend)), 6) AS max_abs_resid
      |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin

  /** pipeline_contamination_report — the decontamination AUDIT beside
    * C145's drop pass: using the SAME deterministic train/eval split
    * as C38 (md5 hash rule), report per language how many eval docs
    * share any 3-token shingle with the train split — the
    * leakage-rate number a dataset card publishes. Shape: shingle
    * explosion both sides, distinct train-shingle set, one LeftSemi
    * join keyed on the shingle (never doc×doc), per-lang rollup —
    * exactly the C145 semi-join with the verdict reversed into a
    * report.
    */
  def pipelineContaminationReport(s: SparkSession, d: String): DataFrame = {
    val grams = "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> array_join(slice(split(text, ' '), i, 3), ' ')))"
    val split = documents(s, d).withColumn("split",
      when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cd", "train")
        .otherwise("eval"))
    val sh = split.select(col("doc_id"), col("split"), explode(expr(grams)).as("g"))
    val trainG = sh.filter(col("split") === "train").select("g").distinct()
    val contaminated = sh.filter(col("split") === "eval")
      .join(trainG, Seq("g"), "left_semi")
      .select(col("doc_id").as("cid")).distinct()
    split.filter(col("split") === "eval")
      .join(contaminated, col("doc_id") === col("cid"), "left_outer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_eval"), count(col("cid")).as("n_contaminated"))
      .orderBy("lang")
  }
  val pipelineContaminationReportSql: String =
    """WITH s AS (
      |  SELECT doc_id, lang, text,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
      |         THEN 'train' ELSE 'eval' END AS split
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, split,
      |    unnest(list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS g
      |  FROM s),
      |tg AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
      |cont AS (
      |  SELECT DISTINCT doc_id FROM sh
      |  WHERE split = 'eval' AND g IN (SELECT g FROM tg))
      |SELECT lang, count(*) AS n_eval,
      |  count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM cont))
      |    AS n_contaminated
      |FROM s WHERE split = 'eval' GROUP BY lang ORDER BY lang""".stripMargin

  /** text_zipf_head — the Zipf HEAD PROFILE of the corpus vocabulary:
    * the top-20 tokens with rank, frequency, frequency ratio to the
    * head token, and the Zipf constant estimate freq·rank/freq₁ (≈ 1
    * for a Zipf-distributed corpus) — the distribution sanity check a
    * tokenizer-training run reads before committing a vocab. All
    * ratios are per-row IEEE divisions of exact counts (no cross-row
    * float sums); the rank window runs over the already-cut 20-row
    * head, never the vocabulary.
    */
  def textZipfHead(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val head = counts.orderBy(col("freq").desc, col("tok").asc).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok").asc)).cast("long"))
    val f1 = head.agg(max(when(col("rank") === 1, col("freq"))).as("f1"))
    head.crossJoin(broadcast(f1))
      .select(col("rank"), col("tok"), col("freq"),
        round(col("freq").cast("double") / col("f1"), 6).as("freq_ratio"),
        round(col("freq").cast("double") * col("rank") / col("f1"), 6).as("zipf_c"))
      .orderBy("rank")
  }
  val textZipfHeadSql: String =
    """WITH c AS (
      |  SELECT tok, count(*) AS freq FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
      |  WHERE strlen(tok) > 0 GROUP BY tok),
      |h AS (
      |  SELECT tok, freq,
      |    CAST(row_number() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT) AS rank
      |  FROM c ORDER BY freq DESC, tok ASC LIMIT 20),
      |f1 AS (SELECT max(CASE WHEN rank = 1 THEN freq END) AS f1 FROM h)
      |SELECT rank, tok, freq,
      |  round(CAST(freq AS DOUBLE) / f1, 6) AS freq_ratio,
      |  round(CAST(freq AS DOUBLE) * rank / f1, 6) AS zipf_c
      |FROM h CROSS JOIN f1 ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_chi_square" -> (statChiSquare _),
    "ref_dataset_query_geojson" -> (refDatasetQueryGeojson _),
    "win_trend_residual" -> (winTrendResidual _),
    "pipeline_contamination_report" -> (pipelineContaminationReport _),
    "text_zipf_head" -> (textZipfHead _))

  val oracle: Map[String, String] = Map(
    "stat_chi_square" -> statChiSquareSql,
    "ref_dataset_query_geojson" -> refDatasetQueryGeojsonSql,
    "win_trend_residual" -> winTrendResidualSql,
    "pipeline_contamination_report" -> pipelineContaminationReportSql,
    "text_zipf_head" -> textZipfHeadSql)
}
