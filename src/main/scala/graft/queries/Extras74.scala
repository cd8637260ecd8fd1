package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventy-fourth wave: the reference's per-dataset measurement
  * profile and coverage grid endpoints, and a shard-balance audit for
  * the hash-sharded corpus layout.
  */
object Extras74 {

  /** ref_measurement_profile — the per-dataset STATISTICS endpoint
    * (the reference summarizes each submitted dataset: records per
    * field, min/max/mean of every measured column): computed straight
    * off the heterogeneous long layout (C153) — (cruise, field)
    * group-by with count / min / max / exact-decimal mean; fields a
    * file never declared simply contribute no rows (the long layout's
    * whole point — no per-schema branching). Scale: one keyed
    * aggregate over the ingest frame; the field union never
    * materializes wide.
    */
  def refMeasurementProfile(s: SparkSession, d: String): DataFrame = {
    val dir = Extras24.stageHeteroSbDir(s, d)
    val long = graft.sources.SbReader.readLong(s, s"$dir/*.sb")
    val meta = graft.sources.SbReader.readMetadata(s, s"$dir/*.sb")
      .filter(col("key") === "cruise")
      .select(col("path"), col("value").as("cruise"))
    long.join(meta, "path")
      .groupBy("cruise", "field")
      .agg(count(lit(1)).as("n"),
        min(col("value_num")).cast("double").as("v_min"),
        max(col("value_num")).cast("double").as("v_max"),
        round(dsum(col("value_num")) / count(lit(1)), 6).as("v_mean"))
      .orderBy("cruise", "field")
  }
  val refMeasurementProfileSql: String =
    """WITH ranked AS (
      |  SELECT lang, dense_rank() OVER (ORDER BY lang) AS rk
      |  FROM (SELECT DISTINCT lang FROM documents)),
      |d AS (
      |  SELECT lang, doc_id, n_chars,
      |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words
      |  FROM documents),
      |u AS (
      |  SELECT lang, 'doc_id' AS field, CAST(doc_id AS DOUBLE) AS v FROM d
      |  UNION ALL
      |  SELECT lang, 'n_chars', CAST(n_chars AS DOUBLE) FROM d
      |  UNION ALL
      |  SELECT d.lang, 'n_words', CAST(n_words AS DOUBLE)
      |  FROM d JOIN ranked r USING (lang) WHERE r.rk % 2 = 0)
      |SELECT 'corpus_' || lang AS cruise, field, count(*) AS n,
      |  min(v) AS v_min, max(v) AS v_max,
      |  round(CAST(sum(CAST(v AS DECIMAL(14,2))) AS DOUBLE) / count(*), 6)
      |    AS v_mean
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ref_coverage_gridmap — the coverage HEAT MAP endpoint (the
    * reference renders a global grid of measurement density for the
    * landing page): observations snap to 10° grid cells, per-cell
    * census + exact mean value. ONE partial-aggregating pass over the
    * scan — the cell key is row-local arithmetic, the output is
    * bounded by the grid (18×36), not the data.
    */
  def refCoverageGridmap(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        floor((col("value") % 360 - 180) / 10).cast("long").as("cx"),
        floor(((col("user_id") % 180).cast("double") - 90) / 10).cast("long")
          .as("cy"),
        col("event_type"), col("value"))
      .groupBy("cx", "cy")
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_insitu"),
        round(dsum(col("value")) / count(lit(1)), 6).as("mean_val"))
      .orderBy("cx", "cy")
  val refCoverageGridmapSql: String =
    """SELECT CAST(floor((value % 360 - 180) / 10) AS BIGINT) AS cx,
      |  CAST(floor((CAST(user_id % 180 AS DOUBLE) - 90) / 10) AS BIGINT) AS cy,
      |  count(*) AS n_obs,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_insitu,
      |  round(CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE)
      |    / count(*), 6) AS mean_val
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** pipeline_shard_balance — the shard-balance AUDIT a hash-sharded
    * corpus layout runs before training (skewed shards straggle the
    * epoch): 32 shards assigned by md5 (C129's scheme), per-shard doc
    * and token counts, then a balance report — min/max/median shard
    * size (median by ELEMENT selection) and the max/min ratio as the
    * one final IEEE division. The audit aggregates the 32-row shard
    * frame; the corpus contributes one partial-agg pass.
    */
  def pipelineShardBalance(s: SparkSession, d: String): DataFrame = {
    val shards = documents(s, d)
      .select((conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 32).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"))
    shards.agg(
      count(lit(1)).as("n_shards"),
      min(col("n_docs")).as("min_docs"),
      max(col("n_docs")).as("max_docs"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_docs)")
        .cast("long").as("median_docs"),
      min(col("n_tok")).as("min_tok"),
      max(col("n_tok")).as("max_tok"),
      round(max(col("n_tok")).cast("double") / min(col("n_tok")), 6)
        .as("tok_skew_ratio"))
  }
  val pipelineShardBalanceSql: String =
    """WITH shards AS (
      |  SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      |      AS BIGINT) % 32 AS BIGINT) AS shard,
      |    count(*) AS n_docs,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tok
      |  FROM documents GROUP BY 1)
      |SELECT count(*) AS n_shards,
      |  min(n_docs) AS min_docs, max(n_docs) AS max_docs,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY n_docs) AS median_docs,
      |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
      |  round(CAST(max(n_tok) AS DOUBLE) / min(n_tok), 6) AS tok_skew_ratio
      |FROM shards""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_measurement_profile" -> (refMeasurementProfile _),
    "ref_coverage_gridmap" -> (refCoverageGridmap _),
    "pipeline_shard_balance" -> (pipelineShardBalance _))

  val oracle: Map[String, String] = Map(
    "ref_measurement_profile" -> refMeasurementProfileSql,
    "ref_coverage_gridmap" -> refCoverageGridmapSql,
    "pipeline_shard_balance" -> pipelineShardBalanceSql)
}
