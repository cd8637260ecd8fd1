package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.plans.GlobalRank

/** Eighty-fourth wave: hash-signed random projection (JL transform),
  * ISO-week calendar rollup, and curriculum ordering on the global-rank
  * machinery.
  */
object Extras84 {

  /** embed_random_projection — the Johnson–Lindenstrauss ±1 random
    * projection (64 → 8 dims) with a DETERMINISTIC hash-signed matrix
    * (no RNG state, reproducible under any partitioning): components
    * quantize to exact integers (the C343 scheme) so every projection
    * and both distortion moments are EXACT decimal sums; the reported
    * per-dimension energy ratio Σ‖p_k‖²/Σ‖x‖² is one IEEE division on
    * the 8-row frame. The sign bit mixes dim and k through an LCG step
    * + integer shift so no parity artifact survives. Scale: one
    * explode pass, partial-agg by (vec,k), output bounded by k.
    */
  def embedRandomProjection(s: SparkSession, d: String): DataFrame = {
    val D = DecimalType(38, 0)
    val comp = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        floor(col("col").cast("double") * 1000000d + 0.5d).as("fx"))
    val normTot = comp
      .agg(sum((col("fx") * col("fx")).cast(D)).as("x2"))
    val proj = comp
      .select(col("vec_id"), col("dim"), col("fx"),
        explode(sequence(lit(1L), lit(8L))).as("k"))
      .withColumn("sgn", expr(
        """CASE WHEN ((dim * 1103515245L + k * 12345L) & 1048575L)
          |  div 1024L % 2L = 0L THEN 1L ELSE -1L END""".stripMargin))
      .groupBy("vec_id", "k")
      .agg(sum(col("fx") * col("sgn")).as("p"))
    proj.groupBy("k")
      .agg(count(lit(1)).as("n_vecs"),
        sum((col("p") * col("p")).cast(D)).as("p2"))
      .crossJoin(broadcast(normTot))
      .select(col("k"), col("n_vecs"),
        round(col("p2").cast("double") / col("x2").cast("double"), 6)
          .as("energy_ratio"))
      .orderBy("k")
  }
  val embedRandomProjectionSql: String =
    """WITH comp AS (
      |  SELECT vec_id, dim,
      |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000 + 0.5)
      |      AS BIGINT) AS fx
      |  FROM read_parquet_embeddings, generate_series(1, 64) AS g(dim)),
      |nt AS (
      |  SELECT sum(fx * fx) AS x2 FROM comp),
      |proj AS (
      |  SELECT vec_id, k,
      |    sum(fx * (CASE WHEN (((dim * 1103515245 + k * 12345) & 1048575)
      |      // 1024) % 2 = 0 THEN 1 ELSE -1 END)) AS p
      |  FROM comp, generate_series(1, 8) AS kk(k)
      |  GROUP BY 1, 2)
      |SELECT k, count(*) AS n_vecs,
      |  round(CAST(sum(p * p) AS DOUBLE) / CAST(max(x2) AS DOUBLE), 6)
      |    AS energy_ratio
      |FROM proj, nt GROUP BY 1 ORDER BY 1"""
      .stripMargin.replace("read_parquet_embeddings", "embeddings")

  /** time_iso_week_rollup — revenue rolled up to ISO weeks (the
    * calendar edge case where the week's year ≠ the date's year around
    * Jan 1): week start by date_trunc (Monday in both engines), ISO
    * year/week extracted from the TRUNCATED date so all three columns
    * agree by construction; one partial-agg pass, output O(weeks).
    */
  def timeIsoWeekRollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_trunc("week", col("o_orderdate"))
        .cast("timestamp_ntz").as("week_start"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
      .select(expr("extract(YEAROFWEEK FROM week_start)").cast("long")
          .as("iso_year"),
        weekofyear(col("week_start")).cast("long").as("iso_week"),
        col("week_start"), col("n_orders"), col("rev"))
      .orderBy("week_start")
  val timeIsoWeekRollupSql: String =
    """SELECT CAST(isoyear(week_start) AS BIGINT) AS iso_year,
      |  CAST(weekofyear(week_start) AS BIGINT) AS iso_week,
      |  CAST(week_start AS TIMESTAMP) AS week_start, n_orders, rev
      |FROM (
      |  SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week_start,
      |    count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1)
      |ORDER BY week_start""".stripMargin

  /** pipeline_curriculum_order — curriculum-learning phase assignment:
    * every document gets a GLOBAL rank by (difficulty, doc_id) through
    * the range-partitioned two-pass GlobalRank (C129's machinery — no
    * single-partition window at any scale), phase = ⌊4·(rn−1)/N⌋ is
    * pure arithmetic on the rank, and the report aggregates per phase.
    * The equivalent `row_number() OVER (ORDER BY …)` would serialize
    * the full corpus through one task at 100 TB.
    */
  def pipelineCurriculumOrder(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"))
    GlobalRank.withGlobalRowNumberAndTotal(docs, "rn", "total",
        Seq(col("n_chars"), col("doc_id")))
      .withColumn("phase", ((col("rn") - 1) * 4).cast("long") / col("total"))
      .withColumn("phase", floor(col("phase")).cast("long"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("phase")
  }
  val pipelineCurriculumOrderSql: String =
    """WITH r AS (
      |  SELECT doc_id, n_chars,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER () AS total
      |  FROM documents)
      |SELECT CAST(floor(CAST((rn - 1) * 4 AS DOUBLE) / total) AS BIGINT)
      |    AS phase,
      |  count(*) AS n_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_random_projection" -> (embedRandomProjection _),
    "time_iso_week_rollup" -> (timeIsoWeekRollup _),
    "pipeline_curriculum_order" -> (pipelineCurriculumOrder _))

  val oracle: Map[String, String] = Map(
    "embed_random_projection" -> embedRandomProjectionSql,
    "time_iso_week_rollup" -> timeIsoWeekRollupSql,
    "pipeline_curriculum_order" -> pipelineCurriculumOrderSql)
}
