package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Seventy-first wave: Cramér's V association (the effect-size
  * companion to stat_chi_square), the reference's per-cruise field
  * availability matrix, and an exact label-centroid similarity matrix
  * over the embedding table.
  */
object Extras71 {

  /** stat_cramers_v — strength of association between order priority
    * and order status: χ² from the contingency counts (expected
    * counts rt·ct/n with both totals cast to double BEFORE the
    * product — int64 would wrap at ~3×10⁹ rows), each cell's
    * contribution rounded to 6 dp and summed as EXACT decimal (a raw
    * double Σ over cells would be shuffle-order dependent), then
    * Cramér's V and the Bergsma bias-corrected Ṽ as ONE final IEEE
    * expression block on the single-row frame — identical text in
    * both engines. Scale: one groupBy on the (tiny) category cross
    * product, two broadcast margins; nothing touches a window.
    */
  def statCramersV(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d)
      .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("p").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("st").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("p")).as("r"), countDistinct(col("st")).as("c"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val sums = cells
      .join(broadcast(rt), "p").join(broadcast(ct), "st")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        round(pow(col("o").cast("double") - e, 2) / e, 6)
          .cast(DecimalType(18, 6)).as("contrib"))
      .groupBy("n", "r", "c")
      .agg(sum(col("contrib")).cast("double").as("chi2"))
    def dd(c: String): Column = col(c).cast("double")
    sums.select(col("n"), col("r"), col("c"), col("chi2"),
      round(sqrt(col("chi2") / (dd("n") *
        least(dd("r") - 1, dd("c") - 1))), 6).as("cramers_v"),
      round(sqrt(
        greatest(lit(0.0), col("chi2") / dd("n") -
          (dd("r") - 1) * (dd("c") - 1) / (dd("n") - 1)) /
        least(dd("r") - (dd("r") - 1) * (dd("r") - 1) / (dd("n") - 1) - 1,
              dd("c") - (dd("c") - 1) * (dd("c") - 1) / (dd("n") - 1) - 1)),
        6).as("cramers_v_corrected"))
  }
  val statCramersVSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS p, o_orderstatus AS st, count(*) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT p, sum(o) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT st, sum(o) AS ct FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |  count(DISTINCT p) AS r, count(DISTINCT st) AS c FROM cells),
      |sums AS (
      |  SELECT n, r, c, CAST(sum(CAST(round(
      |      pow(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(n AS DOUBLE), 2)
      |      / (CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(n AS DOUBLE)), 6)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS chi2
      |  FROM cells JOIN rt USING (p) JOIN ct USING (st), tot
      |  GROUP BY 1, 2, 3)
      |SELECT n, r, c, chi2,
      |  round(sqrt(chi2 / (CAST(n AS DOUBLE)
      |    * least(CAST(r AS DOUBLE) - 1, CAST(c AS DOUBLE) - 1))), 6)
      |    AS cramers_v,
      |  round(sqrt(
      |    greatest(0.0, chi2 / CAST(n AS DOUBLE)
      |      - (CAST(r AS DOUBLE) - 1) * (CAST(c AS DOUBLE) - 1)
      |        / (CAST(n AS DOUBLE) - 1)) /
      |    least(CAST(r AS DOUBLE) - (CAST(r AS DOUBLE) - 1) * (CAST(r AS DOUBLE) - 1)
      |            / (CAST(n AS DOUBLE) - 1) - 1,
      |          CAST(c AS DOUBLE) - (CAST(c AS DOUBLE) - 1) * (CAST(c AS DOUBLE) - 1)
      |            / (CAST(n AS DOUBLE) - 1) - 1)), 6)
      |    AS cramers_v_corrected
      |FROM sums""".stripMargin

  /** ref_field_availability — the reference's per-dataset FIELD
    * AVAILABILITY matrix (which measured fields each cruise reported —
    * the search UI filters datasets by available parameters): the
    * heterogeneous `.sb` fixture (C153's staging — every file declares
    * its own `/fields=`) parses through the long/narrow layout, the
    * distinct (file, field) pairs join the header metadata, and one
    * pivot rebuilds the cruise × field 0/1 matrix. Scale: the distinct
    * runs on (path, field) — schema-cardinality, not record
    * cardinality; records never shuffle.
    */
  def refFieldAvailability(s: SparkSession, d: String): DataFrame = {
    val dir = Extras24.stageHeteroSbDir(s, d)
    val long = graft.sources.SbReader.readLong(s, s"$dir/*.sb")
    val meta = graft.sources.SbReader.readMetadata(s, s"$dir/*.sb")
      .filter(col("key") === "cruise")
      .select(col("path"), col("value").as("cruise"))
    long.select("path", "field").distinct()
      .join(meta, "path")
      .groupBy("cruise")
      .pivot("field", Seq("doc_id", "n_chars", "n_words"))
      .agg(first(lit(1L)))
      .select(col("cruise"),
        coalesce(col("doc_id"), lit(0L)).as("has_doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("has_n_chars"),
        coalesce(col("n_words"), lit(0L)).as("has_n_words"))
      .orderBy("cruise")
  }
  val refFieldAvailabilitySql: String =
    """WITH ranked AS (
      |  SELECT lang, dense_rank() OVER (ORDER BY lang) AS rk
      |  FROM (SELECT DISTINCT lang FROM documents))
      |SELECT 'corpus_' || lang AS cruise,
      |  CAST(1 AS BIGINT) AS has_doc_id,
      |  CAST(1 AS BIGINT) AS has_n_chars,
      |  CAST(CASE WHEN rk % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS has_n_words
      |FROM ranked ORDER BY cruise""".stripMargin

  /** embed_centroid_similarity — the label-centroid cosine matrix
    * (cluster-overlap diagnostics for the embedding space): per-label
    * centroid component sums in EXACT integer arithmetic (each float
    * quantizes to ⌊v·10⁶ + ½⌋ — C74's trick; a float/double Σ would be
    * shuffle-order dependent), the 45 upper-triangle label pairs dot
    * via a dim-keyed self-join of the 10×64 centroid frame, norms and
    * dots accumulate as DECIMAL(38,0) (Σ fx_a·fx_b reaches ~10¹⁹ at
    * bench scale — int64 wraps), and cosine is one IEEE expression per
    * pair. Scale: records aggregate once by (label, dim) — the
    * pairwise work runs on the label-cardinality frame, never on rows.
    */
  def embedCentroidSimilarity(s: SparkSession, d: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cent = embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        floor(col("col").cast("double") * 1000000d + 0.5d).as("fx"))
      .groupBy("label", "dim")
      .agg(sum(col("fx")).cast(D).as("sv"))
    val norm2 = cent.groupBy(col("label").as("nl"))
      .agg(sum(col("sv") * col("sv")).as("n2"))
    val a = cent.select(col("label").as("la"), col("dim"), col("sv").as("sa"))
    val b = cent.select(col("label").as("lb"), col("dim"), col("sv").as("sb"))
    a.join(b, Seq("dim")).filter(col("la") < col("lb"))
      .groupBy("la", "lb").agg(sum(col("sa") * col("sb")).as("dot"))
      .join(broadcast(norm2.select(col("nl").as("la"), col("n2").as("na"))), "la")
      .join(broadcast(norm2.select(col("nl").as("lb"), col("n2").as("nb"))), "lb")
      .select(col("la").cast("int").as("la"), col("lb").cast("int").as("lb"),
        round(col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
          .as("cos_sim"))
      .orderBy("la", "lb")
  }
  val embedCentroidSimilaritySql: String =
    """WITH dims AS (
      |  SELECT label, i AS dim,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS fx
      |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)),
      |cent AS (
      |  SELECT label, dim, CAST(sum(fx) AS HUGEINT) AS sv
      |  FROM dims GROUP BY 1, 2),
      |norm2 AS (SELECT label, sum(sv * sv) AS n2 FROM cent GROUP BY 1),
      |dots AS (
      |  SELECT a.label AS la, b.label AS lb, sum(a.sv * b.sv) AS dot
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT CAST(la AS INT) AS la, CAST(lb AS INT) AS lb,
      |  round(CAST(dot AS DOUBLE)
      |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos_sim
      |FROM dots
      |JOIN norm2 na ON la = na.label
      |JOIN norm2 nb ON lb = nb.label
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cramers_v" -> (statCramersV _),
    "ref_field_availability" -> (refFieldAvailability _),
    "embed_centroid_similarity" -> (embedCentroidSimilarity _))

  val oracle: Map[String, String] = Map(
    "stat_cramers_v" -> statCramersVSql,
    "ref_field_availability" -> refFieldAvailabilitySql,
    "embed_centroid_similarity" -> embedCentroidSimilaritySql)
}
