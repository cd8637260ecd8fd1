package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixtieth wave: search-result snippet extraction (the display half of
  * the reference's text search) and the Benford first-digit profile.
  */
object Extras60 {

  /** ref_search_snippet — SNIPPET extraction for search hits (the
    * result-rendering half of A3: the reference's UI shows each hit
    * with the matched term in context): for documents matching the
    * indexed term, emit a window of up to 5 tokens before and after
    * the FIRST occurrence, with the hit bracketed. The candidate set
    * rides the inverted-index semi-join (the filter never scans
    * non-matching docs' text); snippet assembly is row-local array
    * slicing on the hits only — at 100 TB the text column is
    * materialized for |hits| rows, not the corpus. Token-level match
    * (same semantics as C291's prefix walk, here whole-token).
    */
  def refSearchSnippet(s: SparkSession, d: String): DataFrame = {
    RefSurface.enableTextIndex(s, d)
    val term = "merge"
    documents(s, d)
      .filter(expr(s"${graft.plans.TextIndex.name}(text, '$term')"))
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), t => length(t) > 0).as("toks"))
      // token-level first occurrence (array_position is 1-based, 0 = absent)
      .withColumn("pos", array_position(col("toks"), term))
      .filter(col("pos") > 0) // substring-only hits have no whole-token snippet
      .select(col("doc_id"),
        col("pos").cast("long").as("hit_pos"),
        concat_ws(" ",
          concat(
            slice(col("toks"), greatest(col("pos") - 5, lit(1)),
              least(col("pos") - 1, lit(5)).cast("int")),
            array(concat(lit("["), lit(term), lit("]"))),
            slice(col("toks"), col("pos") + 1, lit(5)))).as("snippet"))
      .orderBy("doc_id")
  }
  val refSearchSnippetSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
      |  FROM documents
      |  WHERE lower(text) LIKE '%merge%'),
      |p AS (
      |  SELECT doc_id, toks, list_position(toks, 'merge') AS pos
      |  FROM t WHERE list_position(toks, 'merge') IS NOT NULL
      |             AND list_position(toks, 'merge') > 0)
      |SELECT doc_id, CAST(pos AS BIGINT) AS hit_pos,
      |  array_to_string(list_concat(list_concat(
      |    toks[greatest(pos - 5, 1):pos - 1],
      |    ['[merge]']),
      |    toks[pos + 1:pos + 5]), ' ') AS snippet
      |FROM p ORDER BY doc_id""".stripMargin

  /** stat_benford_profile — first-significant-digit profile of order
    * totals vs Benford's law (the fraud/quality screen an archive runs
    * over submitted numeric columns): per leading digit d, observed
    * count, observed fraction, expected log10(1 + 1/d), and the χ²
    * contribution — the expected values are CONSTANT IEEE expressions
    * and every observed number derives from exact integer counts with
    * one division, so the 9-row report is bit-stable. Leading digit
    * via string head of the absolute integer part (no float log
    * tricks on the data path).
    */
  def statBenfordProfile(s: SparkSession, d: String): DataFrame = {
    val tot = orders(s, d).agg(count(lit(1)).as("n_tot"))
    orders(s, d)
      .select(substring(abs(col("o_totalprice")).cast("decimal(14,2)")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_tot"), 6).as("obs_frac"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_frac"),
        round(
          pow(col("n").cast("double") / col("n_tot") -
            log10(lit(1.0) + lit(1.0) / col("digit")), 2) /
            log10(lit(1.0) + lit(1.0) / col("digit")), 8).as("chi_contrib"))
      .orderBy("digit")
  }
  val statBenfordProfileSql: String =
    """WITH t AS (
      |  SELECT CAST(substr(CAST(CAST(abs(o_totalprice) AS DECIMAL(14,2)) AS VARCHAR),
      |    1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |n AS (SELECT count(*) AS n_tot FROM t)
      |SELECT digit, count(*) AS n,
      |  round(CAST(count(*) AS DOUBLE) / n_tot, 6) AS obs_frac,
      |  round(log10(1.0 + 1.0 / digit), 6) AS benford_frac,
      |  round(pow(CAST(count(*) AS DOUBLE) / n_tot
      |      - log10(1.0 + 1.0 / digit), 2)
      |    / log10(1.0 + 1.0 / digit), 8) AS chi_contrib
      |FROM t, n GROUP BY digit, n_tot ORDER BY digit""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_search_snippet" -> (refSearchSnippet _),
    "stat_benford_profile" -> (statBenfordProfile _))

  val oracle: Map[String, String] = Map(
    "ref_search_snippet" -> refSearchSnippetSql,
    "stat_benford_profile" -> statBenfordProfileSql)
}
