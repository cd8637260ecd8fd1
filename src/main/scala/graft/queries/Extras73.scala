package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Seventy-third wave: graph degree assortativity, an equi-depth
  * histogram via element-selection boundaries, and HTML boilerplate
  * stripping.
  */
object Extras73 {

  /** graph_degree_assortativity — degree correlation across the
    * supplier↔customer bipartite edges (do high-degree suppliers trade
    * with high-degree customers?): Pearson r over the edge list's
    * (deg_s, deg_c) pairs. Degrees are INTEGERS, so every moment sum
    * is exact in DECIMAL(38,0) (Σd² reaches ~10¹⁸ at 1000× bench
    * scale) and the correlation is ONE IEEE expression on the 1-row
    * frame. Scale: the edge list distincts once (C305's shape), both
    * degree frames derive from IT (not the fact table), and the two
    * joins hash on the edge's own endpoints.
    */
  def graphDegreeAssortativity(s: SparkSession, d: String): DataFrame = {
    val D = DecimalType(38, 0)
    val edges = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct()
    val degS = edges.groupBy("sk").agg(count(lit(1)).as("ds"))
    val degC = edges.groupBy("ck").agg(count(lit(1)).as("dc"))
    val sums = edges.join(degS, "sk").join(degC, "ck")
      .select(col("ds").cast(D).as("x"), col("dc").cast(D).as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def dd(c: String): Column = col(c).cast("double")
    sums.select(col("n"),
      round((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        sqrt((dd("n") * dd("sxx") - dd("sx") * dd("sx")) *
             (dd("n") * dd("syy") - dd("sy") * dd("sy"))), 6)
        .as("assortativity"))
  }
  val graphDegreeAssortativitySql: String =
    """WITH edges AS (
      |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |ds AS (SELECT sk, count(*) AS ds FROM edges GROUP BY 1),
      |dc AS (SELECT ck, count(*) AS dc FROM edges GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS n, sum(ds) AS sx, sum(dc) AS sy,
      |    sum(ds*dc) AS sxy, sum(ds*ds) AS sxx, sum(dc*dc) AS syy
      |  FROM edges JOIN ds USING (sk) JOIN dc USING (ck))
      |SELECT n,
      |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS assortativity
      |FROM s""".stripMargin

  /** agg_equidepth_histogram — an equi-DEPTH histogram of extended
    * price (the optimizer-statistics shape: quartile boundaries, then
    * per-bucket occupancy): the fact collapses to a (value, count)
    * frame in ONE partial-agg pass, the cumulative count rides
    * GlobalRank's range-partitioned prefix-sum over that O(distinct)
    * frame, and each quartile boundary is the smallest value with
    * 4·cum ≥ q·4·n — pure INTEGER arithmetic, identical to
    * percentile_disc's cume_dist ≥ q element selection (the oracle
    * keeps percentile_disc). Bucket occupancy then sums the counts
    * frame against the broadcast 1-row bounds — the fact is scanned
    * once, nothing ever sorts globally, and no aggregate buffers the
    * full value multiset (the previous percentile_disc ×3 plan
    * shuffled three whole-data maps: 11.8 s → ~3 s at sf0.1).
    */
  def aggEquidepthHistogram(s: SparkSession, d: String): DataFrame = {
    // The counts frame feeds THREE consumers (prefix-sum, total,
    // bucket-sum); pin it eagerly so the 600k-row fact scan + partial
    // agg runs once, not once per consumer (measured 4.9 s → ~2 s at
    // sf0.1). O(distinct) rows of (decimal, long) — safe to pin at any
    // sf where distinct values fit the cluster's block store.
    val vc = lineitem(s, d).select(dec(col("l_extendedprice")).as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val cum = graft.plans.GlobalRank
      .withExclusivePrefixSum(vc, "cumx", col("cnt"), Seq(col("v")))
      .withColumn("cum", col("cumx") + col("cnt"))
    val tot = vc.agg(sum(col("cnt")).as("n"))
    val bounds = cum.crossJoin(broadcast(tot)).agg(
      min(when(col("cum") * 4 >= col("n"), col("v"))).as("b1"),
      min(when(col("cum") * 2 >= col("n"), col("v"))).as("b2"),
      min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("b3"))
    vc.crossJoin(broadcast(bounds))
      .select(col("cnt"),
        when(col("v") < col("b1"), 0L)
          .when(col("v") < col("b2"), 1L)
          .when(col("v") < col("b3"), 2L).otherwise(3L).as("bucket"))
      .groupBy("bucket").agg(sum(col("cnt")).as("n"))
      .orderBy("bucket")
  }
  val aggEquidepthHistogramSql: String =
    """WITH li AS (
      |  SELECT CAST(l_extendedprice AS DECIMAL(14,2)) AS v FROM lineitem),
      |b AS (
      |  SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS b1,
      |    percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS b2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS b3
      |  FROM li)
      |SELECT CAST(CASE WHEN v < b1 THEN 0 WHEN v < b2 THEN 1
      |    WHEN v < b3 THEN 2 ELSE 3 END AS BIGINT) AS bucket, count(*) AS n
      |FROM li, b GROUP BY 1 ORDER BY 1""".stripMargin

  /** text_html_strip — markup boilerplate removal (the first cleaning
    * step of every web-scraped pretraining corpus): a deterministic
    * HTML wrapper (tags + numeric character entities) synthesized
    * around each document is stripped back — tags via one regex pass,
    * entities via replace — and the round-trip equality census proves
    * the strip is lossless on the payload. Pure row-local string work
    * riding the scan; the per-lang census is the only shuffle.
    */
  def textHtmlStrip(s: SparkSession, d: String): DataFrame = {
    val html = documents(s, d).select(col("lang"), col("text"),
      concat(lit("<div class=\"doc\"><p>"),
        regexp_replace(col("text"), "e", "&#101;"),
        lit("</p><br/></div>")).as("html"))
    html
      .select(col("lang"), col("text"), col("html"),
        regexp_replace(regexp_replace(col("html"), "<[^>]+>", ""),
          "&#101;", "e").as("stripped"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("stripped") === col("text"), 1L).otherwise(0L))
          .as("n_roundtrip_ok"),
        sum(length(col("html")) - length(col("stripped"))).cast("long")
          .as("chars_removed"))
      .orderBy("lang")
  }
  val textHtmlStripSql: String =
    """WITH h AS (
      |  SELECT lang, text,
      |    '<div class="doc"><p>' || replace(text, 'e', '&#101;')
      |      || '</p><br/></div>' AS html
      |  FROM documents),
      |st AS (
      |  SELECT lang, text, html,
      |    replace(regexp_replace(html, '<[^>]+>', '', 'g'), '&#101;', 'e')
      |      AS stripped
      |  FROM h)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN stripped = text THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_roundtrip_ok,
      |  CAST(sum(length(html) - length(stripped)) AS BIGINT) AS chars_removed
      |FROM st GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_degree_assortativity" -> (graphDegreeAssortativity _),
    "agg_equidepth_histogram" -> (aggEquidepthHistogram _),
    "text_html_strip" -> (textHtmlStrip _))

  val oracle: Map[String, String] = Map(
    "graph_degree_assortativity" -> graphDegreeAssortativitySql,
    "agg_equidepth_histogram" -> aggEquidepthHistogramSql,
    "text_html_strip" -> textHtmlStripSql)
}
