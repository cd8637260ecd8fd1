package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 99 (C800–C803): curation-pipeline diagnostics — the quality-
  * filter co-fire matrix, the corpus shingle document-frequency
  * profile, an ANOVA of embedding norms across labels, and the token
  * casing profile.
  *
  * Shared discipline: filter flags and casing classes are exact
  * regex-count integers; shingle DF is one distinct-per-doc explode +
  * two grouped counts; the norm ANOVA quantizes per-vector norms once
  * and runs the exact between/within decomposition on integer moments.
  */
object Extras199 {

  /** C800 pipeline_filter_overlap — which quality filters fire
    * TOGETHER: four standard heuristics (too-short, punctuation-heavy,
    * digit-heavy, stopword-poor) evaluated as exact per-doc booleans,
    * then the 6 pairwise 2×2 tables with co-fire counts and φ
    * coefficients. Redundant filters (φ→1) waste pipeline stages;
    * anti-correlated ones (φ<0) catch disjoint failure modes — this
    * matrix is how you prune a filter cascade.
    */
  def pipelineFilterOverlap(s: SparkSession, d: String): DataFrame = {
    val flags = documents(s, d).select(
      expr("CASE WHEN n_chars < 100 THEN 1L ELSE 0L END").as("f1"),
      expr(
        """CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?]', '')) AS DOUBLE)
          |/ greatest(n_chars, 1L) > 0.03 THEN 1L ELSE 0L END""".stripMargin).as("f2"),
      expr(
        """CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '')) AS DOUBLE)
          |/ greatest(n_chars, 1L) > 0.05 THEN 1L ELSE 0L END""".stripMargin).as("f3"),
      expr(
        """CASE WHEN CAST(size(filter(split(text, ' '),
          |  t -> t IN ('the','a','of','to','and','in','is','it','for','on'))) AS DOUBLE)
          |/ greatest(size(split(text, ' ')), 1) < 0.05 THEN 1L ELSE 0L END""".stripMargin).as("f4"))
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val aggCols = Seq(count(lit(1)).cast("long").as("n"),
      sum(col("f1")).cast("long").as("s1"), sum(col("f2")).cast("long").as("s2"),
      sum(col("f3")).cast("long").as("s3"), sum(col("f4")).cast("long").as("s4")) ++
      pairs.map { case (i, j) => sum(expr(s"f$i * f$j")).cast("long").as(s"c$i$j") }
    val aggs = flags.agg(aggCols.head, aggCols.tail: _*)
    val pairStructs = pairs.map { case (i, j) =>
      struct(
        lit(s"$i-$j").as("filter_pair"), col("n"),
        col(s"s$i").as("fires_a"), col(s"s$j").as("fires_b"),
        col(s"c$i$j").as("co_fires"),
        expr(
          s"""CASE WHEN s$i = 0 OR s$j = 0 OR s$i = n OR s$j = n THEN CAST(NULL AS DOUBLE)
            |ELSE round((CAST(c$i$j AS DOUBLE) * n - CAST(s$i AS DOUBLE) * s$j)
            |  / sqrt(CAST(s$i AS DOUBLE) * (n - s$i) * s$j * (n - s$j)), 6) END""".stripMargin)
          .as("phi"))
    }
    aggs.select(explode(array(pairStructs: _*)).as("e"))
      .select(col("e.filter_pair"), col("e.n"), col("e.fires_a"), col("e.fires_b"),
        col("e.co_fires"), col("e.phi"))
      .orderBy("filter_pair")
  }
  val pipelineFilterOverlapSql: String = {
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val rows = pairs.map { case (i, j) =>
      s"""SELECT '$i-$j' AS filter_pair, n, s$i AS fires_a, s$j AS fires_b, c$i$j AS co_fires,
        |    CASE WHEN s$i = 0 OR s$j = 0 OR s$i = n OR s$j = n THEN CAST(NULL AS DOUBLE)
        |    ELSE round((CAST(c$i$j AS DOUBLE) * n - CAST(s$i AS DOUBLE) * s$j)
        |      / sqrt(CAST(s$i AS DOUBLE) * (n - s$i) * s$j * (n - s$j)), 6) END AS phi
        |  FROM t""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH flags AS (
      |  SELECT
      |    CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS f1,
      |    CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
      |      / greatest(n_chars, 1) > 0.03 THEN 1 ELSE 0 END AS f2,
      |    CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
      |      / greatest(n_chars, 1) > 0.05 THEN 1 ELSE 0 END AS f3,
      |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','a','of','to','and','in','is','it','for','on'))) AS DOUBLE)
      |      / greatest(len(string_split(text, ' ')), 1) < 0.05 THEN 1 ELSE 0 END AS f4
      |  FROM documents),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(f1) AS BIGINT) AS s1, CAST(sum(f2) AS BIGINT) AS s2,
      |    CAST(sum(f3) AS BIGINT) AS s3, CAST(sum(f4) AS BIGINT) AS s4,
      |    ${pairs.map { case (i, j) => s"CAST(sum(f$i * f$j) AS BIGINT) AS c$i$j" }.mkString(",\n      |    ")}
      |  FROM flags)
      |SELECT * FROM (
      |  $rows)
      |ORDER BY filter_pair""".stripMargin
  }

  /** C801 dedup_shingle_df_profile — the corpus boilerplate fingerprint:
    * distinct 5-word shingles per doc, global document frequency per
    * shingle, and the DF spectrum (unique / duplicated shingle counts,
    * the occurrence-mass share held by df≥2 shingles, max DF). The
    * corpus-level complement to the per-doc boilerplate score: rising
    * dup-mass share is how template contamination shows up FIRST.
    */
  def dedupShingleDfProfile(s: SparkSession, d: String): DataFrame = {
    val sh = documents(s, d)
      .select(col("doc_id"),
        explode(expr(
          """array_distinct(transform(
            |  sequence(1, greatest(size(split(text, ' ')) - 4, 1)),
            |  i -> concat_ws(' ', slice(split(text, ' '), i, 5))))""".stripMargin)).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).cast("long").as("df"))
    df.agg(count(lit(1)).cast("long").as("n_shingles"),
        sum(expr("CASE WHEN df >= 2 THEN 1L ELSE 0L END")).cast("long").as("n_dup_shingles"),
        sum(col("df")).cast("decimal(38,0)").as("mass"),
        sum(expr("CASE WHEN df >= 2 THEN df ELSE 0L END")).cast("decimal(38,0)").as("dup_mass"),
        max(col("df")).cast("long").as("max_df"))
      .selectExpr("n_shingles", "n_dup_shingles",
        "round(CAST(n_dup_shingles AS DOUBLE) / n_shingles, 6) AS dup_shingle_share",
        "round(CAST(dup_mass AS DOUBLE) / CAST(mass AS DOUBLE), 6) AS dup_mass_share",
        "max_df")
  }
  val dedupShingleDfProfileSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
      |    i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))) AS sh
      |  FROM documents),
      |df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
      |  round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_shingle_share,
      |  round(CAST(CAST(sum(CASE WHEN df >= 2 THEN df ELSE 0 END) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(df) AS DECIMAL(38,0)) AS DOUBLE), 6) AS dup_mass_share,
      |  CAST(max(df) AS BIGINT) AS max_df
      |FROM df""".stripMargin

  /** C802 embed_norm_anova — one-way ANOVA of embedding L2 norms
    * across labels: per-vector norm from the exact BIGINT Σ(q²) of
    * ·10⁶-quantized components, the norm itself quantized ·10⁶ once,
    * then the exact between/within decomposition on integer moments.
    * Label-correlated norm scale is a training-data red flag (batch
    * effects / unnormalized encoders) that the global norm audit
    * (C-line embed_norm_audit) cannot attribute.
    */
  def embedNormAnova(s: SparkSession, d: String): DataFrame = {
    val norms = embeddings(s, d)
      .select(col("label"),
        expr(
          """CAST(floor(sqrt(CAST(aggregate(transform(embedding,
            |  x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)),
            |  CAST(0 AS DECIMAL(38,0)), (acc, q) -> acc + CAST(q AS DECIMAL(38,0)) * q) AS DOUBLE))
            |+ 0.5) AS BIGINT)""".stripMargin).as("nq")) // norm in 1e6-units, rounded to int
    val g = norms.groupBy("label")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("nq")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(nq AS DECIMAL(38,0)) * nq")).cast("decimal(38,0)").as("qg"))
    val tot = g.agg(count(lit(1)).cast("long").as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("sg")).cast("decimal(38,0)").as("st"), sum(col("qg")).cast("decimal(38,0)").as("qt"))
    g.crossJoin(broadcast(tot))
      .select(col("k"), col("n"), col("st"), col("qt"),
        // between-group term ·n_g cleared: (sg/ng − st/n)²·ng exact-ish in double
        expr(
          """CAST(floor((CAST(sg AS DOUBLE) / ng - CAST(st AS DOUBLE) / n)
            |* (CAST(sg AS DOUBLE) / ng - CAST(st AS DOUBLE) / n) * ng / 1e6 + 0.5) AS BIGINT)""".stripMargin)
          .as("bq"))
      .groupBy("k", "n", "st", "qt")
      .agg(sum(col("bq")).cast("long").as("ssb_q"))
      .selectExpr("k", "n",
        "CAST(ssb_q AS DOUBLE) * 1e6 AS ssb",
        "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS sst")
      .selectExpr("k", "n",
        "round(ssb / sst, 6) AS eta_squared",
        """round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 6) AS f_stat""")
  }
  val embedNormAnovaSql: String =
    """WITH norms AS (
      |  SELECT label,
      |    CAST(floor(sqrt(CAST(list_sum(list_transform(embedding,
      |      x -> CAST(CAST(floor(x * 1e6 + 0.5) AS BIGINT) AS DECIMAL(38,0))
      |           * CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS DOUBLE)) + 0.5) AS BIGINT) AS nq
      |  FROM embeddings),
      |g AS (
      |  SELECT label, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(nq) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(nq AS DECIMAL(38,0)) * nq) AS DECIMAL(38,0)) AS qg
      |  FROM norms GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(sg) AS DECIMAL(38,0)) AS st, CAST(sum(qg) AS DECIMAL(38,0)) AS qt
      |  FROM g),
      |b AS (
      |  SELECT t.k, t.n, t.st, t.qt,
      |    CAST(sum(CAST(floor((CAST(g.sg AS DOUBLE) / g.ng - CAST(t.st AS DOUBLE) / t.n)
      |      * (CAST(g.sg AS DOUBLE) / g.ng - CAST(t.st AS DOUBLE) / t.n) * g.ng / 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ssb_q
      |  FROM g, tot t GROUP BY 1, 2, 3, 4),
      |v AS (
      |  SELECT k, n, CAST(ssb_q AS DOUBLE) * 1e6 AS ssb,
      |    CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n AS sst
      |  FROM b)
      |SELECT k, n,
      |  round(ssb / sst, 6) AS eta_squared,
      |  round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 6) AS f_stat
      |FROM v""".stripMargin

  /** C803 text_casing_profile — per-language token casing census:
    * lowercase / Titlecase / ALLCAPS / other shares from exact regex
    * class counts, plus the casing entropy (·10⁹-quantized terms).
    * Casing distributions are a cheap language/register fingerprint
    * and catch case-folding damage introduced by a bad normalizer.
    */
  def textCasingProfile(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .filter(expr("t rlike '^[A-Za-z]+$'"))
      .select(col("lang"), expr(
        """CASE WHEN t rlike '^[a-z]+$' THEN 'lower'
          |WHEN t rlike '^[A-Z][a-z]*$' THEN 'title'
          |WHEN t rlike '^[A-Z]+$' THEN 'upper'
          |ELSE 'mixed' END""".stripMargin).as("cls"))
    val cells = toks.groupBy("lang", "cls").agg(count(lit(1)).cast("long").as("m"))
    val tot = cells.groupBy("lang").agg(sum(col("m")).cast("long").as("n"))
    cells.join(broadcast(tot), Seq("lang"))
      .groupBy("lang")
      .agg(max(col("n")).as("n_alpha_tokens"),
        sum(expr("CASE WHEN cls = 'lower' THEN m ELSE 0L END")).cast("long").as("lo"),
        sum(expr("CASE WHEN cls = 'title' THEN m ELSE 0L END")).cast("long").as("ti"),
        sum(expr("CASE WHEN cls = 'upper' THEN m ELSE 0L END")).cast("long").as("up"),
        sum(expr(
          "CAST(floor(CAST(m AS DOUBLE) * ln(CAST(n AS DOUBLE) / m) * 1e9 + 0.5) AS BIGINT)"))
          .cast("long").as("hq"))
      .selectExpr("lang", "n_alpha_tokens",
        "round(CAST(lo AS DOUBLE) / n_alpha_tokens, 6) AS lower_share",
        "round(CAST(ti AS DOUBLE) / n_alpha_tokens, 6) AS title_share",
        "round(CAST(up AS DOUBLE) / n_alpha_tokens, 6) AS upper_share",
        "round(CAST(hq AS DOUBLE) / 1e9 / n_alpha_tokens, 6) AS casing_entropy_nats")
      .orderBy("lang")
  }
  val textCasingProfileSql: String =
    """WITH toks AS (
      |  SELECT lang,
      |    CASE WHEN regexp_matches(t, '^[a-z]+$') THEN 'lower'
      |      WHEN regexp_matches(t, '^[A-Z][a-z]*$') THEN 'title'
      |      WHEN regexp_matches(t, '^[A-Z]+$') THEN 'upper'
      |      ELSE 'mixed' END AS cls
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE regexp_matches(t, '^[A-Za-z]+$')),
      |cells AS (SELECT lang, cls, CAST(count(*) AS BIGINT) AS m FROM toks GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(sum(m) AS BIGINT) AS n FROM cells GROUP BY 1)
      |SELECT c.lang, max(t.n) AS n_alpha_tokens,
      |  round(CAST(sum(CASE WHEN c.cls = 'lower' THEN c.m ELSE 0 END) AS DOUBLE) / max(t.n), 6) AS lower_share,
      |  round(CAST(sum(CASE WHEN c.cls = 'title' THEN c.m ELSE 0 END) AS DOUBLE) / max(t.n), 6) AS title_share,
      |  round(CAST(sum(CASE WHEN c.cls = 'upper' THEN c.m ELSE 0 END) AS DOUBLE) / max(t.n), 6) AS upper_share,
      |  round(CAST(CAST(sum(CAST(floor(CAST(c.m AS DOUBLE) * ln(CAST(t.n AS DOUBLE) / c.m) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e9 / max(t.n), 6) AS casing_entropy_nats
      |FROM cells c JOIN tot t ON t.lang = c.lang
      |GROUP BY c.lang ORDER BY c.lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_filter_overlap" -> (pipelineFilterOverlap _),
    "dedup_shingle_df_profile" -> (dedupShingleDfProfile _),
    "embed_norm_anova" -> (embedNormAnova _),
    "text_casing_profile" -> (textCasingProfile _),
  )

  val oracle: Map[String, String] = Map(
    "pipeline_filter_overlap" -> pipelineFilterOverlapSql,
    "dedup_shingle_df_profile" -> dedupShingleDfProfileSql,
    "embed_norm_anova" -> embedNormAnovaSql,
    "text_casing_profile" -> textCasingProfileSql,
  )
}
