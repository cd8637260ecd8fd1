package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 44 (C580–C583): audio spectral centroid, TOST equivalence,
  * mark-join exists flags, duplicate-discounted sampling.
  */
object Extras144 {

  /** 8-point DFT twiddles, nano-quantized, generated once and injected
    * into both engines (the C562 discipline). */
  private val Tw: Seq[(Seq[Long], Seq[Long])] = (1 to 3).map { k =>
    ((0 to 7).map(j => math.round(math.cos(2 * math.Pi * k * j / 8) * 1e9)),
      (0 to 7).map(j => math.round(math.sin(2 * math.Pi * k * j / 8) * 1e9)))
  }

  /** C580 multimodal_audio_spectral_centroid — spectral centroid of
    * the WAV-style byte stream: 8-sample frames over the first 256
    * payload bytes, per-frame 8-point DFT with INJECTED nano-quantized
    * twiddles (exact DECIMAL dot products), per-bin power summed
    * across frames (squares in DOUBLE, identical chains), centroid
    * Σk·Pₖ/ΣPₖ. The frame fan-out is a bounded 32-frame explode per
    * doc, grouped straight back — no corpus-scale shuffle beyond the
    * doc key.
    */
  def multimodalAudioSpectralCentroid(s: SparkSession, d: String): DataFrame = {
    def dotExpr(coef: Seq[Long]): String =
      (0 to 7).map(j =>
        s"CAST(coalesce(element_at(vals, f * 8 + ${j + 1}), 0L) AS DECIMAL(38,0)) * ${coef(j)}")
        .mkString(" + ")
    val frames = documents(s, d)
      .withColumn("n", least(length(col("text")), lit(256)).cast("long"))
      .withColumn("vals", expr(
        "transform(slice(split(text, ''), 1, CAST(n AS INT)), ch -> ascii(ch))"))
      .filter(col("n") >= 8)
      .select(col("doc_id"), col("vals"), col("n"),
        explode(expr("sequence(0, CAST(n div 8 AS INT) - 1)")).as("f"))
    val binAggs = (1 to 3).flatMap { k =>
      val (cs, sn) = Tw(k - 1)
      Seq(
        s"CAST(${dotExpr(cs)} AS DOUBLE) AS a$k",
        s"CAST(${dotExpr(sn)} AS DOUBLE) AS b$k")
    }
    val perFrame = frames.selectExpr(Seq("doc_id") ++ binAggs: _*)
      .selectExpr(Seq("doc_id") ++
        (1 to 3).map(k => s"a$k * a$k + b$k * b$k AS p$k"): _*)
    perFrame.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(col("p1")).as("s1"), sum(col("p2")).as("s2"), sum(col("p3")).as("s3"))
      .selectExpr("doc_id", "n_frames",
        """round((1 * s1 + 2 * s2 + 3 * s3) / (s1 + s2 + s3), 6)
          |  AS spectral_centroid""".stripMargin)
      .orderBy("doc_id")
  }
  val multimodalAudioSpectralCentroidSql: String = {
    def dotExpr(coef: Seq[Long]): String =
      (0 to 7).map(j =>
        s"CAST(coalesce(vals[f * 8 + ${j + 1}], 0) AS DECIMAL(38,0)) * ${coef(j)}")
        .mkString(" + ")
    val binAggs = (1 to 3).flatMap { k =>
      val (cs, sn) = Tw(k - 1)
      Seq(s"CAST(${dotExpr(cs)} AS DOUBLE) AS a$k",
        s"CAST(${dotExpr(sn)} AS DOUBLE) AS b$k")
    }.mkString(",\n      |    ")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, least(strlen(text), 256)),
       |      p -> ascii(text[p])) AS vals,
       |    CAST(least(strlen(text), 256) AS BIGINT) AS n
       |  FROM documents
       |  WHERE strlen(text) >= 8),
       |frames AS (
       |  SELECT doc_id, vals, u.f AS f
       |  FROM base, unnest(generate_series(0, CAST(n // 8 AS BIGINT) - 1)) AS u(f)),
       |ab AS (
       |  SELECT doc_id,
       |    $binAggs
       |  FROM frames),
       |pw AS (
       |  SELECT doc_id, a1 * a1 + b1 * b1 AS p1, a2 * a2 + b2 * b2 AS p2,
       |    a3 * a3 + b3 * b3 AS p3
       |  FROM ab)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       |  round((1 * sum(p1) + 2 * sum(p2) + 3 * sum(p3))
       |    / (sum(p1) + sum(p2) + sum(p3)), 6) AS spectral_centroid
       |FROM pw GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** C581 stat_tost_equivalence — equivalence testing done right (two
    * one-sided Welch t-tests, ±50-char margin) for en-vs-de document
    * length: per-lang moments from exact integer sums, Welch SE and
    * both one-sided t's in one fixed chain; 'equivalent' only when
    * BOTH reject (t_lower > 1.645 AND t_upper < −1.645) — the
    * inferential mirror image of C***'s difference test.
    */
  def statTostEquivalence(s: SparkSession, d: String): DataFrame = {
    val m = documents(s, d).filter(col("lang").isin("en", "de"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(n_chars AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
    val en = m.filter(col("lang") === "en")
      .selectExpr("n AS n1", "sx AS s1", "sxx AS q1")
    val de = m.filter(col("lang") === "de")
      .selectExpr("n AS n2", "sx AS s2", "sxx AS q2")
    en.crossJoin(broadcast(de))
      .selectExpr("n1", "n2",
        "CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS diff",
        """sqrt(
          |  CAST(CAST(n1 AS DECIMAL(38,0)) * q1 - s1 * s1 AS DOUBLE)
          |    / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))
          |  + CAST(CAST(n2 AS DECIMAL(38,0)) * q2 - s2 * s2 AS DOUBLE)
          |    / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1))) AS se""".stripMargin)
      .selectExpr("n1", "n2", "round(diff, 6) AS mean_diff",
        "round(se, 6) AS welch_se",
        "round((diff + 50) / se, 6) AS t_lower",
        "round((diff - 50) / se, 6) AS t_upper",
        """CASE WHEN (diff + 50) / se > 1.645 AND (diff - 50) / se < -1.645
          |  THEN 'equivalent_pm50' ELSE 'not_shown_equivalent' END
          |  AS verdict""".stripMargin)
  }
  val statTostEquivalenceSql: String =
    """WITH m AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(n_chars AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS sxx
      |  FROM documents WHERE lang IN ('en', 'de') GROUP BY lang),
      |j AS (
      |  SELECT en.n AS n1, de.n AS n2,
      |    CAST(en.sx AS DOUBLE) / en.n - CAST(de.sx AS DOUBLE) / de.n AS diff,
      |    sqrt(
      |      CAST(CAST(en.n AS DECIMAL(38,0)) * en.sxx - en.sx * en.sx AS DOUBLE)
      |        / (CAST(en.n AS DOUBLE) * en.n * (en.n - 1))
      |      + CAST(CAST(de.n AS DECIMAL(38,0)) * de.sxx - de.sx * de.sx AS DOUBLE)
      |        / (CAST(de.n AS DOUBLE) * de.n * (de.n - 1))) AS se
      |  FROM (SELECT * FROM m WHERE lang = 'en') en,
      |       (SELECT * FROM m WHERE lang = 'de') de)
      |SELECT n1, n2, round(diff, 6) AS mean_diff, round(se, 6) AS welch_se,
      |  round((diff + 50) / se, 6) AS t_lower,
      |  round((diff - 50) / se, 6) AS t_upper,
      |  CASE WHEN (diff + 50) / se > 1.645 AND (diff - 50) / se < -1.645
      |    THEN 'equivalent_pm50' ELSE 'not_shown_equivalent' END AS verdict
      |FROM j""".stripMargin

  /** C582 join_exists_flag_mark — the MARK JOIN shape (DuckDB's name
    * for EXISTS-as-a-column): every customer exactly once with a
    * boolean has-urgent-order flag, implemented as a left join against
    * the DISTINCT urgent key set (cardinality-safe: the distinct
    * protects the left multiplicity, which a raw left join on the
    * fact would corrupt). Report: segment × flag counts — the
    * standard audience-split readout.
    */
  def joinExistsFlagMark(s: SparkSession, d: String): DataFrame = {
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("mk", lit(1L))
    customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      .join(urgent, Seq("c_custkey"), "left")
      .selectExpr("c_mktsegment", "mk IS NOT NULL AS has_urgent")
      .groupBy("c_mktsegment", "has_urgent")
      .agg(count(lit(1)).cast("long").as("n_customers"))
      .orderBy("c_mktsegment", "has_urgent")
  }
  val joinExistsFlagMarkSql: String =
    """SELECT c_mktsegment,
      |  EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |    AS has_urgent,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer
      |GROUP BY 1, 2 ORDER BY c_mktsegment, has_urgent""".stripMargin

  /** C583 sample_dedup_weighted — duplicate-discounted sampling: each
    * doc weights 1/k (k = its md5 multiplicity), so a cluster's TOTAL
    * selection mass is multiplicity-invariant (the soft-dedup sampler
    * beside C477's soft-dedup weights). With the ES key u^(1/w) the
    * exponent is the INTEGER k — pow(u, k) on the deterministic
    * md5-fraction uniform — and the global top-50 is a TakeOrdered.
    */
  def sampleDedupWeighted(s: SparkSession, d: String): DataFrame = {
    val k = documents(s, d)
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).cast("long").as("k"))
    documents(s, d).select(col("doc_id"), md5(col("text")).as("h"))
      .join(k, "h")
      .withColumn("u", expr(
        "conv(substring(md5(concat('dds:', doc_id)), 1, 6), 16, 10) / 16777216.0"))
      .selectExpr("doc_id", "k", "pow(u, k) AS es")
      .orderBy(col("es").desc, col("doc_id"))
      .limit(50)
      .selectExpr("doc_id", "k AS dup_count", "round(es, 9) AS es_key")
  }
  val sampleDedupWeightedSql: String =
    """WITH kk AS (
      |  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS k
      |  FROM documents GROUP BY 1),
      |keyed AS (
      |  SELECT doc_id, k,
      |    pow(CAST('0x' || substr(md5('dds:' || doc_id), 1, 6) AS BIGINT)
      |      / 16777216.0, k) AS es
      |  FROM documents JOIN kk ON md5(text) = kk.h)
      |SELECT doc_id, k AS dup_count, round(es, 9) AS es_key
      |FROM keyed ORDER BY es DESC, doc_id LIMIT 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio_spectral_centroid" -> (multimodalAudioSpectralCentroid _),
    "stat_tost_equivalence" -> (statTostEquivalence _),
    "join_exists_flag_mark" -> (joinExistsFlagMark _),
    "sample_dedup_weighted" -> (sampleDedupWeighted _),
  )

  val oracle: Map[String, String] = Map(
    "multimodal_audio_spectral_centroid" -> multimodalAudioSpectralCentroidSql,
    "stat_tost_equivalence" -> statTostEquivalenceSql,
    "join_exists_flag_mark" -> joinExistsFlagMarkSql,
    "sample_dedup_weighted" -> sampleDedupWeightedSql,
  )
}
