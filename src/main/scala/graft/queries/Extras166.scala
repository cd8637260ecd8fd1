package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 66 (C668–C671): Bowker symmetry, Lin's CCC, mean-reversion
  * half-life, silence-run census.
  */
object Extras166 {

  /** C668 stat_bowker_symmetry — Bowker's test of symmetry on the
    * square first-item → last-item returnflag transition table (the
    * k×k McNemar): first/last by struct-min/max over the (linenumber,
    * flag) order — linenumbers REPEAT in this synthetic schema, so the
    * flag tie-break is what makes the pick deterministic — the 3×3
    * table exact counts in one pass, χ² =
    * Σ_{i<j}(n_ij−n_ji)²/(n_ij+n_ji) over the BOUNDED pair frame
    * (zero-sum pairs skip), df = 3.
    */
  def statBowkerSymmetry(s: SparkSession, d: String): DataFrame = {
    val fl = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(min(struct(col("l_linenumber"), col("l_returnflag"))).as("fo"),
        max(struct(col("l_linenumber"), col("l_returnflag"))).as("lo"))
      .selectExpr("fo.l_returnflag AS a", "lo.l_returnflag AS b")
    val cells = fl.groupBy("a", "b").agg(count(lit(1)).cast("long").as("n"))
    val pairs = cells.as("x")
      .join(cells.selectExpr("a AS b2", "b AS a2", "n AS m").as("y"),
        expr("x.a = y.a2 AND x.b = y.b2"), "left")
      .filter(expr("x.a < x.b"))
      .selectExpr("x.a AS i", "x.b AS j", "x.n AS nij", "coalesce(y.m, 0L) AS nji")
    pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(expr(
          """CASE WHEN nij + nji > 0
            | THEN CAST(floor(CAST((nij - nji) AS DOUBLE) * (nij - nji)
            |   / (nij + nji) * 1e6 + 0.5) AS BIGINT) ELSE 0L END""".stripMargin))
          .cast("long").as("chi6"))
      .selectExpr("n_pairs",
        "round(CAST(chi6 AS DOUBLE) / 1e6, 4) AS bowker_chi2",
        "CAST(chi6 AS DOUBLE) / 1e6 > 7.815 AS reject_symmetry")
  }
  val statBowkerSymmetrySql: String =
    """WITH fl AS (
      |  SELECT
      |    (min(struct_pack(ln := l_linenumber, f := l_returnflag))).f AS a,
      |    (max(struct_pack(ln := l_linenumber, f := l_returnflag))).f AS b
      |  FROM lineitem GROUP BY l_orderkey),
      |cells AS (
      |  SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM fl GROUP BY 1, 2),
      |pairs AS (
      |  SELECT x.a AS i, x.b AS j, x.n AS nij, coalesce(y.n, 0) AS nji
      |  FROM cells x LEFT JOIN cells y ON x.a = y.b AND x.b = y.a
      |  WHERE x.a < x.b),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN nij + nji > 0
      |      THEN CAST(floor(CAST((nij - nji) AS DOUBLE) * (nij - nji)
      |        / (nij + nji) * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS chi6
      |  FROM pairs)
      |SELECT n_pairs,
      |  round(CAST(chi6 AS DOUBLE) / 1e6, 4) AS bowker_chi2,
      |  CAST(chi6 AS DOUBLE) / 1e6 > 7.815 AS reject_symmetry
      |FROM m""".stripMargin

  /** C669 stat_lin_ccc — Lin's concordance correlation between the
    * order header total and the summed line totals (the method-
    * agreement statistic — is the redundant header column faithful?):
    * one join, all five cleared moments exact DECIMAL one-pass sums,
    * CCC = 2Cxy/(Cxx+Cyy+(Sx−Sy)²) — the n² clearing factor cancels —
    * plus Pearson r and the bias-correction factor Cb = CCC/r.
    */
  def statLinCcc(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"))
    val v = orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"))
      .join(li, Seq("l_orderkey"))
    v.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .selectExpr("n",
        "CAST(n * sxy - sx * sy AS DOUBLE) AS cxy",
        "CAST(n * sxx - sx * sx AS DOUBLE) AS cxx",
        "CAST(n * syy - sy * sy AS DOUBLE) AS cyy",
        "CAST(sx - sy AS DOUBLE) AS dxy")
      .selectExpr("n",
        "round(2 * cxy / (cxx + cyy + dxy * dxy), 6) AS lin_ccc",
        "round(cxy / sqrt(cxx * cyy), 6) AS pearson_r",
        """round((2 * cxy / (cxx + cyy + dxy * dxy))
          |  / (cxy / sqrt(cxx * cyy)), 6) AS bias_factor_cb""".stripMargin)
  }
  val statLinCccSql: String =
    """WITH li AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |v AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x, y
      |  FROM orders JOIN li ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      |  FROM v),
      |c AS (
      |  SELECT n,
      |    CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
      |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
      |    CAST(sx - sy AS DOUBLE) AS dxy
      |  FROM m)
      |SELECT n,
      |  round(2 * cxy / (cxx + cyy + dxy * dxy), 6) AS lin_ccc,
      |  round(cxy / sqrt(cxx * cyy), 6) AS pearson_r,
      |  round((2 * cxy / (cxx + cyy + dxy * dxy))
      |    / (cxy / sqrt(cxx * cyy)), 6) AS bias_factor_cb
      |FROM c""".stripMargin

  /** C670 time_mean_reversion_halflife — the OU half-life −ln2/ln(ρ₁)
    * of daily revenue (the quant screen for "does this series revert
    * or trend"): ρ₁ = C₁/C₀ from denominator-cleared exact DECIMAL
    * autocovariances over the bounded daily frame (one lead, single
    * divisions), half-life only meaningful for 0<ρ₁<1 (flagged).
    */
  def timeMeanReversionHalflife(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("day")
    bars.crossJoin(broadcast(tot))
      .withColumn("x", expr("CAST(n * c - sc AS DECIMAL(38,0))"))
      .withColumn("x1", lead(col("x"), 1).over(w))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("x * x")).as("c0"),
        sum(expr("x * x1")).as("c1"))
      .selectExpr("n_days",
        "CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS rho1")
      .selectExpr("n_days", "round(rho1, 6) AS rho1",
        """CASE WHEN rho1 > 0 AND rho1 < 1
          | THEN round(-ln(2) / ln(rho1), 4) ELSE CAST(NULL AS DOUBLE) END
          |  AS halflife_days""".stripMargin,
        "rho1 > 0 AND rho1 < 1 AS mean_reverting")
  }
  val timeMeanReversionHalflifeSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc
      |  FROM bars),
      |x AS (
      |  SELECT CAST(n * c - sc AS DECIMAL(38,0)) AS x,
      |    lead(CAST(n * c - sc AS DECIMAL(38,0)), 1) OVER (ORDER BY day) AS x1
      |  FROM bars, tot),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x * x1) AS DOUBLE) / CAST(sum(x * x) AS DOUBLE) AS rho1
      |  FROM x)
      |SELECT n_days, round(rho1, 6) AS rho1,
      |  CASE WHEN rho1 > 0 AND rho1 < 1
      |   THEN round(-ln(2) / ln(rho1), 4) ELSE CAST(NULL AS DOUBLE) END
      |    AS halflife_days,
      |  rho1 > 0 AND rho1 < 1 AS mean_reverting
      |FROM m""".stripMargin

  /** Per-doc silence-run partial through the real WAV codec. */
  case class SilenceRuns(doc_id: Long, lang: String, n_runs: Long, longest: Long)

  /** C671 multimodal_silence_runs — quiet-band run detection through
    * the REAL WAV codec (the silence-trimming primitive of audio
    * pipelines): PCM bytes in the documented quiet band (0x61–0x6D)
    * scanned for runs ≥ 4 inside the typed mapPartitions boundary
    * (doc-local sequential scan — bytes never shuffle); per-lang run
    * census. The oracle replays the band as the regex class [a-m]+ on
    * the ASCII fixture.
    */
  def multimodalSilenceRuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = documents(s, d)
      .select(col("doc_id"), col("lang"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, lang, payload) =>
          val pcm = graft.sources.MediaCodec.decodePayload(
            id, graft.sources.MediaCodec.encodeWav(payload))
          var runs = 0L; var longest = 0L; var cur = 0L
          var i = 0
          while (i <= pcm.length) {
            val in = i < pcm.length && {
              val u = pcm(i) & 0xff; u >= 0x61 && u <= 0x6d
            }
            if (in) cur += 1
            else {
              if (cur >= 4) runs += 1
              if (cur > longest) longest = cur
              cur = 0
            }
            i += 1
          }
          SilenceRuns(id, lang, runs, longest)
        }
      }
      .toDF()
    per.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_runs")).cast("long").as("total_runs"),
        max(col("longest")).cast("long").as("longest_run"),
        sum(expr("CASE WHEN n_runs > 0 THEN 1L ELSE 0L END"))
          .cast("long").as("docs_with_runs"))
      .orderBy("lang")
  }
  val multimodalSilenceRunsSql: String =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(coalesce(len(list_filter(
      |      list_transform(regexp_extract_all(text, '[a-m]+'), r -> strlen(r)),
      |      x -> x >= 4)), 0) AS BIGINT) AS n_runs,
      |    CAST(coalesce(list_max(
      |      list_transform(regexp_extract_all(text, '[a-m]+'), r -> strlen(r))), 0)
      |      AS BIGINT) AS longest
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_runs) AS BIGINT) AS total_runs,
      |  CAST(max(longest) AS BIGINT) AS longest_run,
      |  CAST(sum(CASE WHEN n_runs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_runs
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_bowker_symmetry" -> (statBowkerSymmetry _),
    "stat_lin_ccc" -> (statLinCcc _),
    "time_mean_reversion_halflife" -> (timeMeanReversionHalflife _),
    "multimodal_silence_runs" -> (multimodalSilenceRuns _),
  )

  val oracle: Map[String, String] = Map(
    "stat_bowker_symmetry" -> statBowkerSymmetrySql,
    "stat_lin_ccc" -> statLinCccSql,
    "time_mean_reversion_halflife" -> timeMeanReversionHalflifeSql,
    "multimodal_silence_runs" -> multimodalSilenceRunsSql,
  )
}
