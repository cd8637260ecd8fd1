package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 113 (C856–C859): resampling-free uncertainty + robust shape +
  * dispersion geometry + n-gram novelty — the jackknife skewness CI in
  * one pass, Bowley/Moors quantile skewness, the Gini mean difference
  * as exact rank algebra, and the trigram novelty curve.
  *
  * Shared discipline: delete-one statistics come from GLOBAL exact
  * moment sums re-evaluated per row (O(1) per row, no resampling
  * shuffle), quantized ·10⁹ before the corpus reduction; order
  * statistics and rank weights ride GlobalRank; the novelty deciles
  * reuse the provable clamp idiom.
  */
object Extras213 {

  /** C856 stat_jackknife_skew_ci — the delete-one jackknife CI for the
    * skewness of order totals WITHOUT resampling: exact Σx, Σx², Σx³
    * (DECIMAL cents), each row's leave-one-out skewness recomputed
    * from the global sums in O(1), quantized ·10⁹ before the exact
    * (Σq, Σq²) reduction, SE² = (n−1)/n·Σ(θ₋ᵢ−θ̄)². The uncertainty
    * attachment for every moment-based shape row — one corpus pass,
    * zero bootstrap shuffles.
    */
  def statJackknifeSkewCi(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"))
    val mom = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("s1"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("s2"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).cast("decimal(38,0)").as("s3"))
    def skew(nE: String, s1E: String, s2E: String, s3E: String): String =
      s"""((($s3E) - 3 * (($s1E) / ($nE)) * ($s2E)
         |  + 2 * ($nE) * (($s1E) / ($nE)) * (($s1E) / ($nE)) * (($s1E) / ($nE))) / ($nE))
         |/ pow((($s2E) - ($nE) * (($s1E) / ($nE)) * (($s1E) / ($nE))) / ($nE), 1.5)""".stripMargin
    val theta = skew("CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)",
      "CAST(s2 AS DOUBLE)", "CAST(s3 AS DOUBLE)")
    val thetaI = skew("CAST(n - 1 AS DOUBLE)", "(CAST(s1 AS DOUBLE) - x)",
      "(CAST(s2 AS DOUBLE) - CAST(x AS DOUBLE) * x)",
      "(CAST(s3 AS DOUBLE) - CAST(x AS DOUBLE) * x * x)")
    val qs = base.crossJoin(broadcast(mom))
      .select(expr(s"CAST(floor(($thetaI) * 1e9 + 0.5) AS BIGINT)").as("tq"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("tq")).cast("decimal(38,0)").as("sq"),
        sum(expr("CAST(tq AS DECIMAL(38,0)) * tq")).cast("decimal(38,0)").as("sqq"))
    // qs.n equals mom.n (same corpus count), so theta's n reference
    // binds to the qs column with the identical value
    qs.crossJoin(broadcast(mom.select(col("s1"), col("s2"), col("s3"))))
      .selectExpr("n",
        s"round($theta, 6) AS skew",
        """round(sqrt((CAST(n AS DOUBLE) - 1) / n
          |  * (CAST(sqq AS DOUBLE) / 1e18
          |     - (CAST(sq AS DOUBLE) / 1e9) * (CAST(sq AS DOUBLE) / 1e9) / n)), 6)
          |AS jk_se""".stripMargin)
      .selectExpr("n", "skew", "jk_se",
        "round(skew - 1.96 * jk_se, 6) AS ci_lo",
        "round(skew + 1.96 * jk_se, 6) AS ci_hi")
  }
  val statJackknifeSkewCiSql: String = {
    def skew(nE: String, s1E: String, s2E: String, s3E: String): String =
      s"""((($s3E) - 3 * (($s1E) / ($nE)) * ($s2E)
         |  + 2 * ($nE) * (($s1E) / ($nE)) * (($s1E) / ($nE)) * (($s1E) / ($nE))) / ($nE))
         |/ pow((($s2E) - ($nE) * (($s1E) / ($nE)) * (($s1E) / ($nE))) / ($nE), 1.5)""".stripMargin
    val theta = skew("CAST(n0 AS DOUBLE)", "CAST(s1 AS DOUBLE)",
      "CAST(s2 AS DOUBLE)", "CAST(s3 AS DOUBLE)")
    val thetaI = skew("CAST(m.n - 1 AS DOUBLE)", "(CAST(m.s1 AS DOUBLE) - b.x)",
      "(CAST(m.s2 AS DOUBLE) - CAST(b.x AS DOUBLE) * b.x)",
      "(CAST(m.s3 AS DOUBLE) - CAST(b.x AS DOUBLE) * b.x * b.x)")
    s"""WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x FROM orders),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(CAST(x AS HUGEINT) * x * x) AS DECIMAL(38,0)) AS s3
      |  FROM base),
      |qs AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(tq) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(CAST(tq AS HUGEINT) * tq) AS DECIMAL(38,0)) AS sqq
      |  FROM (
      |    SELECT CAST(floor(($thetaI) * 1e9 + 0.5) AS BIGINT) AS tq
      |    FROM base b, mom m)),
      |fin AS (
      |  SELECT q.n, round($theta, 6) AS skew,
      |    round(sqrt((CAST(q.n AS DOUBLE) - 1) / q.n
      |      * (CAST(q.sqq AS DOUBLE) / 1e18
      |         - (CAST(q.sq AS DOUBLE) / 1e9) * (CAST(q.sq AS DOUBLE) / 1e9) / q.n)), 6) AS jk_se
      |  FROM qs q, (SELECT n AS n0, s1, s2, s3 FROM mom) m0)
      |SELECT n, skew, jk_se,
      |  round(skew - 1.96 * jk_se, 6) AS ci_lo,
      |  round(skew + 1.96 * jk_se, 6) AS ci_hi
      |FROM fin""".stripMargin
  }

  /** C857 stat_bowley_skewness — quantile-based shape without moments:
    * Bowley (quartile) skewness (Q3+Q1−2·Q2)/(Q3−Q1) and the Moors
    * octile kurtosis ((O7−O5)+(O3−O1))/(O6−O2), all order statistics
    * exact type-1 quantiles from ONE GlobalRank pass pivoted to a
    * broadcast row. The outlier-immune siblings of the moment
    * skew/kurtosis rows — robust to every value in the top percentile.
    */
  def statBowleySkewness(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "rn", "nn", Seq(col("cv").asc, col("okey").asc))
    def oct(j: Int) = s"min(CASE WHEN rn = CAST(ceil($j * 0.125 * nn) AS BIGINT) THEN cv END)"
    ranked
      .filter(expr((1 to 7).map(j =>
        s"rn = CAST(ceil($j * 0.125 * nn) AS BIGINT)").mkString(" OR ")))
      .agg(expr(oct(1)).as("o1"), expr(oct(2)).as("o2"), expr(oct(3)).as("o3"),
        expr(oct(4)).as("o4"), expr(oct(5)).as("o5"), expr(oct(6)).as("o6"),
        expr(oct(7)).as("o7"), max(col("nn")).as("n"))
      .selectExpr("n",
        "round(CAST(o2 AS DOUBLE) / 100, 2) AS q1",
        "round(CAST(o4 AS DOUBLE) / 100, 2) AS median",
        "round(CAST(o6 AS DOUBLE) / 100, 2) AS q3",
        """round((CAST(o6 AS DOUBLE) + o2 - 2.0 * o4)
          |/ (CAST(o6 AS DOUBLE) - o2), 6) AS bowley_skew""".stripMargin,
        """round(((CAST(o7 AS DOUBLE) - o5) + (CAST(o3 AS DOUBLE) - o1))
          |/ (CAST(o6 AS DOUBLE) - o2), 6) AS moors_kurtosis""".stripMargin)
  }
  val statBowleySkewnessSql: String = {
    def oct(j: Int) = s"min(CASE WHEN rn = CAST(ceil($j * 0.125 * nn) AS BIGINT) THEN cv END)"
    s"""WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS rn,
      |    count(*) OVER () AS nn
      |  FROM base),
      |px AS (
      |  SELECT ${oct(1)} AS o1, ${oct(2)} AS o2, ${oct(3)} AS o3, ${oct(4)} AS o4,
      |    ${oct(5)} AS o5, ${oct(6)} AS o6, ${oct(7)} AS o7,
      |    CAST(max(nn) AS BIGINT) AS n
      |  FROM ranked
      |  WHERE ${(1 to 7).map(j => s"rn = CAST(ceil($j * 0.125 * nn) AS BIGINT)").mkString(" OR ")})
      |SELECT n,
      |  round(CAST(o2 AS DOUBLE) / 100, 2) AS q1,
      |  round(CAST(o4 AS DOUBLE) / 100, 2) AS median,
      |  round(CAST(o6 AS DOUBLE) / 100, 2) AS q3,
      |  round((CAST(o6 AS DOUBLE) + o2 - 2.0 * o4) / (CAST(o6 AS DOUBLE) - o2), 6) AS bowley_skew,
      |  round(((CAST(o7 AS DOUBLE) - o5) + (CAST(o3 AS DOUBLE) - o1))
      |    / (CAST(o6 AS DOUBLE) - o2), 6) AS moors_kurtosis
      |FROM px""".stripMargin
  }

  /** C858 stat_gini_mean_difference — the Gini mean difference
    * Δ = Σᵢⱼ|xᵢ−xⱼ|/(n(n−1)) of order totals as EXACT rank algebra
    * (never the n² pair sum): with ranks i from GlobalRank,
    * Σᵢⱼ|xᵢ−xⱼ| = 2·Σᵢ(2i−n−1)·x₍ᵢ₎ — one DECIMAL reduction. Emits Δ
    * in dollars, the relative GMD Δ/μ, and the implied Gini Δ/(2μ).
    * The scale estimator that is 98%-efficient at the normal but
    * finite for any distribution with a mean — complements the
    * moment-based sd and the Lorenz rows.
    */
  def statGiniMeanDifference(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "i", "nn", Seq(col("cv").asc, col("okey").asc))
    ranked.agg(max(col("nn")).as("n"),
        sum(expr("CAST(2 * i - nn - 1 AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("w"),
        sum(col("cv")).cast("decimal(38,0)").as("sx"))
      .selectExpr("n",
        """round(2.0 * CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) / 100, 2)
          |AS gmd_dollars""".stripMargin,
        """round(2.0 * CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
          |/ (CAST(sx AS DOUBLE) / n), 6) AS relative_gmd""".stripMargin,
        """round(CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
          |/ (CAST(sx AS DOUBLE) / n), 6) AS gini""".stripMargin)
  }
  val statGiniMeanDifferenceSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS i,
      |    count(*) OVER () AS nn
      |  FROM base),
      |ag AS (
      |  SELECT CAST(max(nn) AS BIGINT) AS n,
      |    CAST(sum(CAST(2 * i - nn - 1 AS HUGEINT) * cv) AS DECIMAL(38,0)) AS w,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS sx
      |  FROM ranked)
      |SELECT n,
      |  round(2.0 * CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) / 100, 2) AS gmd_dollars,
      |  round(2.0 * CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
      |    / (CAST(sx AS DOUBLE) / n), 6) AS relative_gmd,
      |  round(CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
      |    / (CAST(sx AS DOUBLE) / n), 6) AS gini
      |FROM ag""".stripMargin

  /** C859 text_trigram_novelty — the word-trigram novelty curve: each
    * distinct trigram's FIRST document, new trigrams bucketed by
    * corpus-position decile (the provable clamp idiom), cumulative
    * distinct trigrams per decile. Trigram novelty saturates far
    * SLOWER than vocabulary (C695) — the curve pair is the
    * repetition-vs-composition diagnostic for dedup threshold tuning.
    */
  def textTrigramNovelty(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).count()
    val tg = documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("a"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(a) >= 3 THEN
          |  transform(sequence(1, size(a) - 2),
          |    i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1), element_at(a, i + 2)))
          |ELSE array() END""".stripMargin)).as("tg"))
      .groupBy("tg").agg(min(col("doc_id")).as("first_doc"))
    val perBucket = tg
      .groupBy(expr(s"least(greatest(first_doc * 10 div $nDocs, 0L), 9L)").as("decile"))
      .agg(count(lit(1)).cast("long").as("new_trigrams"))
    val wp = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("cum_trigrams", sum(col("new_trigrams")).over(wp).cast("long"))
      .orderBy("decile")
      .selectExpr("CAST(decile AS BIGINT) AS decile", "new_trigrams", "cum_trigrams")
  }
  val textTrigramNoveltySql: String =
    """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS a FROM documents),
      |tg AS (
      |  SELECT t.tg, min(toks.doc_id) AS first_doc
      |  FROM toks, LATERAL (
      |    SELECT unnest(list_transform(generate_series(1, greatest(len(a) - 2, 0)),
      |      i -> a[i] || ' ' || a[i + 1] || ' ' || a[i + 2])) AS tg) t
      |  GROUP BY 1),
      |perbucket AS (
      |  SELECT least(greatest(first_doc * 10 // n, 0), 9) AS decile,
      |    CAST(count(*) AS BIGINT) AS new_trigrams
      |  FROM tg, nd GROUP BY 1)
      |SELECT CAST(decile AS BIGINT) AS decile, new_trigrams,
      |  CAST(sum(new_trigrams) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_trigrams
      |FROM perbucket ORDER BY decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_jackknife_skew_ci" -> (statJackknifeSkewCi _),
    "stat_bowley_skewness" -> (statBowleySkewness _),
    "stat_gini_mean_difference" -> (statGiniMeanDifference _),
    "text_trigram_novelty" -> (textTrigramNovelty _),
  )

  val oracle: Map[String, String] = Map(
    "stat_jackknife_skew_ci" -> statJackknifeSkewCiSql,
    "stat_bowley_skewness" -> statBowleySkewnessSql,
    "stat_gini_mean_difference" -> statGiniMeanDifferenceSql,
    "text_trigram_novelty" -> textTrigramNoveltySql,
  )
}
