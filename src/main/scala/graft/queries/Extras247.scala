package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 147 (C992–C995): the scorecard-quality battery for the C955
  * declared risk model (p̂ = σ(−0.7 + 3·discount), outcome = returned)
  * — Tjur's discrimination R², McFadden's likelihood R², the logistic
  * recalibration slope/intercept (calibration-in-the-large), and the
  * AUC/Gini/KS discrimination trio. Together with C955 (HL), C987
  * (Spiegelhalter) and pipeline_calibration_ece, this is the complete
  * model-validation report a deployed score owes.
  *
  * Shared discipline: the score lives on the 1e-12 grid (C955
  * convention); Tjur/AUC numerators are EXACT integer sums over the 11
  * strata (o_g·pq products in DECIMAL, doubled-rank AUC); log-
  * likelihood and Newton terms quantize ·10⁶ per stratum; the
  * recalibration Newton carries β on the 1e-12 grid and μ on 1e-9
  * (the C966/C971 machinery with an offset regressor).
  */
object Extras247 {

  /** The 11-stratum frame: score quantile pq (1e-12 grid), n, events. */
  private def strata(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("og"))
      .withColumn("pq", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
  private val strataSql: String =
    """g AS (
      |  SELECT l_discount AS x, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og,
      |    CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount))) + 0.5) AS BIGINT) AS pq
      |  FROM lineitem GROUP BY 1)""".stripMargin

  /** C992 stat_tjur_r2 — Tjur's coefficient of discrimination: the
    * mean fitted probability among events minus among non-events,
    * from EXACT o_g·pq integer sums. The R² a logistic model can
    * explain to a stakeholder — "scores average X points higher when
    * the thing happens".
    */
  def statTjurR2(s: SparkSession, d: String): DataFrame =
    strata(s, d).agg(
      sum(col("og")).cast("long").as("o"),
      sum(expr("ng - og")).cast("long").as("z"),
      sum(expr("CAST(og AS DECIMAL(38,0)) * pq")).cast("decimal(38,0)").as("sp1"),
      sum(expr("CAST(ng - og AS DECIMAL(38,0)) * pq")).cast("decimal(38,0)").as("sp0"))
      .selectExpr("o + z AS n_items",
        "round(CAST(sp1 AS DOUBLE) / o / 1e12, 6) AS mean_p_events",
        "round(CAST(sp0 AS DOUBLE) / z / 1e12, 6) AS mean_p_nonevents",
        "round(CAST(sp1 AS DOUBLE) / o / 1e12 - CAST(sp0 AS DOUBLE) / z / 1e12, 6) AS tjur_r2")
  val statTjurR2Sql: String =
    s"""WITH $strataSql,
       |agg AS (
       |  SELECT CAST(sum(og) AS BIGINT) AS o, CAST(sum(ng - og) AS BIGINT) AS z,
       |    CAST(sum(CAST(og AS HUGEINT) * pq) AS DECIMAL(38,0)) AS sp1,
       |    CAST(sum(CAST(ng - og AS HUGEINT) * pq) AS DECIMAL(38,0)) AS sp0
       |  FROM g)
       |SELECT o + z AS n_items,
       |  round(CAST(sp1 AS DOUBLE) / o / 1e12, 6) AS mean_p_events,
       |  round(CAST(sp0 AS DOUBLE) / z / 1e12, 6) AS mean_p_nonevents,
       |  round(CAST(sp1 AS DOUBLE) / o / 1e12 - CAST(sp0 AS DOUBLE) / z / 1e12, 6) AS tjur_r2
       |FROM agg""".stripMargin

  /** C993 stat_mcfadden_r2 — McFadden's pseudo-R² of the declared
    * score against the base-rate null: LL terms o·ln p + (n−o)·ln(1−p)
    * quantized ·10⁶ per stratum, the null from the exact overall rate
    * on the same grid. The likelihood-scale improvement the Tjur gap
    * (C992) shows on the probability scale.
    */
  def statMcfaddenR2(s: SparkSession, d: String): DataFrame = {
    val base = strata(s, d)
      .crossJoin(broadcast(lineitem(s, d).agg(
        count(lit(1)).cast("long").as("nt"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("ot"))))
      .withColumn("p", expr("pq / 1e12"))
      .withColumn("p0", expr(
        "CAST(floor(CAST(ot AS DOUBLE) / nt * 1e12 + 0.5) AS BIGINT) / 1e12"))
    base.agg(max(col("nt")).as("n"),
      sum(expr("CAST(floor((og * ln(p) + (ng - og) * ln(1 - p)) * 1e6 + 0.5) AS BIGINT)"))
        .cast("long").as("llq"),
      sum(expr("CAST(floor((og * ln(p0) + (ng - og) * ln(1 - p0)) * 1e6 + 0.5) AS BIGINT)"))
        .cast("long").as("ll0q"))
      .selectExpr("n AS n_items",
        "round(CAST(llq AS DOUBLE) / 1e6, 2) AS loglik_model",
        "round(CAST(ll0q AS DOUBLE) / 1e6, 2) AS loglik_null",
        "round(1 - CAST(llq AS DOUBLE) / CAST(ll0q AS DOUBLE), 6) AS mcfadden_r2")
  }
  val statMcfaddenR2Sql: String =
    s"""WITH $strataSql,
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nt,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ot
       |  FROM lineitem),
       |base AS (
       |  SELECT ng, og, pq / 1e12 AS p,
       |    CAST(floor(CAST(ot AS DOUBLE) / nt * 1e12 + 0.5) AS BIGINT) / 1e12 AS p0, nt
       |  FROM g, tot),
       |agg AS (
       |  SELECT max(nt) AS n,
       |    CAST(sum(CAST(floor((og * ln(p) + (ng - og) * ln(1 - p)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS llq,
       |    CAST(sum(CAST(floor((og * ln(p0) + (ng - og) * ln(1 - p0)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ll0q
       |  FROM base)
       |SELECT n AS n_items,
       |  round(CAST(llq AS DOUBLE) / 1e6, 2) AS loglik_model,
       |  round(CAST(ll0q AS DOUBLE) / 1e6, 2) AS loglik_null,
       |  round(1 - CAST(llq AS DOUBLE) / CAST(ll0q AS DOUBLE), 6) AS mcfadden_r2
       |FROM agg""".stripMargin

  /** C994 stat_calibration_slope — the logistic recalibration fit
    * y ~ a + b·logit(p̂): six Newton steps on the 11 strata with the
    * offset regressor lg = logit(p̂) on the 1e-12 grid, μ on 1e-9,
    * terms ·10⁶ (the C966/C971 machinery). b < 1 = the score is
    * overconfident, a ≠ 0 = miscalibrated-in-the-large — the two
    * numbers external-validation papers lead with.
    */
  def statCalibrationSlope(s: SparkSession, d: String): DataFrame = {
    val g = strata(s, d)
      .selectExpr("ng", "og",
        """CAST(floor(ln((pq / 1e12) / (1 - pq / 1e12)) * 1e12 + 0.5) AS BIGINT) / 1e12 AS lg""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._3)
    val n = g.map(_._1).sum
    def q12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    var a = 0.0; var b = 1.0
    for (_ <- 1 to 6) {
      var g1 = BigInt(0); var g2 = BigInt(0)
      var f11 = BigInt(0); var f12 = BigInt(0); var f22 = BigInt(0)
      g.foreach { case (ng, og, lg) =>
        val muq = math.min(math.max(
          math.floor(1e9 / (1 + math.exp(-(a + b * lg))) + 0.5).toLong, 1L), 999999999L)
        val mu = muq / 1e9
        g1 += BigInt(math.floor((og - ng * mu) * 1e6 + 0.5).toLong)
        g2 += BigInt(math.floor((og - ng * mu) * lg * 1e6 + 0.5).toLong)
        f11 += BigInt(math.floor(ng * mu * (1 - mu) * 1e6 + 0.5).toLong)
        f12 += BigInt(math.floor(ng * mu * (1 - mu) * lg * 1e6 + 0.5).toLong)
        f22 += BigInt(math.floor(ng * mu * (1 - mu) * lg * lg * 1e6 + 0.5).toLong)
      }
      val (d1, d2) = (g1.toDouble / 1e6, g2.toDouble / 1e6)
      val (a11, a12, a22) = (f11.toDouble / 1e6, f12.toDouble / 1e6, f22.toDouble / 1e6)
      val det = a11 * a22 - a12 * a12
      a = q12(a + (a22 * d1 - a12 * d2) / det)
      b = q12(b + (-a12 * d1 + a11 * d2) / det)
    }
    import s.implicits._
    Seq((n, a, b)).toDF("n0", "a", "b")
      .selectExpr("n0 AS n_items", "round(a, 6) AS calibration_intercept",
        "round(b, 6) AS calibration_slope",
        "CASE WHEN b < CAST(0.9 AS DOUBLE) THEN 'overconfident' " +
          "WHEN b > CAST(1.1 AS DOUBLE) THEN 'underconfident' ELSE 'ok' END AS verdict")
  }
  val statCalibrationSlopeSql: String = {
    def step(prev: String, next: String): String = {
      val mu = s"least(greatest(CAST(floor(1e9 / (1 + exp(-(a + b * lg))) + 0.5) AS BIGINT), 1), 999999999)"
      s"""s$next AS (
         |  SELECT
         |    CAST(sum(CAST(floor((og - ng * ($mu / 1e9)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS g1,
         |    CAST(sum(CAST(floor((og - ng * ($mu / 1e9)) * lg * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS g2,
         |    CAST(sum(CAST(floor(ng * ($mu / 1e9) * (1 - $mu / 1e9) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f11,
         |    CAST(sum(CAST(floor(ng * ($mu / 1e9) * (1 - $mu / 1e9) * lg * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f12,
         |    CAST(sum(CAST(floor(ng * ($mu / 1e9) * (1 - $mu / 1e9) * lg * lg * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f22
         |  FROM lg, b$prev),
         |b$next AS (
         |  SELECT
         |    floor((a + ((CAST(f22 AS DOUBLE) / 1e6) * (CAST(g1 AS DOUBLE) / 1e6)
         |      - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(g2 AS DOUBLE) / 1e6))
         |      / ((CAST(f11 AS DOUBLE) / 1e6) * (CAST(f22 AS DOUBLE) / 1e6)
         |        - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(f12 AS DOUBLE) / 1e6))) * 1e12 + 0.5) / 1e12 AS a,
         |    floor((b + (-(CAST(f12 AS DOUBLE) / 1e6) * (CAST(g1 AS DOUBLE) / 1e6)
         |      + (CAST(f11 AS DOUBLE) / 1e6) * (CAST(g2 AS DOUBLE) / 1e6))
         |      / ((CAST(f11 AS DOUBLE) / 1e6) * (CAST(f22 AS DOUBLE) / 1e6)
         |        - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(f12 AS DOUBLE) / 1e6))) * 1e12 + 0.5) / 1e12 AS b
         |  FROM b$prev, s$next)""".stripMargin
    }
    s"""WITH $strataSql,
       |lg AS (
       |  SELECT ng, og,
       |    CAST(floor(ln((pq / 1e12) / (1 - pq / 1e12)) * 1e12 + 0.5) AS BIGINT) / 1e12 AS lg
       |  FROM g),
       |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM g),
       |b0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(1 AS DOUBLE) AS b),
       |${step("0", "1")},
       |${step("1", "2")},
       |${step("2", "3")},
       |${step("3", "4")},
       |${step("4", "5")},
       |${step("5", "6")}
       |SELECT n AS n_items, round(a, 6) AS calibration_intercept,
       |  round(b, 6) AS calibration_slope,
       |  CASE WHEN b < CAST(0.9 AS DOUBLE) THEN 'overconfident'
       |    WHEN b > CAST(1.1 AS DOUBLE) THEN 'underconfident' ELSE 'ok' END AS verdict
       |FROM b6, tot""".stripMargin
  }

  /** C995 stat_auc_gini — the discrimination trio of the declared
    * score: tie-aware AUC from the exact doubled rank sum over the 11
    * ascending score strata (2·num = Σ o_g·(2·cumZ_before + z_g)),
    * Gini = 2·AUC − 1, and the scorecard KS = max |F₁ − F₀| as an
    * exact integer max of |cumO·Z − cumZ·O|. The numbers a model
    * go/no-go review quotes before anything else.
    */
  def statAucGini(s: SparkSession, d: String): DataFrame = {
    val g = strata(s, d).selectExpr("pq", "ng", "og", "ng - og AS zg")
    // the 11-value discount strata are a bounded frame: one shared
    // single-task WindowExec replaces two full GlobalRank machineries
    // (r14 optimization; plan-gate legal via the l_discount grouping)
    val spine = graft.plans.BoundedPrefix.prefixSums(
      g, Seq((col("zg"), "cumz"), (col("og"), "cumo")), Seq(col("pq").asc))
    val tot = g.agg(sum(col("og")).cast("long").as("o"),
      sum(col("zg")).cast("long").as("z"))
    spine.crossJoin(broadcast(tot))
      .agg(max(col("o")).as("o"), max(col("z")).as("z"),
        sum(expr("CAST(og AS DECIMAL(38,0)) * (2 * cumz + zg)")).cast("decimal(38,0)").as("num2"),
        max(expr(
          """abs(CAST(cumo + og AS DECIMAL(38,0)) * z
            |- CAST(cumz + zg AS DECIMAL(38,0)) * o)""".stripMargin)).as("ksn"))
      .selectExpr("o + z AS n_items",
        "round(CAST(num2 AS DOUBLE) / 2 / (CAST(o AS DOUBLE) * z), 6) AS auc",
        "round(CAST(num2 AS DOUBLE) / (CAST(o AS DOUBLE) * z) - 1, 6) AS gini",
        "round(CAST(ksn AS DOUBLE) / (CAST(o AS DOUBLE) * z), 6) AS ks_stat")
  }
  val statAucGiniSql: String =
    s"""WITH $strataSql,
       |spine AS (
       |  SELECT pq, ng, og, ng - og AS zg,
       |    CAST(coalesce(sum(ng - og) OVER (ORDER BY pq
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumz,
       |    CAST(coalesce(sum(og) OVER (ORDER BY pq
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumo
       |  FROM g),
       |tot AS (SELECT CAST(sum(og) AS BIGINT) AS o,
       |  CAST(sum(ng - og) AS BIGINT) AS z FROM g),
       |agg AS (
       |  SELECT max(o) AS o, max(z) AS z,
       |    CAST(sum(CAST(og AS HUGEINT) * (2 * cumz + zg)) AS DECIMAL(38,0)) AS num2,
       |    CAST(max(abs(CAST(cumo + og AS HUGEINT) * z
       |      - CAST(cumz + zg AS HUGEINT) * o)) AS DECIMAL(38,0)) AS ksn
       |  FROM spine, tot)
       |SELECT o + z AS n_items,
       |  round(CAST(num2 AS DOUBLE) / 2 / (CAST(o AS DOUBLE) * z), 6) AS auc,
       |  round(CAST(num2 AS DOUBLE) / (CAST(o AS DOUBLE) * z) - 1, 6) AS gini,
       |  round(CAST(ksn AS DOUBLE) / (CAST(o AS DOUBLE) * z), 6) AS ks_stat
       |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_tjur_r2" -> (statTjurR2 _),
    "stat_mcfadden_r2" -> (statMcfaddenR2 _),
    "stat_calibration_slope" -> (statCalibrationSlope _),
    "stat_auc_gini" -> (statAucGini _),
  )

  val oracle: Map[String, String] = Map(
    "stat_tjur_r2" -> statTjurR2Sql,
    "stat_mcfadden_r2" -> statMcfaddenR2Sql,
    "stat_calibration_slope" -> statCalibrationSlopeSql,
    "stat_auc_gini" -> statAucGiniSql,
  )
}
