package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 145 (C984–C987): the 2×2 epidemiology completions + the
  * Spiegelhalter calibration z — risk ratio with its log CI (C-line
  * odds_ratio quotes OR; cohort questions want RR), attributable
  * risk / NNT, the Agresti–Coull interval beside Wald (completing the
  * C-line Wilson row's binomial-CI family), and the Spiegelhalter
  * z-test of the C955 declared risk score.
  *
  * Exposure × outcome throughout: deep discount (l_discount > 0.05)
  * × returned flag — exact 2×2 cell counts, every derived quantity a
  * deterministic double of exact integers; Spiegelhalter's stratum
  * terms quantize ·10⁶ with the score on the 1e-12 grid (the C955
  * convention).
  */
object Extras245 {

  private def cells2x2(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      sum(expr("CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("a"),
      sum(expr("CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("b"),
      sum(expr("CASE WHEN NOT l_discount > 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("c"),
      sum(expr("CASE WHEN NOT l_discount > 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("dd"))
  private val cells2x2Sql: String =
    """cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS dd
      |  FROM lineitem)""".stripMargin

  /** C984 stat_risk_ratio_ci — the relative risk of return under deep
    * discount with its Katz log CI: RR = p₁/p₀, ln-scale SE =
    * √(1/a − 1/(a+b) + 1/c − 1/(c+d)). The C-line odds_ratio answers
    * the case-control question; cohort data wants THIS ratio — OR
    * overstates RR whenever the outcome isn't rare.
    */
  def statRiskRatioCi(s: SparkSession, d: String): DataFrame =
    cells2x2(s, d)
      .selectExpr("a + b + c + dd AS n",
        "CAST(a AS DOUBLE) / (a + b) AS p1",
        "CAST(c AS DOUBLE) / (c + dd) AS p0",
        """sqrt(CAST(1 AS DOUBLE) / a - CAST(1 AS DOUBLE) / (a + b)
          |  + CAST(1 AS DOUBLE) / c - CAST(1 AS DOUBLE) / (c + dd)) AS se""".stripMargin)
      .selectExpr("n AS n_items", "round(p1 / p0, 6) AS risk_ratio",
        "round(p1 / p0 * exp(-CAST(1.96 AS DOUBLE) * se), 6) AS rr_lo95",
        "round(p1 / p0 * exp(CAST(1.96 AS DOUBLE) * se), 6) AS rr_hi95",
        """(p1 / p0 * exp(-CAST(1.96 AS DOUBLE) * se) > 1
          |  OR p1 / p0 * exp(CAST(1.96 AS DOUBLE) * se) < 1) AS significant""".stripMargin)
  val statRiskRatioCiSql: String =
    s"""WITH $cells2x2Sql,
       |fin AS (
       |  SELECT a + b + c + dd AS n,
       |    CAST(a AS DOUBLE) / (a + b) AS p1,
       |    CAST(c AS DOUBLE) / (c + dd) AS p0,
       |    sqrt(CAST(1 AS DOUBLE) / a - CAST(1 AS DOUBLE) / (a + b)
       |      + CAST(1 AS DOUBLE) / c - CAST(1 AS DOUBLE) / (c + dd)) AS se
       |  FROM cells)
       |SELECT n AS n_items, round(p1 / p0, 6) AS risk_ratio,
       |  round(p1 / p0 * exp(-CAST(1.96 AS DOUBLE) * se), 6) AS rr_lo95,
       |  round(p1 / p0 * exp(CAST(1.96 AS DOUBLE) * se), 6) AS rr_hi95,
       |  (p1 / p0 * exp(-CAST(1.96 AS DOUBLE) * se) > 1
       |    OR p1 / p0 * exp(CAST(1.96 AS DOUBLE) * se) < 1) AS significant
       |FROM fin""".stripMargin

  /** C985 stat_attributable_risk — the public-health arithmetic of the
    * same 2×2: risk difference, attributable fraction among the
    * exposed, the population attributable fraction, and NNT/NNH =
    * 1/|RD| — the absolute-scale numbers a ratio hides ("RR 1.1 of a
    * rare outcome" vs "one extra return per N discounted lines").
    */
  def statAttributableRisk(s: SparkSession, d: String): DataFrame =
    cells2x2(s, d)
      .selectExpr("a + b + c + dd AS n",
        "CAST(a AS DOUBLE) / (a + b) AS p1",
        "CAST(c AS DOUBLE) / (c + dd) AS p0",
        "CAST(a + c AS DOUBLE) / (a + b + c + dd) AS p")
      .selectExpr("n AS n_items",
        "round(p1 - p0, 6) AS risk_difference",
        "round((p1 - p0) / p1, 6) AS af_exposed",
        "round((p - p0) / p, 6) AS paf",
        "round(CAST(1 AS DOUBLE) / abs(p1 - p0), 2) AS nnt_nnh")
  val statAttributableRiskSql: String =
    s"""WITH $cells2x2Sql,
       |fin AS (
       |  SELECT a + b + c + dd AS n,
       |    CAST(a AS DOUBLE) / (a + b) AS p1,
       |    CAST(c AS DOUBLE) / (c + dd) AS p0,
       |    CAST(a + c AS DOUBLE) / (a + b + c + dd) AS p
       |  FROM cells)
       |SELECT n AS n_items,
       |  round(p1 - p0, 6) AS risk_difference,
       |  round((p1 - p0) / p1, 6) AS af_exposed,
       |  round((p - p0) / p, 6) AS paf,
       |  round(CAST(1 AS DOUBLE) / abs(p1 - p0), 2) AS nnt_nnh
       |FROM fin""".stripMargin

  /** C986 stat_agresti_coull — the Agresti–Coull binomial interval for
    * the overall return rate beside the Wald interval it fixes:
    * ñ = n + z², p̃ = (x + z²/2)/ñ, p̃ ± z√(p̃(1−p̃)/ñ). Wald's
    * coverage craters near 0/1; AC is the "add two successes and two
    * failures" fix — with C-line Wilson, the binomial-CI family is
    * complete (Wald / Wilson / AC).
    */
  def statAgrestiCoull(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).cast("long").as("n"),
      sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("x"))
      .selectExpr("n", "x",
        "CAST(x AS DOUBLE) / n AS ph",
        "(x + CAST(3.8416 AS DOUBLE) / 2) / (n + CAST(3.8416 AS DOUBLE)) AS pt",
        "CAST(n AS DOUBLE) + CAST(3.8416 AS DOUBLE) AS nt")
      .selectExpr("n AS n_items", "round(ph, 6) AS p_hat",
        "round(pt - CAST(1.96 AS DOUBLE) * sqrt(pt * (1 - pt) / nt), 6) AS ac_lo95",
        "round(pt + CAST(1.96 AS DOUBLE) * sqrt(pt * (1 - pt) / nt), 6) AS ac_hi95",
        "round(ph - CAST(1.96 AS DOUBLE) * sqrt(ph * (1 - ph) / n), 6) AS wald_lo95",
        "round(ph + CAST(1.96 AS DOUBLE) * sqrt(ph * (1 - ph) / n), 6) AS wald_hi95")
  val statAgrestiCoullSql: String =
    """WITH base AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM lineitem),
      |fin AS (
      |  SELECT n, x, CAST(x AS DOUBLE) / n AS ph,
      |    (x + CAST(3.8416 AS DOUBLE) / 2) / (n + CAST(3.8416 AS DOUBLE)) AS pt,
      |    CAST(n AS DOUBLE) + CAST(3.8416 AS DOUBLE) AS nt
      |  FROM base)
      |SELECT n AS n_items, round(ph, 6) AS p_hat,
      |  round(pt - CAST(1.96 AS DOUBLE) * sqrt(pt * (1 - pt) / nt), 6) AS ac_lo95,
      |  round(pt + CAST(1.96 AS DOUBLE) * sqrt(pt * (1 - pt) / nt), 6) AS ac_hi95,
      |  round(ph - CAST(1.96 AS DOUBLE) * sqrt(ph * (1 - ph) / n), 6) AS wald_lo95,
      |  round(ph + CAST(1.96 AS DOUBLE) * sqrt(ph * (1 - ph) / n), 6) AS wald_hi95
      |FROM fin""".stripMargin

  /** C987 stat_spiegelhalter_z — Spiegelhalter's z calibration test of
    * the C955 declared risk score (p̂ = σ(−0.7 + 3·discount)) over its
    * 11 strata: z = Σ(O − np)(1−2p) / √(Σ np(1−p)(1−2p)²), score on
    * the 1e-12 grid, stratum terms ·10⁶ into exact sums. HL (C955)
    * bins and χ²'s; Spiegelhalter weights by where miscalibration is
    * detectable (p far from ½) — the sharper companion.
    */
  def statSpiegelhalterZ(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("n_g"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("o_g"))
      .withColumn("p", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT) / 1e12"))
      .select(
        expr("CAST(floor((o_g - n_g * p) * (1 - 2 * p) * 1e6 + 0.5) AS BIGINT)").as("numq"),
        expr("CAST(floor(n_g * p * (1 - p) * (1 - 2 * p) * (1 - 2 * p) * 1e6 + 0.5) AS BIGINT)").as("denq"),
        col("n_g"))
    g.agg(sum(col("n_g")).cast("long").as("n"),
      sum(col("numq")).cast("long").as("sn"),
      sum(col("denq")).cast("long").as("sd"))
      .selectExpr("n AS n_items",
        "round(CAST(sn AS DOUBLE) / 1e6 / sqrt(CAST(sd AS DOUBLE) / 1e6), 4) AS spiegelhalter_z",
        "abs(CAST(sn AS DOUBLE) / 1e6 / sqrt(CAST(sd AS DOUBLE) / 1e6)) <= 1.96 AS well_calibrated")
  }
  val statSpiegelhalterZSql: String =
    """WITH g AS (
      |  SELECT l_discount AS x, CAST(count(*) AS BIGINT) AS n_g,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS o_g
      |  FROM lineitem GROUP BY 1),
      |scored AS (
      |  SELECT n_g, o_g,
      |    CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT) / 1e12 AS p
      |  FROM g),
      |terms AS (
      |  SELECT n_g,
      |    CAST(floor((o_g - n_g * p) * (1 - 2 * p) * 1e6 + 0.5) AS BIGINT) AS numq,
      |    CAST(floor(n_g * p * (1 - p) * (1 - 2 * p) * (1 - 2 * p) * 1e6 + 0.5) AS BIGINT) AS denq
      |  FROM scored)
      |SELECT CAST(sum(n_g) AS BIGINT) AS n_items,
      |  round(CAST(CAST(sum(numq) AS BIGINT) AS DOUBLE) / 1e6
      |    / sqrt(CAST(CAST(sum(denq) AS BIGINT) AS DOUBLE) / 1e6), 4) AS spiegelhalter_z,
      |  abs(CAST(CAST(sum(numq) AS BIGINT) AS DOUBLE) / 1e6
      |    / sqrt(CAST(CAST(sum(denq) AS BIGINT) AS DOUBLE) / 1e6)) <= 1.96 AS well_calibrated
      |FROM terms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_risk_ratio_ci" -> (statRiskRatioCi _),
    "stat_attributable_risk" -> (statAttributableRisk _),
    "stat_agresti_coull" -> (statAgrestiCoull _),
    "stat_spiegelhalter_z" -> (statSpiegelhalterZ _),
  )

  val oracle: Map[String, String] = Map(
    "stat_risk_ratio_ci" -> statRiskRatioCiSql,
    "stat_attributable_risk" -> statAttributableRiskSql,
    "stat_agresti_coull" -> statAgrestiCoullSql,
    "stat_spiegelhalter_z" -> statSpiegelhalterZSql,
  )
}
