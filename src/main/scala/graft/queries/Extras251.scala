package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 151 (C1020–C1027): clinical decision analytics (net-benefit
  * decision curve, NRI/IDI model comparison), circular ANOVA
  * (Watson–Williams), the Moses extreme-reactions test, the
  * Phillips–Perron unit root (Newey–West long-run variance), the
  * small-world sigma on the deterministic user graph, the Supertrend
  * indicator (two-band integer state machine), and a z-order
  * storage-locality exhibit.
  *
  * Shared discipline: scorecard probabilities ride the C955 1e-12
  * grid so every threshold/class decision is an exact integer
  * comparison; circular cos/sin terms quantize ·1e12 on the bounded
  * 366-day frame; PP residuals quantize onto the cent grid before the
  * exact autocovariance sums; the Supertrend carries ALL state (ATR
  * grid, final bands, direction, prev close) as integers — driver walk
  * + recursive-CTE oracle; z-values are pure integer bit arithmetic
  * (DIV/% — no engine-specific shift operators).
  */
object Extras251 {

  // ---------------------------------------------------------------- C1020
  /** stat_decision_curve — the decision-curve net benefit of the C955
    * scorecard at thresholds 0.10–0.50: NB(pt) = TP/n − FP/n·pt/(1−pt)
    * against treat-all and treat-none. Classification p ≥ pt is an
    * exact integer comparison on the 1e-12 score grid vs integer
    * pt·1e12 literals; one output row per threshold. THE figure a
    * clinical/risk deployment quotes before switching on a model.
    */
  def statDecisionCurve(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("og"))
      .withColumn("pq", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
    val tot = g.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("og")).cast("long").as("o"))
    g.crossJoin(broadcast(tot))
      .withColumn("pt100", explode(array(
        lit(10L), lit(20L), lit(30L), lit(40L), lit(50L))))
      .groupBy("pt100", "n", "o")
      .agg(sum(expr("CASE WHEN pq >= pt100 * CAST(1e10 AS BIGINT) THEN og ELSE 0L END"))
          .cast("long").as("tp"),
        sum(expr("CASE WHEN pq >= pt100 * CAST(1e10 AS BIGINT) THEN ng - og ELSE 0L END"))
          .cast("long").as("fp"))
      .selectExpr("round(CAST(pt100 AS DOUBLE) / 100, 2) AS pt", "tp", "fp",
        """round(CAST(tp AS DOUBLE) / n
          |- CAST(fp AS DOUBLE) / n * (CAST(pt100 AS DOUBLE) / 100)
          |  / (1 - CAST(pt100 AS DOUBLE) / 100), 6) AS nb_model""".stripMargin,
        """round(CAST(o AS DOUBLE) / n
          |- (1 - CAST(o AS DOUBLE) / n) * (CAST(pt100 AS DOUBLE) / 100)
          |  / (1 - CAST(pt100 AS DOUBLE) / 100), 6) AS nb_treat_all""".stripMargin)
      .orderBy("pt")
  }
  val statDecisionCurveSql: String =
    """WITH g AS (
      |  SELECT CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount))) + 0.5) AS BIGINT) AS pq,
      |    CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og
      |  FROM lineitem GROUP BY l_discount),
      |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(og) AS BIGINT) AS o FROM g),
      |pt AS (SELECT CAST(unnest([10, 20, 30, 40, 50]) AS BIGINT) AS pt100),
      |cls AS (
      |  SELECT pt100, max(n) AS n, max(o) AS o,
      |    CAST(sum(CASE WHEN pq >= pt100 * CAST(1e10 AS BIGINT) THEN og ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN pq >= pt100 * CAST(1e10 AS BIGINT) THEN ng - og ELSE 0 END) AS BIGINT) AS fp
      |  FROM g, tot, pt GROUP BY pt100)
      |SELECT round(CAST(pt100 AS DOUBLE) / 100, 2) AS pt, tp, fp,
      |  round(CAST(tp AS DOUBLE) / n
      |  - CAST(fp AS DOUBLE) / n * (CAST(pt100 AS DOUBLE) / 100)
      |    / (1 - CAST(pt100 AS DOUBLE) / 100), 6) AS nb_model,
      |  round(CAST(o AS DOUBLE) / n
      |  - (1 - CAST(o AS DOUBLE) / n) * (CAST(pt100 AS DOUBLE) / 100)
      |    / (1 - CAST(pt100 AS DOUBLE) / 100), 6) AS nb_treat_all
      |FROM cls ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- C1021
  /** stat_nri_idi — categorical net reclassification improvement and
    * the integrated discrimination improvement between the C955 score
    * and a refined score adding the quantity signal (σ(−0.7 + 3d −
    * 0.02(q − 25))). Both scores live on the 1e-12 grid over the
    * bounded (discount × quantity) cell frame; risk classes at
    * 0.30/0.45 are exact integer cuts, so every up/down
    * reclassification count is exact; IDI comes from exact og·pq /
    * (ng−og)·pq integer sums.
    */
  def statNriIdi(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"), col("l_quantity").as("q"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("og"))
      .withColumn("p1", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
      .withColumn("p2", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x - CAST(0.02 AS DOUBLE) * (q - 25)))) + 0.5) AS BIGINT)"))
      .withColumn("c1", expr(
        "CASE WHEN p1 >= 450000000000 THEN 2 WHEN p1 >= 300000000000 THEN 1 ELSE 0 END"))
      .withColumn("c2", expr(
        "CASE WHEN p2 >= 450000000000 THEN 2 WHEN p2 >= 300000000000 THEN 1 ELSE 0 END"))
    g.agg(
        sum(col("og")).cast("long").as("o"),
        sum(expr("ng - og")).cast("long").as("z"),
        sum(expr("CASE WHEN c2 > c1 THEN og ELSE 0L END")).cast("long").as("up_e"),
        sum(expr("CASE WHEN c2 < c1 THEN og ELSE 0L END")).cast("long").as("dn_e"),
        sum(expr("CASE WHEN c2 > c1 THEN ng - og ELSE 0L END")).cast("long").as("up_z"),
        sum(expr("CASE WHEN c2 < c1 THEN ng - og ELSE 0L END")).cast("long").as("dn_z"),
        sum(expr("CAST(og AS DECIMAL(38,0)) * (p2 - p1)")).cast("decimal(38,0)").as("de"),
        sum(expr("CAST(ng - og AS DECIMAL(38,0)) * (p2 - p1)")).cast("decimal(38,0)").as("dz"))
      .selectExpr("o AS n_events", "z AS n_nonevents",
        "round((CAST(up_e AS DOUBLE) - dn_e) / o, 6) AS nri_events",
        "round((CAST(dn_z AS DOUBLE) - up_z) / z, 6) AS nri_nonevents",
        """round((CAST(up_e AS DOUBLE) - dn_e) / o
          |+ (CAST(dn_z AS DOUBLE) - up_z) / z, 6) AS nri""".stripMargin,
        """round(CAST(de AS DOUBLE) / o / 1e12
          |- CAST(dz AS DOUBLE) / z / 1e12, 6) AS idi""".stripMargin)
  }
  val statNriIdiSql: String =
    """WITH g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og,
      |    CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount))) + 0.5) AS BIGINT) AS p1,
      |    CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount - CAST(0.02 AS DOUBLE) * (l_quantity - 25)))) + 0.5) AS BIGINT) AS p2
      |  FROM lineitem GROUP BY l_discount, l_quantity),
      |c AS (
      |  SELECT ng, og, p1, p2,
      |    CASE WHEN p1 >= 450000000000 THEN 2 WHEN p1 >= 300000000000 THEN 1 ELSE 0 END AS c1,
      |    CASE WHEN p2 >= 450000000000 THEN 2 WHEN p2 >= 300000000000 THEN 1 ELSE 0 END AS c2
      |  FROM g),
      |a AS (
      |  SELECT CAST(sum(og) AS BIGINT) AS o, CAST(sum(ng - og) AS BIGINT) AS z,
      |    CAST(sum(CASE WHEN c2 > c1 THEN og ELSE 0 END) AS BIGINT) AS up_e,
      |    CAST(sum(CASE WHEN c2 < c1 THEN og ELSE 0 END) AS BIGINT) AS dn_e,
      |    CAST(sum(CASE WHEN c2 > c1 THEN ng - og ELSE 0 END) AS BIGINT) AS up_z,
      |    CAST(sum(CASE WHEN c2 < c1 THEN ng - og ELSE 0 END) AS BIGINT) AS dn_z,
      |    CAST(sum(CAST(og AS HUGEINT) * (p2 - p1)) AS DECIMAL(38,0)) AS de,
      |    CAST(sum(CAST(ng - og AS HUGEINT) * (p2 - p1)) AS DECIMAL(38,0)) AS dz
      |  FROM c)
      |SELECT o AS n_events, z AS n_nonevents,
      |  round((CAST(up_e AS DOUBLE) - dn_e) / o, 6) AS nri_events,
      |  round((CAST(dn_z AS DOUBLE) - up_z) / z, 6) AS nri_nonevents,
      |  round((CAST(up_e AS DOUBLE) - dn_e) / o
      |  + (CAST(dn_z AS DOUBLE) - up_z) / z, 6) AS nri,
      |  round(CAST(de AS DOUBLE) / o / 1e12
      |  - CAST(dz AS DOUBLE) / z / 1e12, 6) AS idi
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- C1022
  /** stat_watson_williams — the Watson–Williams circular ANOVA of
    * ship-date day-of-year angles between the two line statuses:
    * per-group resultant lengths from cos/sin terms quantized ·1e12
    * on the bounded 366-day frame (corpus counts exact), Fisher's
    * three-regime κ̂ from the mean resultant, and the κ-corrected F.
    * The seasonal-direction test C*'s linear ANOVA cannot express.
    */
  def statWatsonWilliams(s: SparkSession, d: String): DataFrame = {
    val day = lineitem(s, d)
      .groupBy(col("l_linestatus").as("g"), dayofyear(col("l_shipdate")).as("doy"))
      .agg(count(lit(1)).cast("long").as("c"))
      .selectExpr("g", "c",
        "CAST(floor(cos(2 * pi() * (doy - 1) / 365) * 1e12 + 0.5) AS BIGINT) AS cq",
        "CAST(floor(sin(2 * pi() * (doy - 1) / 365) * 1e12 + 0.5) AS BIGINT) AS sq")
    val per = day.groupBy("g")
      .agg(sum(col("c")).cast("long").as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * cq")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * sq")).cast("decimal(38,0)").as("ss"))
      .selectExpr("g", "n",
        """sqrt(CAST(sc AS DOUBLE) / 1e12 * (CAST(sc AS DOUBLE) / 1e12)
          |+ CAST(ss AS DOUBLE) / 1e12 * (CAST(ss AS DOUBLE) / 1e12)) AS r""".stripMargin,
        "CAST(sc AS DOUBLE) / 1e12 AS cx", "CAST(ss AS DOUBLE) / 1e12 AS cy")
    val agg = per.agg(
      count(lit(1)).cast("long").as("p"),
      sum(col("n")).cast("long").as("nn"),
      sum(col("r")).as("sumr"),
      sum(col("cx")).as("tcx"), sum(col("cy")).as("tcy"))
    agg
      .selectExpr("p", "nn", "sumr",
        "sqrt(tcx * tcx + tcy * tcy) AS bigr")
      .selectExpr("p", "nn", "sumr", "bigr", "sumr / nn AS rbar")
      .selectExpr("p", "nn", "sumr", "bigr",
        """CASE WHEN rbar < CAST(0.53 AS DOUBLE)
          |THEN 2 * rbar + rbar * rbar * rbar + 5 * rbar * rbar * rbar * rbar * rbar / 6
          |WHEN rbar < CAST(0.85 AS DOUBLE)
          |THEN CAST(-0.4 AS DOUBLE) + CAST(1.39 AS DOUBLE) * rbar
          |  + CAST(0.43 AS DOUBLE) / (1 - rbar)
          |ELSE 1 / (rbar * rbar * rbar - 4 * rbar * rbar + 3 * rbar)
          |END AS kappa""".stripMargin)
      .selectExpr("nn AS n_obs", "round(bigr, 4) AS resultant_pooled",
        "round(sumr, 4) AS resultant_sum", "round(kappa, 6) AS kappa_hat",
        """round((1 + 3 / (8 * kappa)) * ((nn - p) * (sumr - bigr))
          |/ ((p - 1) * (nn - sumr)), 6) AS ww_f""".stripMargin)
  }
  val statWatsonWilliamsSql: String =
    """WITH day AS (
      |  SELECT l_linestatus AS g, CAST(count(*) AS BIGINT) AS c,
      |    CAST(floor(cos(2 * pi() * (dayofyear(l_shipdate) - 1) / 365) * 1e12 + 0.5) AS BIGINT) AS cq,
      |    CAST(floor(sin(2 * pi() * (dayofyear(l_shipdate) - 1) / 365) * 1e12 + 0.5) AS BIGINT) AS sq
      |  FROM lineitem GROUP BY 1, dayofyear(l_shipdate)),
      |per AS (
      |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
      |    sqrt(CAST(sum(CAST(c AS HUGEINT) * cq) AS DOUBLE) / 1e12 * (CAST(sum(CAST(c AS HUGEINT) * cq) AS DOUBLE) / 1e12)
      |    + CAST(sum(CAST(c AS HUGEINT) * sq) AS DOUBLE) / 1e12 * (CAST(sum(CAST(c AS HUGEINT) * sq) AS DOUBLE) / 1e12)) AS r,
      |    CAST(sum(CAST(c AS HUGEINT) * cq) AS DOUBLE) / 1e12 AS cx,
      |    CAST(sum(CAST(c AS HUGEINT) * sq) AS DOUBLE) / 1e12 AS cy
      |  FROM day GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS p, CAST(sum(n) AS BIGINT) AS nn,
      |    sum(r) AS sumr, sqrt(sum(cx) * sum(cx) + sum(cy) * sum(cy)) AS bigr
      |  FROM per),
      |k AS (
      |  SELECT p, nn, sumr, bigr, sumr / nn AS rbar FROM a),
      |kk AS (
      |  SELECT p, nn, sumr, bigr,
      |    CASE WHEN rbar < CAST(0.53 AS DOUBLE)
      |    THEN 2 * rbar + rbar * rbar * rbar + 5 * rbar * rbar * rbar * rbar * rbar / 6
      |    WHEN rbar < CAST(0.85 AS DOUBLE)
      |    THEN CAST(-0.4 AS DOUBLE) + CAST(1.39 AS DOUBLE) * rbar
      |      + CAST(0.43 AS DOUBLE) / (1 - rbar)
      |    ELSE 1 / (rbar * rbar * rbar - 4 * rbar * rbar + 3 * rbar)
      |    END AS kappa
      |  FROM k)
      |SELECT nn AS n_obs, round(bigr, 4) AS resultant_pooled,
      |  round(sumr, 4) AS resultant_sum, round(kappa, 6) AS kappa_hat,
      |  round((1 + 3 / (8 * kappa)) * ((nn - p) * (sumr - bigr))
      |  / ((p - 1) * (nn - sumr)), 6) AS ww_f
      |FROM kk""".stripMargin

  // ---------------------------------------------------------------- C1023
  /** stat_moses_extreme — the Moses test of extreme reactions:
    * BUILDING customers are the control, MACHINERY the experimental
    * group, on account-balance cents. Global ranks ride GlobalRank on
    * the total (value, custkey) order; the control span is trimmed by
    * h = 2 at each end (the (h+1)-th and (n_c−h)-th smallest control
    * ranks, selected by exact control-internal GlobalRank indices) and
    * reported with the experimental count inside the trimmed span —
    * the "extreme reactions push OUT of the control span" statistic.
    */
  def statMosesExtreme(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING").as("ctl"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"),
        col("c_custkey").as("k"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumber(
      base, "rk", Seq(col("v").asc, col("k").asc))
    val ctl = graft.plans.GlobalRank.withGlobalRowNumber(
      ranked.filter(col("ctl")), "ci", Seq(col("rk").asc))
    val nc = ctl.agg(count(lit(1)).cast("long").as("n_c"))
    val loHi = ctl.crossJoin(broadcast(nc))
      .filter(col("ci") === 3L || col("ci") === col("n_c") - 2L)
      .agg(max(col("n_c")).cast("long").as("n_c"),
        min(col("rk")).cast("long").as("rk_lo"),
        max(col("rk")).cast("long").as("rk_hi"))
    ranked.filter(!col("ctl")).crossJoin(broadcast(loHi))
      .agg(max(col("n_c")).as("n_c"),
        count(lit(1)).cast("long").as("n_e"),
        max(expr("rk_hi - rk_lo + 1")).cast("long").as("span_trimmed"),
        sum(expr("CASE WHEN rk > rk_lo AND rk < rk_hi THEN 1L ELSE 0L END"))
          .cast("long").as("n_exp_inside"))
      .selectExpr("n_c", "n_e", "span_trimmed", "n_exp_inside",
        "round(CAST(n_exp_inside AS DOUBLE) / n_e, 6) AS frac_exp_inside")
  }
  val statMosesExtremeSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment = 'BUILDING' AS ctl,
      |    CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
      |    c_custkey AS k
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |ranked AS (
      |  SELECT ctl, v, k,
      |    CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS rk
      |  FROM base),
      |ctl AS (
      |  SELECT rk, CAST(row_number() OVER (ORDER BY rk) AS BIGINT) AS ci
      |  FROM ranked WHERE ctl),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_c FROM ctl),
      |lohi AS (
      |  SELECT max(n_c) AS n_c, CAST(min(rk) AS BIGINT) AS rk_lo,
      |    CAST(max(rk) AS BIGINT) AS rk_hi
      |  FROM ctl, nc WHERE ci = 3 OR ci = n_c - 2)
      |SELECT max(lohi.n_c) AS n_c, CAST(count(*) AS BIGINT) AS n_e,
      |  CAST(max(rk_hi - rk_lo + 1) AS BIGINT) AS span_trimmed,
      |  CAST(sum(CASE WHEN rk > rk_lo AND rk < rk_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_exp_inside,
      |  round(CAST(sum(CASE WHEN rk > rk_lo AND rk < rk_hi THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS frac_exp_inside
      |FROM ranked, lohi WHERE NOT ctl""".stripMargin

  // ---------------------------------------------------------------- C1024
  /** time_phillips_perron — Perron's Z_ρ unit-root statistic on
    * monthly revenue: the AR(1)-with-intercept OLS from exact DECIMAL
    * moment sums over the calendar-bounded month frame, residuals
    * quantized onto the cent grid, the Bartlett/Newey–West long-run
    * variance λ² with q = 4 lags (lag columns on the bounded frame —
    * no self-join), and Z_ρ = T(ρ̂−1) − (T²/D)·(λ²−γ₀)/2 with D the
    * demeaned lag second moment. Compared against the −14.1
    * large-sample 5% intercept-case critical value.
    */
  def timePhillipsPerron(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.orderBy("m")
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"))
      .withColumn("yl", lag(col("y"), 1).over(wOrd))
      .filter(col("yl").isNotNull)
    val mom = ms.agg(count(lit(1)).cast("long").as("t"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("yl")).cast("decimal(38,0)").as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * yl")).cast("decimal(38,0)").as("sxy"),
      sum(expr("CAST(yl AS DECIMAL(38,0)) * yl")).cast("decimal(38,0)").as("sxx"))
      .selectExpr("t", "CAST(sy AS DOUBLE) AS sy", "CAST(sx AS DOUBLE) AS sx",
        "CAST(sxy AS DOUBLE) AS sxy", "CAST(sxx AS DOUBLE) AS sxx")
      .selectExpr("t", "sy", "sx", "sxx",
        "(t * sxy - sx * sy) / (t * sxx - sx * sx) AS rho",
        "sxx - sx * sx / t AS dd")
      .selectExpr("t", "rho", "dd", "(sy - rho * sx) / t AS alpha")
    val res = ms.crossJoin(broadcast(mom))
      .withColumn("eq", expr("CAST(floor(y - alpha - rho * yl + 0.5) AS BIGINT)"))
      .withColumn("e1", lag(col("eq"), 1).over(wOrd))
      .withColumn("e2", lag(col("eq"), 2).over(wOrd))
      .withColumn("e3", lag(col("eq"), 3).over(wOrd))
      .withColumn("e4", lag(col("eq"), 4).over(wOrd))
    res.groupBy("t", "rho", "dd")
      .agg(sum(expr("CAST(eq AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("g0"),
        sum(expr("CAST(eq AS DECIMAL(38,0)) * coalesce(e1, 0L)")).cast("decimal(38,0)").as("g1"),
        sum(expr("CAST(eq AS DECIMAL(38,0)) * coalesce(e2, 0L)")).cast("decimal(38,0)").as("g2"),
        sum(expr("CAST(eq AS DECIMAL(38,0)) * coalesce(e3, 0L)")).cast("decimal(38,0)").as("g3"),
        sum(expr("CAST(eq AS DECIMAL(38,0)) * coalesce(e4, 0L)")).cast("decimal(38,0)").as("g4"))
      .selectExpr("t", "rho", "dd",
        "CAST(g0 AS DOUBLE) / t AS gamma0",
        """CAST(g0 AS DOUBLE) / t
          |+ 2 * (CAST(0.8 AS DOUBLE) * (CAST(g1 AS DOUBLE) / t)
          |+ CAST(0.6 AS DOUBLE) * (CAST(g2 AS DOUBLE) / t)
          |+ CAST(0.4 AS DOUBLE) * (CAST(g3 AS DOUBLE) / t)
          |+ CAST(0.2 AS DOUBLE) * (CAST(g4 AS DOUBLE) / t)) AS lambda2""".stripMargin)
      .selectExpr("t AS n_obs", "round(rho, 6) AS rho_hat",
        "round(gamma0 / 1e4, 4) AS gamma0_dollars2",
        "round(lambda2 / 1e4, 4) AS lambda2_dollars2",
        "round(t * (rho - 1) - (CAST(t AS DOUBLE) * t / dd) * (lambda2 - gamma0) / 2, 4) AS z_rho",
        "t * (rho - 1) - (CAST(t AS DOUBLE) * t / dd) * (lambda2 - gamma0) / 2 < CAST(-14.1 AS DOUBLE) AS reject_unit_root")
  }
  val timePhillipsPerronSql: String =
    """WITH mo AS (
      |  SELECT m, y, lag(y) OVER (ORDER BY m) AS yl FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |    FROM orders GROUP BY 1)),
      |ms AS (SELECT * FROM mo WHERE yl IS NOT NULL),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS t,
      |    CAST(CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(yl AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(y AS HUGEINT) * yl) AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
      |    CAST(CAST(sum(CAST(yl AS HUGEINT) * yl) AS DECIMAL(38,0)) AS DOUBLE) AS sxx
      |  FROM ms),
      |fit AS (
      |  SELECT t,
      |    (t * sxy - sx * sy) / (t * sxx - sx * sx) AS rho,
      |    sxx - sx * sx / t AS dd, sy, sx
      |  FROM mom),
      |fit2 AS (SELECT t, rho, dd, (sy - rho * sx) / t AS alpha FROM fit),
      |res AS (
      |  SELECT t, rho, dd,
      |    CAST(floor(y - alpha - rho * yl + 0.5) AS BIGINT) AS eq, m
      |  FROM ms, fit2),
      |lags AS (
      |  SELECT t, rho, dd, eq,
      |    lag(eq, 1) OVER (ORDER BY m) AS e1,
      |    lag(eq, 2) OVER (ORDER BY m) AS e2,
      |    lag(eq, 3) OVER (ORDER BY m) AS e3,
      |    lag(eq, 4) OVER (ORDER BY m) AS e4
      |  FROM res),
      |gam AS (
      |  SELECT t, rho, dd,
      |    CAST(CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS DOUBLE) / t AS gamma0,
      |    CAST(CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS DOUBLE) / t
      |    + 2 * (CAST(0.8 AS DOUBLE) * (CAST(CAST(sum(CAST(eq AS HUGEINT) * coalesce(e1, 0)) AS DECIMAL(38,0)) AS DOUBLE) / t)
      |    + CAST(0.6 AS DOUBLE) * (CAST(CAST(sum(CAST(eq AS HUGEINT) * coalesce(e2, 0)) AS DECIMAL(38,0)) AS DOUBLE) / t)
      |    + CAST(0.4 AS DOUBLE) * (CAST(CAST(sum(CAST(eq AS HUGEINT) * coalesce(e3, 0)) AS DECIMAL(38,0)) AS DOUBLE) / t)
      |    + CAST(0.2 AS DOUBLE) * (CAST(CAST(sum(CAST(eq AS HUGEINT) * coalesce(e4, 0)) AS DECIMAL(38,0)) AS DOUBLE) / t)) AS lambda2
      |  FROM lags GROUP BY 1, 2, 3)
      |SELECT t AS n_obs, round(rho, 6) AS rho_hat,
      |  round(gamma0 / 1e4, 4) AS gamma0_dollars2,
      |  round(lambda2 / 1e4, 4) AS lambda2_dollars2,
      |  round(t * (rho - 1) - (CAST(t AS DOUBLE) * t / dd) * (lambda2 - gamma0) / 2, 4) AS z_rho,
      |  t * (rho - 1) - (CAST(t AS DOUBLE) * t / dd) * (lambda2 - gamma0) / 2 < CAST(-14.1 AS DOUBLE) AS reject_unit_root
      |FROM gam""".stripMargin

  // ---------------------------------------------------------------- C1025
  /** graph_small_world — the Humphries–Gurney small-world sigma on the
    * deterministic user graph (the C*-family ring-plus-chord
    * construction): C from the exact triangle/wedge census, L̂ as the
    * mean BFS distance from source 0 within the 5-round horizon (the
    * C*-doublesweep convention, n_reached reported honestly), against
    * the Erdős–Rényi baselines C_rand = k̄/n and L_rand = ln n / ln k̄.
    */
  def graphSmallWorld(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val arcs = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val edges = arcs.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct().localCheckpoint(true)
    val dir = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var visited = users.sparkSession.range(1)
      .select(lit(0L).as("v"), lit(0L).as("lvl")).localCheckpoint(true)
    var frontier = visited.select("v")
    for (k <- 1 to 5) {
      frontier = frontier.join(dir, frontier("v") === dir("a"))
        .select(col("b").as("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionAll(frontier.select(col("v"), lit(k.toLong).as("lvl")))
        .localCheckpoint(true)
    }
    val bfs = visited.agg(count(lit(1)).cast("long").as("n_reached"),
      sum(col("lvl")).cast("long").as("sum_lvl"))
    val deg = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).cast("long").as("dv"))
    val wedges = deg.agg(sum(expr("(dv * (dv - 1)) DIV 2")).cast("long").as("nw"))
    val tri = edges.select(col("a"), col("b").as("m"))
      .join(edges.select(col("a").as("m"), col("b").as("c")), "m")
      .join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).cast("long").as("nt"))
    val ne = edges.agg(count(lit(1)).cast("long").as("ne"))
    ne.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
      .crossJoin(broadcast(bfs))
      .selectExpr(s"CAST($n AS BIGINT) AS n_vertices", "ne", "n_reached",
        "3 * CAST(nt AS DOUBLE) / nw AS c_global",
        "CAST(sum_lvl AS DOUBLE) / (n_reached - 1) AS l_hat",
        s"2 * CAST(ne AS DOUBLE) / $n AS kbar")
      .selectExpr("n_vertices", "ne AS n_edges", "n_reached",
        "round(c_global, 6) AS c_global", "round(l_hat, 4) AS l_hat",
        """round((c_global / (kbar / n_vertices))
          |/ (l_hat / (ln(CAST(n_vertices AS DOUBLE)) / ln(kbar))), 4)
          |AS sigma""".stripMargin)
  }
  val graphSmallWorldSql: String = {
    val rounds = (1 to 5).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT DISTINCT b AS v FROM dir
         |  WHERE a IN (SELECT v FROM v${k - 1} WHERE lvl = ${k - 1})
         |    AND b NOT IN (SELECT v FROM v${k - 1})),
         |v$k AS MATERIALIZED (
         |  SELECT * FROM v${k - 1} UNION ALL SELECT v, $k FROM f$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH users AS (SELECT DISTINCT user_id FROM events),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
       |arcs AS (
       |  SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
       |  UNION ALL
       |  SELECT user_id, (user_id + 2) % n FROM users, nn
       |  UNION ALL
       |  SELECT user_id, (user_id * 7 + 3) % n FROM users, nn),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM arcs WHERE src <> dst),
       |dir AS MATERIALIZED (
       |  SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |v0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v, 0 AS lvl),
       |$rounds,
       |bfs AS (SELECT CAST(count(*) AS BIGINT) AS n_reached,
       |  CAST(sum(lvl) AS BIGINT) AS sum_lvl FROM v5),
       |deg AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS dv FROM (
       |    SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) z
       |  GROUP BY 1),
       |wq AS (SELECT CAST(sum((dv * (dv - 1)) // 2) AS BIGINT) AS nw FROM deg),
       |tri AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nt
       |  FROM edges e1 JOIN edges e2 ON e1.b = e2.a
       |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
       |ec AS (SELECT CAST(count(*) AS BIGINT) AS ne FROM edges),
       |m AS (
       |  SELECT n AS n_vertices, ne, n_reached,
       |    3 * CAST(nt AS DOUBLE) / nw AS c_global,
       |    CAST(sum_lvl AS DOUBLE) / (n_reached - 1) AS l_hat,
       |    2 * CAST(ne AS DOUBLE) / n AS kbar
       |  FROM nn, ec, wq, tri, bfs)
       |SELECT n_vertices, ne AS n_edges, n_reached,
       |  round(c_global, 6) AS c_global, round(l_hat, 4) AS l_hat,
       |  round((c_global / (kbar / n_vertices))
       |  / (l_hat / (ln(CAST(n_vertices AS DOUBLE)) / ln(kbar))), 4) AS sigma
       |FROM m""".stripMargin
  }

  // ---------------------------------------------------------------- C1026
  /** win_supertrend — the Supertrend(10, 3) state machine on monthly
    * order-value bars: ATR(10, Wilder) on the 1e-3-cent grid, basic
    * bands on the exact 2× grid ((h+l)·1e3 ± 6·atrq), the
    * ratchet-carried FINAL bands and the trend direction ALL as
    * integers — every band ratchet and trend flip is an exact integer
    * comparison (2000·c vs the carried band). Driver walk on the
    * bounded monthly frame; recursive-CTE oracle.
    */
  def winSupertrend(s: SparkSession, d: String): DataFrame = {
    val bars = monthlyBarsLocal(s, d)
    var atrq = (bars(0)._2 - bars(0)._3) * 1000L
    var fub2 = (bars(0)._2 + bars(0)._3) * 1000L + 6L * atrq
    var flb2 = (bars(0)._2 + bars(0)._3) * 1000L - 6L * atrq
    var dir = 1L; var pc = bars(0)._1
    var nflips = 0L; var nup = 0L
    for (t <- 2 to bars.length) {
      val (c, h, l) = bars(t - 1)
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      atrq = math.floor((1.0 / 10 * tr + 9.0 / 10 * (atrq / 1e3)) * 1e3 + 0.5).toLong
      val ub2 = (h + l) * 1000L + 6L * atrq
      val lb2 = (h + l) * 1000L - 6L * atrq
      fub2 = if (ub2 < fub2 || 2000L * pc > fub2) ub2 else fub2
      flb2 = if (lb2 > flb2 || 2000L * pc < flb2) lb2 else flb2
      val newDir =
        if (dir == 1L) { if (2000L * c < flb2) -1L else 1L }
        else { if (2000L * c > fub2) 1L else -1L }
      if (newDir != dir) nflips += 1
      if (newDir == 1L) nup += 1
      dir = newDir; pc = c
    }
    import s.implicits._
    Seq((bars.length.toLong, nflips, nup, dir, atrq / 1e3 / 100))
      .toDF("n0", "nf", "nu", "dr", "ad")
      .selectExpr("n0 AS n_months", "nf AS n_flips", "nu AS n_up_months",
        "dr AS final_dir", "round(ad, 4) AS atr_dollars")
  }
  private def monthlyBarsLocal(s: SparkSession, d: String): Array[(Long, Long, Long)] =
    orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("m")
      .agg(max(struct(col("o_orderkey"), col("p"))).as("lo"),
        max(col("p")).cast("long").as("h"), min(col("p")).cast("long").as("l"))
      .selectExpr("m", "lo.p AS c", "h", "l")
      .orderBy("m").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
  val winSupertrendSql: String = {
    val trN = "greatest(s2.h - s2.l, abs(s2.h - it.pc), abs(s2.l - it.pc))"
    val atrN = s"CAST(floor((CAST(1 AS DOUBLE) / 10 * ($trN) + CAST(9 AS DOUBLE) / 10 * (it.atrq / 1e3)) * 1e3 + 0.5) AS BIGINT)"
    val ubN = s"((s2.h + s2.l) * 1000 + 6 * ($atrN))"
    val lbN = s"((s2.h + s2.l) * 1000 - 6 * ($atrN))"
    val fubN = s"CASE WHEN ($ubN) < it.fub2 OR 2000 * it.pc > it.fub2 THEN ($ubN) ELSE it.fub2 END"
    val flbN = s"CASE WHEN ($lbN) > it.flb2 OR 2000 * it.pc < it.flb2 THEN ($lbN) ELSE it.flb2 END"
    val dirN =
      s"""CASE WHEN it.dir = 1
         |THEN (CASE WHEN 2000 * s2.c < ($flbN) THEN -1 ELSE 1 END)
         |ELSE (CASE WHEN 2000 * s2.c > ($fubN) THEN 1 ELSE -1 END) END""".stripMargin
    s"""WITH RECURSIVE bars AS (
       |  SELECT m, max(CASE WHEN rn_l = 1 THEN p END) AS c,
       |    CAST(max(p) AS BIGINT) AS h, CAST(min(p) AS BIGINT) AS l
       |  FROM (
       |    SELECT date_trunc('month', o_orderdate) AS m,
       |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p,
       |      row_number() OVER (PARTITION BY date_trunc('month', o_orderdate)
       |        ORDER BY o_orderkey DESC) AS rn_l
       |    FROM orders) z
       |  GROUP BY 1),
       |seq AS (
       |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, c, h, l
       |  FROM bars),
       |it(t, atrq, fub2, flb2, dir, pc, nflips, nup) AS (
       |  SELECT CAST(1 AS BIGINT), (h - l) * 1000,
       |    (h + l) * 1000 + 6 * ((h - l) * 1000),
       |    (h + l) * 1000 - 6 * ((h - l) * 1000),
       |    CAST(1 AS BIGINT), c, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM seq WHERE t = 1
       |  UNION ALL
       |  SELECT s2.t, $atrN, $fubN, $flbN, $dirN, s2.c,
       |    it.nflips + CASE WHEN ($dirN) <> it.dir THEN 1 ELSE 0 END,
       |    it.nup + CASE WHEN ($dirN) = 1 THEN 1 ELSE 0 END
       |  FROM it JOIN seq s2 ON s2.t = it.t + 1),
       |fin AS (SELECT * FROM it ORDER BY t DESC LIMIT 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM seq)
       |SELECT n0 AS n_months, nflips AS n_flips, nup AS n_up_months,
       |  dir AS final_dir, round(atrq / 1e3 / 100, 4) AS atr_dollars
       |FROM fin, nn""".stripMargin
  }

  // ---------------------------------------------------------------- C1027
  /** scan_zorder_locality — the layout exhibit behind z-order
    * clustering: events mapped onto a 64×64 (value-bucket ×
    * time-bucket) grid, the 12-bit Morton z-value computed with pure
    * integer DIV/% bit arithmetic (identical in both engines), and
    * the mean per-bucket bounding-box area compared across three
    * 64-way layouts — z-range buckets vs time-only vs value-only. The
    * number that explains WHY a 100 TB table z-ordered on (value, ts)
    * prunes both predicates while single-column sorts prune one.
    */
  def scanZorderLocality(s: SparkSession, d: String): DataFrame = {
    // day index via datediff (Spark) / date subtraction (DuckDB): the
    // two spellings return the SAME exact integer — no IEEE involved.
    // BOTH axes are span-scaled onto [0, 64) (a fixed $-width value
    // bucket left the skewed value axis at <27/64 occupied cells and
    // let the time-only layout win by default).
    val span = events(s, d).agg(
      min(expr("CAST(datediff(CAST(ts AS DATE), CAST('1970-01-01' AS DATE)) AS BIGINT)"))
        .cast("long").as("d0"),
      max(expr("CAST(datediff(CAST(ts AS DATE), CAST('1970-01-01' AS DATE)) AS BIGINT)"))
        .cast("long").as("d1"),
      min(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v0"),
      max(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v1"))
    val pts = events(s, d).crossJoin(broadcast(span))
      .selectExpr(
        """((CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) - v0) * 64)
          |DIV (v1 - v0 + 1) AS xb""".stripMargin,
        """((CAST(datediff(CAST(ts AS DATE), CAST('1970-01-01' AS DATE)) AS BIGINT) - d0) * 64)
          |DIV (d1 - d0 + 1) AS yb""".stripMargin)
      .selectExpr("xb", "yb",
        """(xb % 2) * 1 + ((xb DIV 2) % 2) * 4 + ((xb DIV 4) % 2) * 16
          |+ ((xb DIV 8) % 2) * 64 + ((xb DIV 16) % 2) * 256
          |+ ((xb DIV 32) % 2) * 1024
          |+ (yb % 2) * 2 + ((yb DIV 2) % 2) * 8 + ((yb DIV 4) % 2) * 32
          |+ ((yb DIV 8) % 2) * 128 + ((yb DIV 16) % 2) * 512
          |+ ((yb DIV 32) % 2) * 2048 AS zv""".stripMargin)
    def area(bucketExpr: String, tag: String): DataFrame =
      pts.groupBy(expr(bucketExpr).as("bk"))
        .agg(max(col("xb")).as("x1"), min(col("xb")).as("x0"),
          max(col("yb")).as("y1"), min(col("yb")).as("y0"))
        .agg(count(lit(1)).cast("long").as(s"${tag}_n"),
          sum(expr("(x1 - x0 + 1) * (y1 - y0 + 1)")).cast("long").as(s"${tag}_area"))
    val n = pts.agg(count(lit(1)).cast("long").as("n_events"))
    n.crossJoin(broadcast(area("zv DIV 64", "z")))
      .crossJoin(broadcast(area("yb", "t")))
      .crossJoin(broadcast(area("xb", "v")))
      .selectExpr("n_events",
        "round(CAST(z_area AS DOUBLE) / z_n, 4) AS avg_bbox_zorder",
        "round(CAST(t_area AS DOUBLE) / t_n, 4) AS avg_bbox_timeonly",
        "round(CAST(v_area AS DOUBLE) / v_n, 4) AS avg_bbox_valueonly",
        """round((CAST(t_area AS DOUBLE) / t_n)
          |/ (CAST(z_area AS DOUBLE) / z_n), 4) AS zorder_gain_vs_time""".stripMargin)
  }
  val scanZorderLocalitySql: String =
    """WITH span AS (
      |  SELECT CAST(min(CAST(ts AS DATE) - CAST('1970-01-01' AS DATE)) AS BIGINT) AS d0,
      |    CAST(max(CAST(ts AS DATE) - CAST('1970-01-01' AS DATE)) AS BIGINT) AS d1,
      |    CAST(min(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v0,
      |    CAST(max(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v1
      |  FROM events),
      |pts AS (
      |  SELECT xb, yb,
      |    (xb % 2) * 1 + ((xb // 2) % 2) * 4 + ((xb // 4) % 2) * 16
      |    + ((xb // 8) % 2) * 64 + ((xb // 16) % 2) * 256
      |    + ((xb // 32) % 2) * 1024
      |    + (yb % 2) * 2 + ((yb // 2) % 2) * 8 + ((yb // 4) % 2) * 32
      |    + ((yb // 8) % 2) * 128 + ((yb // 16) % 2) * 512
      |    + ((yb // 32) % 2) * 2048 AS zv
      |  FROM (
      |    SELECT
      |      ((CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) - v0) * 64)
      |      // (v1 - v0 + 1) AS xb,
      |      ((CAST(CAST(ts AS DATE) - CAST('1970-01-01' AS DATE) AS BIGINT) - d0) * 64)
      |      // (d1 - d0 + 1) AS yb
      |    FROM events, span) q),
      |za AS (
      |  SELECT CAST(count(*) AS BIGINT) AS z_n,
      |    CAST(sum((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT) AS z_area
      |  FROM (SELECT zv // 64 AS bk, max(xb) AS x1, min(xb) AS x0,
      |    max(yb) AS y1, min(yb) AS y0 FROM pts GROUP BY 1) g),
      |ta AS (
      |  SELECT CAST(count(*) AS BIGINT) AS t_n,
      |    CAST(sum((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT) AS t_area
      |  FROM (SELECT yb AS bk, max(xb) AS x1, min(xb) AS x0,
      |    max(yb) AS y1, min(yb) AS y0 FROM pts GROUP BY 1) g),
      |va AS (
      |  SELECT CAST(count(*) AS BIGINT) AS v_n,
      |    CAST(sum((x1 - x0 + 1) * (y1 - y0 + 1)) AS BIGINT) AS v_area
      |  FROM (SELECT xb AS bk, max(xb) AS x1, min(xb) AS x0,
      |    max(yb) AS y1, min(yb) AS y0 FROM pts GROUP BY 1) g),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM pts)
      |SELECT n_events,
      |  round(CAST(z_area AS DOUBLE) / z_n, 4) AS avg_bbox_zorder,
      |  round(CAST(t_area AS DOUBLE) / t_n, 4) AS avg_bbox_timeonly,
      |  round(CAST(v_area AS DOUBLE) / v_n, 4) AS avg_bbox_valueonly,
      |  round((CAST(t_area AS DOUBLE) / t_n)
      |  / (CAST(z_area AS DOUBLE) / z_n), 4) AS zorder_gain_vs_time
      |FROM nc, za, ta, va""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_decision_curve" -> (statDecisionCurve _),
    "stat_nri_idi" -> (statNriIdi _),
    "stat_watson_williams" -> (statWatsonWilliams _),
    "stat_moses_extreme" -> (statMosesExtreme _),
    "time_phillips_perron" -> (timePhillipsPerron _),
    "graph_small_world" -> (graphSmallWorld _),
    "win_supertrend" -> (winSupertrend _),
    "scan_zorder_locality" -> (scanZorderLocality _))

  val oracle: Map[String, String] = Map(
    "stat_decision_curve" -> statDecisionCurveSql,
    "stat_nri_idi" -> statNriIdiSql,
    "stat_watson_williams" -> statWatsonWilliamsSql,
    "stat_moses_extreme" -> statMosesExtremeSql,
    "time_phillips_perron" -> timePhillipsPerronSql,
    "graph_small_world" -> graphSmallWorldSql,
    "win_supertrend" -> winSupertrendSql,
    "scan_zorder_locality" -> scanZorderLocalitySql)
}
