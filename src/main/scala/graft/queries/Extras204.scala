package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 104 (C820–C823): model validation + forecast honesty +
  * extreme-value fitting + index numbers — the PRESS predictive R²,
  * a time-split prediction-interval coverage backtest, the GPD
  * probability-weighted-moment fit, and the Laspeyres/Paasche/Fisher
  * price indices.
  *
  * Shared discipline: leverages and residuals come from exact global
  * moments with one quantization per row; the backtest split is an
  * integer month cut; PWM b₀/b₁ use exact global ranks; index-number
  * numerators quantize each part's cross-valued term once.
  */
object Extras204 {

  /** C820 stat_press_r2 — the PRESS statistic and predictive R² of
    * the price~quantity regression: leave-one-out residuals in closed
    * form e_i/(1−h_ii) with leverages h_ii = 1/n + (x−x̄)²/Sxx from
    * exact moments (no refitting), per-row squared deleted residuals
    * quantized ·10³. R²_pred < R² by construction; a large gap is the
    * overfit alarm — computed in ONE distributed pass.
    */
  def statPressR2(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    val g = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .selectExpr("n", "CAST(sx AS DOUBLE) / n AS xbar", "CAST(sy AS DOUBLE) / n AS ybar",
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS sxxc",
        "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) AS sxyc",
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS syyc")
      .selectExpr("n", "xbar", "ybar", "sxxc", "syyc", "sxyc / sxxc AS b")
    base.crossJoin(broadcast(g))
      .select(col("n"), col("syyc"), col("sxxc"), col("b"),
        // deleted residual² quantized ·1e-? y in cents (large):
        // e ~ up to 1e7, e² up to 1e14 — quantize at unit scale
        expr(
          """CAST(floor(
            |pow((y - (ybar + b * (x - xbar))) / (1 - (1.0D / n + (x - xbar) * (x - xbar) / sxxc)), 2)
            |+ 0.5) AS BIGINT)""".stripMargin).as("pq"),
        expr(
          """CAST(floor(pow(y - (ybar + b * (x - xbar)), 2) + 0.5) AS BIGINT)""".stripMargin).as("eq"))
      .groupBy("n", "syyc")
      .agg(sum(expr("CAST(pq AS DECIMAL(38,0))")).cast("decimal(38,0)").as("press"),
        sum(expr("CAST(eq AS DECIMAL(38,0))")).cast("decimal(38,0)").as("ssr"))
      .selectExpr("n",
        "round(1 - CAST(ssr AS DOUBLE) / syyc, 6) AS r2",
        "round(1 - CAST(press AS DOUBLE) / syyc, 6) AS r2_pred",
        "round(CAST(press AS DOUBLE) / CAST(ssr AS DOUBLE), 6) AS press_ssr_ratio")
  }
  val statPressR2Sql: String =
    """WITH base AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |g0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      |  FROM base),
      |g AS (
      |  SELECT n, CAST(sx AS DOUBLE) / n AS xbar, CAST(sy AS DOUBLE) / n AS ybar,
      |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS sxxc,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS syyc,
      |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
      |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) AS b
      |  FROM g0),
      |terms AS (
      |  SELECT g.n, g.syyc,
      |    CAST(floor(
      |      pow((b.y - (g.ybar + g.b * (b.x - g.xbar)))
      |        / (1 - (1.0 / g.n + (b.x - g.xbar) * (b.x - g.xbar) / g.sxxc)), 2)
      |      + 0.5) AS BIGINT) AS pq,
      |    CAST(floor(pow(b.y - (g.ybar + g.b * (b.x - g.xbar)), 2) + 0.5) AS BIGINT) AS eq
      |  FROM base b, g),
      |ag AS (
      |  SELECT n, syyc,
      |    CAST(sum(CAST(pq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS press,
      |    CAST(sum(CAST(eq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ssr
      |  FROM terms GROUP BY 1, 2)
      |SELECT n,
      |  round(1 - CAST(ssr AS DOUBLE) / syyc, 6) AS r2,
      |  round(1 - CAST(press AS DOUBLE) / syyc, 6) AS r2_pred,
      |  round(CAST(press AS DOUBLE) / CAST(ssr AS DOUBLE), 6) AS press_ssr_ratio
      |FROM ag""".stripMargin

  /** C821 stat_pi_coverage_backtest — honest-forecast audit: fit a
    * normal mean ± 1.959964σ prediction interval for daily revenue on
    * the FIRST 80% of calendar days (integer rank cut), measure the
    * exact empirical coverage on the held-out 20%. Nominal 95% ≠
    * achieved when the series drifts — this row says by how much,
    * with zero leakage (moments from the train slice only).
    */
  def statPiCoverageBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(expr("date_trunc('day', o_orderdate)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val idx = daily.withColumn("i", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("day").asc)))
    val tot = daily.agg(count(lit(1)).cast("long").as("n"))
    val withN = idx.crossJoin(broadcast(tot))
      .withColumn("cut", expr("(n * 8) div 10"))
    val train = withN.filter(expr("i <= cut"))
      .agg(count(lit(1)).cast("long").as("ntr"),
        sum(col("v")).cast("decimal(38,0)").as("sv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("qv"))
      .selectExpr("ntr", "CAST(sv AS DOUBLE) / ntr AS mu",
        "sqrt((CAST(qv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / ntr) / (ntr - 1)) AS sig")
    withN.filter(expr("i > cut"))
      .crossJoin(broadcast(train))
      .agg(max(col("ntr")).as("n_train"), count(lit(1)).cast("long").as("n_test"),
        sum(expr("CASE WHEN abs(v - mu) <= 1.959964D * sig THEN 1L ELSE 0L END"))
          .cast("long").as("covered"))
      .selectExpr("n_train", "n_test",
        "round(CAST(covered AS DOUBLE) / n_test, 6) AS empirical_coverage",
        "round(CAST(covered AS DOUBLE) / n_test - 0.95D, 6) AS coverage_gap")
  }
  val statPiCoverageBacktestSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT v, row_number() OVER (ORDER BY day) AS i FROM daily),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
      |train AS (
      |  SELECT CAST(count(*) AS BIGINT) AS ntr,
      |    CAST(sum(v) AS DOUBLE) / count(*) AS mu,
      |    sqrt((CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DOUBLE)
      |      - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / count(*)) / (count(*) - 1)) AS sig
      |  FROM idx, tot WHERE i <= (n * 8) // 10)
      |SELECT max(t.ntr) AS n_train, CAST(count(*) AS BIGINT) AS n_test,
      |  round(CAST(sum(CASE WHEN abs(i.v - t.mu) <= 1.959964 * t.sig THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS empirical_coverage,
      |  round(CAST(sum(CASE WHEN abs(i.v - t.mu) <= 1.959964 * t.sig THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) - 0.95, 6) AS coverage_gap
      |FROM idx i, tot n, train t WHERE i.i > (n.n * 8) // 10""".stripMargin

  /** C822 stat_gpd_pwm_fit — generalized Pareto fit to order-total
    * exceedances over the 95th percentile, via the CLOSED-FORM
    * probability-weighted-moment estimators (Hosking–Wallis):
    * b₀ = ȳ, b₁ = Σ(i−1)/(n−1)·y₍ᵢ₎/n from exact global ranks,
    * ξ = 2 − b₀/(2b₁−b₀), σ = 2b₀(b₀−b₁)/(2b₁−b₀). The tail-shape fit
    * beyond C-line Hill (which assumes ξ>0 power law) — PWM handles
    * either sign, no iteration.
    */
  def statGpdPwmFit(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val tot = base.agg(count(lit(1)).cast("long").as("n"))
    val ranked = graft.plans.GlobalRank
      .withExclusivePrefixSum(base.withColumn("one", lit(1L)), "i0", col("one"),
        Seq(col("cv").asc, col("okey").asc))
      .withColumn("r", expr("i0 + 1"))
    // threshold u = x_(ceil(0.95 n)); exceedances y = x − u for r > that
    val withU = ranked.crossJoin(broadcast(tot))
      .withColumn("kth", expr("(n * 95 + 99) div 100"))
    val u = withU.filter(expr("r = kth")).select(col("cv").as("u")).limit(1)
    val exc = withU.filter(expr("r > kth"))
      .crossJoin(broadcast(u))
      .select(expr("cv - u").as("y"), col("r"), col("kth"), col("n"))
      .withColumn("j", expr("r - kth")) // 1-based rank among exceedances
    exc.agg(count(lit(1)).cast("long").as("m"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * (j - 1)")).cast("decimal(38,0)").as("syj"),
        max(col("y")).cast("long").as("ymax"))
      .crossJoin(broadcast(u))
      .selectExpr("m", "round(CAST(u AS DOUBLE) / 100, 2) AS threshold_dollars",
        "CAST(sy AS DOUBLE) / m / 100 AS b0",
        "CAST(syj AS DOUBLE) / (m - 1) / m / 100 AS b1")
      .selectExpr("m", "threshold_dollars",
        "round(2 - b0 / (2 * b1 - b0), 6) AS xi_shape",
        "round(2 * b0 * (b0 - b1) / (2 * b1 - b0), 4) AS sigma_scale")
  }
  val statGpdPwmFitSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS r FROM base),
      |u AS (
      |  SELECT cv AS u FROM ranked, tot WHERE r = (n * 95 + 99) // 100 LIMIT 1),
      |exc AS (
      |  SELECT r.cv - u.u AS y, r.r - (t.n * 95 + 99) // 100 AS j
      |  FROM ranked r, tot t, u
      |  WHERE r.r > (t.n * 95 + 99) // 100),
      |m0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * (j - 1)) AS DECIMAL(38,0)) AS syj
      |  FROM exc),
      |v AS (
      |  SELECT m0.m, round(CAST(u.u AS DOUBLE) / 100, 2) AS threshold_dollars,
      |    CAST(m0.sy AS DOUBLE) / m0.m / 100 AS b0,
      |    CAST(m0.syj AS DOUBLE) / (m0.m - 1) / m0.m / 100 AS b1
      |  FROM m0, u)
      |SELECT m, threshold_dollars,
      |  round(2 - b0 / (2 * b1 - b0), 6) AS xi_shape,
      |  round(2 * b0 * (b0 - b1) / (2 * b1 - b0), 4) AS sigma_scale
      |FROM v""".stripMargin

  /** C823 analytics_fisher_price_index — Laspeyres, Paasche, and
    * Fisher ideal price indices 1995→1996 over parts sold in both
    * years: per-part unit values p = rev/qty as exact rationals, the
    * four cross-terms Σp·q quantized ·10³ per part before summing.
    * The index-number answer to "did PRICES move or the MIX?" — the
    * economics complement to the revenue-bridge row (price_volume_mix).
    */
  def analyticsFisherPriceIndex(s: SparkSession, d: String): DataFrame = {
    def yr(y: Int) = lineitem(s, d)
      .filter(expr(s"year(l_shipdate) = $y"))
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as(s"rev$y"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as(s"q$y"))
    val j = yr(1995).join(yr(1996), Seq("pk"))
      .select(
        // p0q0 = rev95 (exact); p1q1 = rev96 (exact)
        col("rev1995").as("p0q0"), col("rev1996").as("p1q1"),
        // p1q0 = rev96/q96 · q95; p0q1 = rev95/q95 · q96 — quantized ·1e3
        expr("CAST(floor(CAST(rev1996 AS DOUBLE) / q1996 * q1995 * 1e3 + 0.5) AS BIGINT)").as("p1q0_q"),
        expr("CAST(floor(CAST(rev1995 AS DOUBLE) / q1995 * q1996 * 1e3 + 0.5) AS BIGINT)").as("p0q1_q"))
    j.agg(count(lit(1)).cast("long").as("n_parts"),
        sum(col("p0q0")).cast("decimal(38,0)").as("s00"),
        sum(col("p1q1")).cast("decimal(38,0)").as("s11"),
        sum(expr("CAST(p1q0_q AS DECIMAL(38,0))")).cast("decimal(38,0)").as("s10"),
        sum(expr("CAST(p0q1_q AS DECIMAL(38,0))")).cast("decimal(38,0)").as("s01"))
      .selectExpr("n_parts",
        "CAST(s10 AS DOUBLE) / 1e3 / CAST(s00 AS DOUBLE) AS laspeyres",
        "CAST(s11 AS DOUBLE) / (CAST(s01 AS DOUBLE) / 1e3) AS paasche")
      .selectExpr("n_parts",
        "round(laspeyres, 6) AS laspeyres",
        "round(paasche, 6) AS paasche",
        "round(sqrt(laspeyres * paasche), 6) AS fisher_ideal")
  }
  val analyticsFisherPriceIndexSql: String =
    """WITH y95 AS (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS rev95,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q95
      |  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1),
      |y96 AS (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS rev96,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q96
      |  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
      |j AS (
      |  SELECT a.rev95 AS p0q0, b.rev96 AS p1q1,
      |    CAST(floor(CAST(b.rev96 AS DOUBLE) / b.q96 * a.q95 * 1e3 + 0.5) AS BIGINT) AS p1q0_q,
      |    CAST(floor(CAST(a.rev95 AS DOUBLE) / a.q95 * b.q96 * 1e3 + 0.5) AS BIGINT) AS p0q1_q
      |  FROM y95 a JOIN y96 b ON b.pk = a.pk),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(p0q0) AS DECIMAL(38,0)) AS s00,
      |    CAST(sum(p1q1) AS DECIMAL(38,0)) AS s11,
      |    CAST(sum(CAST(p1q0_q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s10,
      |    CAST(sum(CAST(p0q1_q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s01
      |  FROM j),
      |v AS (
      |  SELECT n_parts,
      |    CAST(s10 AS DOUBLE) / 1e3 / CAST(s00 AS DOUBLE) AS laspeyres,
      |    CAST(s11 AS DOUBLE) / (CAST(s01 AS DOUBLE) / 1e3) AS paasche
      |  FROM ag)
      |SELECT n_parts,
      |  round(laspeyres, 6) AS laspeyres,
      |  round(paasche, 6) AS paasche,
      |  round(sqrt(laspeyres * paasche), 6) AS fisher_ideal
      |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_press_r2" -> (statPressR2 _),
    "stat_pi_coverage_backtest" -> (statPiCoverageBacktest _),
    "stat_gpd_pwm_fit" -> (statGpdPwmFit _),
    "analytics_fisher_price_index" -> (analyticsFisherPriceIndex _),
  )

  val oracle: Map[String, String] = Map(
    "stat_press_r2" -> statPressR2Sql,
    "stat_pi_coverage_backtest" -> statPiCoverageBacktestSql,
    "stat_gpd_pwm_fit" -> statGpdPwmFitSql,
    "analytics_fisher_price_index" -> analyticsFisherPriceIndexSql,
  )
}
