package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 124 (C900–C903): autocorrelation-robust regression + serially-
  * correlated-error correction + unequal-variance post-hoc + reliability
  * growth — Newey–West HAC standard errors, one-step Cochrane–Orcutt,
  * the Games–Howell all-pairs battery, and the Duane log-log growth fit.
  *
  * Shared discipline: the daily/hourly regression frames are calendar-
  * bounded; centered regressors are kept as EXACT integers (X = n·t−Σt),
  * residuals and transformed series are quantized before any cross-
  * engine sum; lag products ride one bounded window; the only joins are
  * broadcasts of ≤5-row group aggregates (whitelisted, the
  * stat_tukey_hsd_matrix shape).
  */
object Extras224 {

  /** C900 stat_newey_west — the OLS slope of daily revenue on time with
    * Newey–West HAC(L=5, Bartlett) standard errors next to the naive
    * OLS SE: Var(b) = n²·(ΣX²e² + 2Σₗ(1−l/6)·ΣXXₗeeₗ)/(ΣX²)² with
    * X = n·t − Σt exact integers and residuals quantized to integer
    * DOLLARS (not cents: Σx²e² with cent residuals approaches the
    * DECIMAL(38,0) ceiling near sf100 where Spark non-ANSI decimal
    * silently NULLs — the Extras154 overflow class; dollar residuals
    * buy 1e4 headroom), so every autocovariance term is an exact
    * integer sum — identical in both engines regardless of
    * partitioning. The SE any trend-over-time claim should quote when
    * errors are serially correlated (daily revenue always is).
    */
  def statNeweyWest(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val mom = days.agg(count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("long").as("st"),
      sum(expr("t * t")).cast("long").as("stt"),
      sum(col("v")).cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("stv"))
    val withB = days.crossJoin(broadcast(mom))
      .withColumn("b", expr(
        """(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)""".stripMargin))
      .withColumn("a", expr("(CAST(sv AS DOUBLE) - b * st) / n"))
      .select(col("day"), col("n"),
        expr("n * t - st").as("x"),
        expr("CAST(floor((v - a - b * t) / 100 + 0.5) AS BIGINT)").as("eq"))
    val w = Window.orderBy("day")
    val lagged = withB
      .withColumn("e1", lag(col("eq"), 1).over(w)).withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("e2", lag(col("eq"), 2).over(w)).withColumn("x2", lag(col("x"), 2).over(w))
      .withColumn("e3", lag(col("eq"), 3).over(w)).withColumn("x3", lag(col("x"), 3).over(w))
      .withColumn("e4", lag(col("eq"), 4).over(w)).withColumn("x4", lag(col("x"), 4).over(w))
      .withColumn("e5", lag(col("eq"), 5).over(w)).withColumn("x5", lag(col("x"), 5).over(w))
    val sums = lagged.agg(
      max(col("n")).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x * eq * eq")).cast("decimal(38,0)").as("s0"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x1 * eq * e1")).cast("decimal(38,0)").as("g1"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x2 * eq * e2")).cast("decimal(38,0)").as("g2"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x3 * eq * e3")).cast("decimal(38,0)").as("g3"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x4 * eq * e4")).cast("decimal(38,0)").as("g4"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x5 * eq * e5")).cast("decimal(38,0)").as("g5"),
      sum(expr("CAST(eq AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("see"))
    sums.crossJoin(broadcast(mom.select(col("st"), col("stt"), col("sv"), col("stv"))))
      .selectExpr("n",
        """(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b""".stripMargin,
        """CAST(n AS DOUBLE) * n
          |* (CAST(s0 AS DOUBLE) + 2 * (5 * CAST(g1 AS DOUBLE) + 4 * CAST(g2 AS DOUBLE)
          |   + 3 * CAST(g3 AS DOUBLE) + 2 * CAST(g4 AS DOUBLE) + CAST(g5 AS DOUBLE)) / 6)
          |/ (CAST(sxx AS DOUBLE) * CAST(sxx AS DOUBLE)) AS var_hac""".stripMargin,
        """CAST(see AS DOUBLE) / (n - 2) * CAST(n AS DOUBLE) * n
          |/ CAST(sxx AS DOUBLE) AS var_ols""".stripMargin)
      .selectExpr("n AS n_days",
        "round(b / 100, 6) AS slope_dollars_per_day",
        "round(sqrt(var_ols), 6) AS se_ols",
        "round(sqrt(var_hac), 6) AS se_hac",
        "round(b / 100 / sqrt(var_hac), 4) AS t_hac",
        "round(sqrt(var_hac / var_ols), 4) AS hac_inflation")
  }
  val statNeweyWestSql: String =
    """WITH days AS (
      |  SELECT day, v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM (
      |    SELECT CAST(o_orderdate AS DATE) AS day,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
      |    CAST(sum(t * t) AS BIGINT) AS stt,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(t AS HUGEINT) * v) AS DECIMAL(38,0)) AS stv
      |  FROM days),
      |wb AS (
      |  SELECT day, n,
      |    n * t - st AS x,
      |    CAST(floor((v - (CAST(sv AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)) * st) / n
      |      - ((CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)) * t) / 100 + 0.5) AS BIGINT) AS eq
      |  FROM days, mom),
      |lagged AS (
      |  SELECT *, lag(eq, 1) OVER w AS e1, lag(x, 1) OVER w AS x1,
      |    lag(eq, 2) OVER w AS e2, lag(x, 2) OVER w AS x2,
      |    lag(eq, 3) OVER w AS e3, lag(x, 3) OVER w AS x3,
      |    lag(eq, 4) OVER w AS e4, lag(x, 4) OVER w AS x4,
      |    lag(eq, 5) OVER w AS e5, lag(x, 5) OVER w AS x5
      |  FROM wb WINDOW w AS (ORDER BY day)),
      |sums AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * x * eq * eq) AS DECIMAL(38,0)) AS s0,
      |    CAST(sum(CAST(x AS HUGEINT) * x1 * eq * e1) AS DECIMAL(38,0)) AS g1,
      |    CAST(sum(CAST(x AS HUGEINT) * x2 * eq * e2) AS DECIMAL(38,0)) AS g2,
      |    CAST(sum(CAST(x AS HUGEINT) * x3 * eq * e3) AS DECIMAL(38,0)) AS g3,
      |    CAST(sum(CAST(x AS HUGEINT) * x4 * eq * e4) AS DECIMAL(38,0)) AS g4,
      |    CAST(sum(CAST(x AS HUGEINT) * x5 * eq * e5) AS DECIMAL(38,0)) AS g5,
      |    CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS see
      |  FROM lagged),
      |fin AS (
      |  SELECT sums.n AS n,
      |    (CAST(sums.n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |    / (CAST(sums.n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
      |    CAST(sums.n AS DOUBLE) * sums.n
      |    * (CAST(s0 AS DOUBLE) + 2 * (5 * CAST(g1 AS DOUBLE) + 4 * CAST(g2 AS DOUBLE)
      |       + 3 * CAST(g3 AS DOUBLE) + 2 * CAST(g4 AS DOUBLE) + CAST(g5 AS DOUBLE)) / 6)
      |    / (CAST(sxx AS DOUBLE) * CAST(sxx AS DOUBLE)) AS var_hac,
      |    CAST(see AS DOUBLE) / (sums.n - 2) * CAST(sums.n AS DOUBLE) * sums.n / CAST(sxx AS DOUBLE) AS var_ols
      |  FROM sums, mom)
      |SELECT n AS n_days,
      |  round(b / 100, 6) AS slope_dollars_per_day,
      |  round(sqrt(var_ols), 6) AS se_ols,
      |  round(sqrt(var_hac), 6) AS se_hac,
      |  round(b / 100 / sqrt(var_hac), 4) AS t_hac,
      |  round(sqrt(var_hac / var_ols), 4) AS hac_inflation
      |FROM fin""".stripMargin

  /** C901 stat_cochrane_orcutt — one-step Cochrane–Orcutt AR(1)
    * correction of the same daily trend regression: ρ̂ from the exact
    * integer lag-product sums of the quantized OLS residuals, the
    * quasi-differenced series y* = vₜ−ρvₜ₋₁, x* = t−ρ(t−1) re-quantized
    * (·10⁶ for x*) before the second OLS so both engines sum identical
    * integers, plus the Durbin–Watson statistic that motivates the
    * correction. What an honest trend estimate quotes when DW ≪ 2.
    */
  def statCochraneOrcutt(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val mom = days.agg(count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("long").as("st"),
      sum(expr("t * t")).cast("long").as("stt"),
      sum(col("v")).cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("stv"))
    val res = days.crossJoin(broadcast(mom))
      .withColumn("b", expr(
        """(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)""".stripMargin))
      .withColumn("eq", expr(
        "CAST(floor(v - (CAST(sv AS DOUBLE) - b * st) / n - b * t + 0.5) AS BIGINT)"))
      .select(col("day"), col("v"), col("t"),
        expr("(CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))"
          + "/ (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)").as("b_ols"), col("eq"))
    val w = Window.orderBy("day")
    val lagd = res.withColumn("e1", lag(col("eq"), 1).over(w))
      .withColumn("v1", lag(col("v"), 1).over(w))
    val rho = lagd.agg(
        sum(expr("CAST(eq AS DECIMAL(38,0)) * e1")).cast("decimal(38,0)").as("num"),
        sum(expr("CASE WHEN e1 IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE CAST(e1 AS DECIMAL(38,0)) * e1 END"))
          .cast("decimal(38,0)").as("den"),
        sum(expr("CAST(eq - coalesce(e1, eq) AS DECIMAL(38,0)) * (eq - coalesce(e1, eq))"))
          .cast("decimal(38,0)").as("sdd"),
        sum(expr("CAST(eq AS DECIMAL(38,0)) * eq")).cast("decimal(38,0)").as("see"),
        max(expr("b_ols")).as("b_ols"))
      .selectExpr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho",
        "CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) AS dw", "b_ols")
    val star = lagd.crossJoin(broadcast(rho))
      .filter(col("v1").isNotNull)
      .select(
        expr("CAST(floor((t - rho * (t - 1)) * 1e6 + 0.5) AS BIGINT)").as("xs"),
        expr("CAST(floor(v - rho * v1 + 0.5) AS BIGINT)").as("ys"))
    val fit = star.agg(count(lit(1)).cast("long").as("m"),
      sum(col("xs")).cast("decimal(38,0)").as("sx"),
      sum(expr("CAST(xs AS DECIMAL(38,0)) * xs")).cast("decimal(38,0)").as("sxx"),
      sum(col("ys")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(xs AS DECIMAL(38,0)) * ys")).cast("decimal(38,0)").as("sxy"))
    fit.crossJoin(broadcast(rho))
      .selectExpr("m + 1 AS n_days", "round(rho, 6) AS rho", "round(dw, 6) AS dw_stat",
        "round(b_ols / 100, 6) AS slope_ols",
        """round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |* 1e6 / 100, 6) AS slope_co""".stripMargin)
  }
  val statCochraneOrcuttSql: String =
    """WITH days AS (
      |  SELECT day, v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM (
      |    SELECT CAST(o_orderdate AS DATE) AS day,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
      |    CAST(sum(t * t) AS BIGINT) AS stt,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(t AS HUGEINT) * v) AS DECIMAL(38,0)) AS stv
      |  FROM days),
      |res AS (
      |  SELECT day, v, t,
      |    (CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b_ols,
      |    CAST(floor(v - (CAST(sv AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)) * st) / n
      |      - ((CAST(n AS DOUBLE) * CAST(stv AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)) * t + 0.5) AS BIGINT) AS eq
      |  FROM days, mom),
      |lagd AS (
      |  SELECT *, lag(eq) OVER (ORDER BY day) AS e1, lag(v) OVER (ORDER BY day) AS v1
      |  FROM res),
      |rho AS (
      |  SELECT CAST(CAST(sum(CAST(eq AS HUGEINT) * e1) AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(CAST(sum(CASE WHEN e1 IS NULL THEN 0 ELSE CAST(e1 AS HUGEINT) * e1 END) AS DECIMAL(38,0)) AS DOUBLE) AS rho,
      |    CAST(CAST(sum(CAST(eq - coalesce(e1, eq) AS HUGEINT) * (eq - coalesce(e1, eq))) AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(CAST(sum(CAST(eq AS HUGEINT) * eq) AS DECIMAL(38,0)) AS DOUBLE) AS dw,
      |    max(b_ols) AS b_ols
      |  FROM lagd),
      |star AS (
      |  SELECT CAST(floor((t - rho * (t - 1)) * 1e6 + 0.5) AS BIGINT) AS xs,
      |    CAST(floor(v - rho * v1 + 0.5) AS BIGINT) AS ys
      |  FROM lagd, rho WHERE v1 IS NOT NULL),
      |fit AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(CAST(xs AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(xs AS HUGEINT) * xs) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(ys AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(xs AS HUGEINT) * ys) AS DECIMAL(38,0)) AS sxy
      |  FROM star)
      |SELECT m + 1 AS n_days, round(rho, 6) AS rho, round(dw, 6) AS dw_stat,
      |  round(b_ols / 100, 6) AS slope_ols,
      |  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  * 1e6 / 100, 6) AS slope_co
      |FROM fit, rho""".stripMargin

  /** C902 stat_games_howell — the Games–Howell all-pairs post-hoc for
    * unequal variances: every ordered pair of priority groups, Welch
    * SE, the studentized-range statistic q = |Δ|/√((vᵢ/nᵢ+vⱼ/nⱼ)/2),
    * pair-specific Welch–Satterthwaite df, decision vs the
    * q₀.₀₅,₅,∞ = 3.858 critical value (dfs here are ~10⁵ so the ∞-df
    * row of the studentized-range table is exact to the rounding).
    * The honest post-hoc when group spreads differ — Tukey HSD's
    * pooled variance (C588) is anticonservative there.
    * Scale: 5-row aggregate self-joined under the whitelisted bounded
    * BNLJ shape; all moments exact cent integers.
    */
  def statGamesHowell(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"))
      .selectExpr("grp", "n", "CAST(s1 AS DOUBLE) / n AS m",
        """(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
          | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1)) AS vv""".stripMargin)
    val b = g.selectExpr("grp AS grp2", "n AS n2", "m AS m2", "vv AS vv2")
    g.crossJoin(broadcast(b)).filter(col("grp") < col("grp2"))
      .selectExpr("grp AS g1", "grp2 AS g2",
        "m - m2 AS diff", "vv / n AS w1", "vv2 / n2 AS w2", "n", "n2")
      .selectExpr("g1", "g2",
        "round(diff / 100, 2) AS diff_dollars",
        "round(abs(diff) / sqrt((w1 + w2) / 2), 4) AS q_stat",
        """round((w1 + w2) * (w1 + w2)
          |/ (w1 * w1 / (n - 1) + w2 * w2 / (n2 - 1)), 1) AS df_welch""".stripMargin,
        "CASE WHEN abs(diff) / sqrt((w1 + w2) / 2) > 3.858 THEN 1L ELSE 0L END AS significant")
      .orderBy("g1", "g2")
  }
  val statGamesHowellSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE) / count(*) AS m,
      |    (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |        * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE)
      |     - CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE)
      |       * CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) AS vv
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT a.grp AS g1, b.grp AS g2, a.m - b.m AS diff,
      |    a.vv / a.n AS w1, b.vv / b.n AS w2, a.n AS n, b.n AS n2
      |  FROM g a, g b WHERE a.grp < b.grp)
      |SELECT g1, g2,
      |  round(diff / 100, 2) AS diff_dollars,
      |  round(abs(diff) / sqrt((w1 + w2) / 2), 4) AS q_stat,
      |  round((w1 + w2) * (w1 + w2)
      |    / (w1 * w1 / (n - 1) + w2 * w2 / (n2 - 1)), 1) AS df_welch,
      |  CAST(CASE WHEN abs(diff) / sqrt((w1 + w2) / 2) > 3.858 THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM p ORDER BY g1, g2""".stripMargin

  /** C903 analytics_duane_growth — the Duane reliability-growth fit on
    * the purchase-event stream: cumulative event count N(T) at each
    * hour offset T since the first event-hour, log-log OLS of ln N on
    * ln T with both logs quantized ·10⁶ from exact integers (so the
    * moments are exact integer sums), slope β̂ (N ≈ λT^β), λ̂ from the
    * intercept, and the improving/degrading verdict (β<1 ⇔ the
    * inter-arrival rate is falling). The growth curve every burn-in /
    * incident-rate review plots.
    * Scale: hourly frame is calendar-bounded; the cumulative count is
    * one bounded window; everything downstream is a 1-row aggregate.
    */
  def analyticsDuaneGrowth(s: SparkSession, d: String): DataFrame = {
    val hours = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(expr("date_trunc('hour', ts)").as("h"))
      .agg(count(lit(1)).cast("long").as("c"))
    val h0 = hours.agg(min(col("h")).as("h0"))
    val cum = hours.crossJoin(broadcast(h0))
      .select(expr("CAST((unix_timestamp(h) - unix_timestamp(h0)) / 3600 AS BIGINT) + 1").as("tt"),
        col("c"))
      .withColumn("nn", sum(col("c")).over(
        Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        expr("CAST(floor(ln(CAST(tt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)").as("lx"),
        expr("CAST(floor(ln(CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)").as("ly"))
    cum.agg(count(lit(1)).cast("long").as("k"),
        sum(col("lx")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(lx AS DECIMAL(38,0)) * lx")).cast("decimal(38,0)").as("sxx"),
        sum(col("ly")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(lx AS DECIMAL(38,0)) * ly")).cast("decimal(38,0)").as("sxy"))
      .selectExpr("k AS n_hours",
        """round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta""".stripMargin,
        """round(exp((CAST(sy AS DOUBLE) - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / k / 1e6), 6) AS lambda_hat""".stripMargin,
        """CASE WHEN (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) < 1
          |THEN 'improving' ELSE 'degrading' END AS verdict""".stripMargin)
  }
  val analyticsDuaneGrowthSql: String =
    """WITH hours AS (
      |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |h0 AS (SELECT min(h) AS h0 FROM hours),
      |cum AS (
      |  SELECT CAST(floor(ln(CAST(tt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lx,
      |    CAST(floor(ln(CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ly
      |  FROM (
      |    SELECT CAST(datediff('hour', h0, h) AS BIGINT) + 1 AS tt,
      |      sum(c) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nn
      |    FROM hours, h0)),
      |fit AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(CAST(lx AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(lx AS HUGEINT) * lx) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(ly AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(lx AS HUGEINT) * ly) AS DECIMAL(38,0)) AS sxy
      |  FROM cum)
      |SELECT k AS n_hours,
      |  round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
      |  round(exp((CAST(sy AS DOUBLE) - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / k / 1e6), 6) AS lambda_hat,
      |  CASE WHEN (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) < 1
      |  THEN 'improving' ELSE 'degrading' END AS verdict
      |FROM fit""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_newey_west" -> (statNeweyWest _),
    "stat_cochrane_orcutt" -> (statCochraneOrcutt _),
    "stat_games_howell" -> (statGamesHowell _),
    "analytics_duane_growth" -> (analyticsDuaneGrowth _),
  )

  val oracle: Map[String, String] = Map(
    "stat_newey_west" -> statNeweyWestSql,
    "stat_cochrane_orcutt" -> statCochraneOrcuttSql,
    "stat_games_howell" -> statGamesHowellSql,
    "analytics_duane_growth" -> analyticsDuaneGrowthSql,
  )
}
