package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 133 (C936–C939): the dynamic-causal quartet — the event-study
  * coefficient path, VAR(1) impulse responses, VanderWeele's E-value
  * sensitivity bound, and an inverse-MSE synthetic control.
  *
  * Shared discipline: event-study cells are exact group-month moments
  * normalized to the k=−1 baseline broadcast; VAR inputs are
  * ·10⁹-quantized standardized series so every cross-moment is an
  * exact integer sum over the bounded monthly frame; the E-value is
  * closed-form algebra on exact 2×2 counts; synthetic-control donor
  * contributions quantize ·10⁶ per (month, donor) before the pool sum.
  */
object Extras233 {

  /** C936 analytics_event_study — the dynamic DiD coefficient path
    * around the 1996-01 event: for relative months k ∈ [−6, 6], the
    * treated-minus-control mean-order-total gap normalized to k = −1
    * (the convention that makes pre-trend violations VISIBLE instead
    * of averaged away like C934's single DiD). 13 rows, exact cents.
    */
  def analyticsEventStudy(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .select(expr("CASE WHEN c_nationkey < 12 THEN 1L ELSE 0L END").as("tr"),
        expr("CAST(months_between(date_trunc('month', o_orderdate), DATE '1996-01-01') AS BIGINT)")
          .as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .filter(expr("k >= -6 AND k <= 6"))
      .groupBy("k", "tr")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("v")).cast("decimal(38,0)").as("s1"))
    val diff = cells.groupBy("k")
      .agg(sum(col("n")).cast("long").as("n"),
        (max(expr("CASE WHEN tr = 1 THEN CAST(s1 AS DOUBLE) / n END"))
          - max(expr("CASE WHEN tr = 0 THEN CAST(s1 AS DOUBLE) / n END"))).as("gap"))
    val base = diff.filter(col("k") === -1L).selectExpr("gap AS gap0")
    diff.crossJoin(broadcast(base))
      .selectExpr("k AS rel_month", "n AS n_orders",
        "round(gap / 100, 2) AS gap_dollars",
        "round((gap - gap0) / 100, 2) AS effect_vs_km1")
      .orderBy("rel_month")
  }
  val analyticsEventStudySql: String =
    """WITH cells AS (
      |  SELECT k, tr, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS s1
      |  FROM (
      |    SELECT CASE WHEN c_nationkey < 12 THEN 1 ELSE 0 END AS tr,
      |      CAST(datediff('month', DATE '1996-01-01', date_trunc('month', o_orderdate)) AS BIGINT) AS k,
      |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v
      |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |  WHERE k >= -6 AND k <= 6 GROUP BY 1, 2),
      |diff AS (
      |  SELECT k, CAST(sum(n) AS BIGINT) AS n,
      |    max(CASE WHEN tr = 1 THEN CAST(s1 AS DOUBLE) / n END)
      |      - max(CASE WHEN tr = 0 THEN CAST(s1 AS DOUBLE) / n END) AS gap
      |  FROM cells GROUP BY 1),
      |base AS (SELECT gap AS gap0 FROM diff WHERE k = -1)
      |SELECT k AS rel_month, n AS n_orders,
      |  round(gap / 100, 2) AS gap_dollars,
      |  round((gap - gap0) / 100, 2) AS effect_vs_km1
      |FROM diff, base ORDER BY rel_month""".stripMargin

  /** C937 time_var_irf — a bivariate VAR(1) on standardized monthly
    * (order count, revenue): A = C₁C₀⁻¹ from ·10⁹-quantized z-scores
    * (every cross-moment an exact integer sum), impulse responses of
    * revenue to a unit count shock at h = 1, 2, 3 via inline 2×2
    * powers, and the stability modulus |λ|max from trace/determinant.
    * The minimal dynamic-system view the single-lag Granger row (C496)
    * can't give — how long does a shock echo?
    */
  def timeVarIrf(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(count(lit(1)).cast("long").as("u"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("v"))
    val mom = ms.agg(count(lit(1)).cast("long").as("n"),
      sum(col("u")).cast("decimal(38,0)").as("su"),
      sum(expr("CAST(u AS DECIMAL(38,0)) * u")).cast("decimal(38,0)").as("suu"),
      sum(col("v")).cast("decimal(38,0)").as("sv"),
      sum(expr("v * v")).cast("decimal(38,0)").as("svv"))
    val z = ms.crossJoin(broadcast(mom))
      .select(col("m"),
        expr("""CAST(floor((u - CAST(su AS DOUBLE) / n)
          |/ sqrt((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
          |       / (CAST(n AS DOUBLE) * (n - 1))) * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("zu"),
        expr("""CAST(floor((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / n)
          |/ sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          |       / (CAST(n AS DOUBLE) * (n - 1))) * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("zv"))
    val w = Window.orderBy("m")
    val lagged = z
      .withColumn("pu", lag(col("zu"), 1).over(w))
      .withColumn("pv", lag(col("zv"), 1).over(w))
      .filter(col("pu").isNotNull)
    val sums = lagged.agg(
      sum(expr("CAST(pu AS DECIMAL(38,0)) * pu")).cast("decimal(38,0)").as("c0uu"),
      sum(expr("CAST(pu AS DECIMAL(38,0)) * pv")).cast("decimal(38,0)").as("c0uv"),
      sum(expr("CAST(pv AS DECIMAL(38,0)) * pv")).cast("decimal(38,0)").as("c0vv"),
      sum(expr("CAST(zu AS DECIMAL(38,0)) * pu")).cast("decimal(38,0)").as("c1uu"),
      sum(expr("CAST(zu AS DECIMAL(38,0)) * pv")).cast("decimal(38,0)").as("c1uv"),
      sum(expr("CAST(zv AS DECIMAL(38,0)) * pu")).cast("decimal(38,0)").as("c1vu"),
      sum(expr("CAST(zv AS DECIMAL(38,0)) * pv")).cast("decimal(38,0)").as("c1vv"))
    sums.selectExpr(
        "CAST(c0uu AS DOUBLE) AS g11", "CAST(c0uv AS DOUBLE) AS g12",
        "CAST(c0vv AS DOUBLE) AS g22",
        "CAST(c1uu AS DOUBLE) AS h11", "CAST(c1uv AS DOUBLE) AS h12",
        "CAST(c1vu AS DOUBLE) AS h21", "CAST(c1vv AS DOUBLE) AS h22")
      .selectExpr(
        "(h11 * g22 - h12 * g12) / (g11 * g22 - g12 * g12) AS a11",
        "(h12 * g11 - h11 * g12) / (g11 * g22 - g12 * g12) AS a12",
        "(h21 * g22 - h22 * g12) / (g11 * g22 - g12 * g12) AS a21",
        "(h22 * g11 - h21 * g12) / (g11 * g22 - g12 * g12) AS a22")
      .selectExpr(
        "round(a21, 6) AS irf_rev_1",
        "round(a21 * a11 + a22 * a21, 6) AS irf_rev_2",
        "round((a21 * a11 + a22 * a21) * a11 + (a21 * a12 + a22 * a22) * a21, 6) AS irf_rev_3",
        """round(CASE WHEN (a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21) >= 0
          |THEN greatest(abs((a11 + a22 + sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2),
          |              abs((a11 + a22 - sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2))
          |ELSE sqrt(a11 * a22 - a12 * a21) END, 6) AS stability_mod""".stripMargin,
        """CASE WHEN (CASE WHEN (a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21) >= 0
          |THEN greatest(abs((a11 + a22 + sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2),
          |              abs((a11 + a22 - sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2))
          |ELSE sqrt(a11 * a22 - a12 * a21) END) < 1 THEN 'stable' ELSE 'explosive' END AS verdict""".stripMargin)
  }
  val timeVarIrfSql: String =
    """WITH ms AS (
      |  SELECT date_trunc('month', o_orderdate) AS m, CAST(count(*) AS BIGINT) AS u,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS v
      |  FROM orders GROUP BY 1),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(u AS HUGEINT)) AS DECIMAL(38,0)) AS su,
      |    CAST(sum(CAST(u AS HUGEINT) * u) AS DECIMAL(38,0)) AS suu,
      |    CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS svv
      |  FROM ms),
      |z AS (
      |  SELECT m,
      |    CAST(floor((u - CAST(su AS DOUBLE) / n)
      |    / sqrt((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
      |           / (CAST(n AS DOUBLE) * (n - 1))) * 1e9 + 0.5) AS BIGINT) AS zu,
      |    CAST(floor((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE) / n)
      |    / sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      |           / (CAST(n AS DOUBLE) * (n - 1))) * 1e9 + 0.5) AS BIGINT) AS zv
      |  FROM ms, mom),
      |lagged AS (
      |  SELECT * FROM (
      |    SELECT zu, zv, lag(zu) OVER (ORDER BY m) AS pu, lag(zv) OVER (ORDER BY m) AS pv
      |    FROM z) WHERE pu IS NOT NULL),
      |sums AS (
      |  SELECT
      |    CAST(CAST(sum(CAST(pu AS HUGEINT) * pu) AS DECIMAL(38,0)) AS DOUBLE) AS g11,
      |    CAST(CAST(sum(CAST(pu AS HUGEINT) * pv) AS DECIMAL(38,0)) AS DOUBLE) AS g12,
      |    CAST(CAST(sum(CAST(pv AS HUGEINT) * pv) AS DECIMAL(38,0)) AS DOUBLE) AS g22,
      |    CAST(CAST(sum(CAST(zu AS HUGEINT) * pu) AS DECIMAL(38,0)) AS DOUBLE) AS h11,
      |    CAST(CAST(sum(CAST(zu AS HUGEINT) * pv) AS DECIMAL(38,0)) AS DOUBLE) AS h12,
      |    CAST(CAST(sum(CAST(zv AS HUGEINT) * pu) AS DECIMAL(38,0)) AS DOUBLE) AS h21,
      |    CAST(CAST(sum(CAST(zv AS HUGEINT) * pv) AS DECIMAL(38,0)) AS DOUBLE) AS h22
      |  FROM lagged),
      |amat AS (
      |  SELECT
      |    (h11 * g22 - h12 * g12) / (g11 * g22 - g12 * g12) AS a11,
      |    (h12 * g11 - h11 * g12) / (g11 * g22 - g12 * g12) AS a12,
      |    (h21 * g22 - h22 * g12) / (g11 * g22 - g12 * g12) AS a21,
      |    (h22 * g11 - h21 * g12) / (g11 * g22 - g12 * g12) AS a22
      |  FROM sums)
      |SELECT
      |  round(a21, 6) AS irf_rev_1,
      |  round(a21 * a11 + a22 * a21, 6) AS irf_rev_2,
      |  round((a21 * a11 + a22 * a21) * a11 + (a21 * a12 + a22 * a22) * a21, 6) AS irf_rev_3,
      |  round(CASE WHEN (a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21) >= 0
      |  THEN greatest(abs((a11 + a22 + sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2),
      |                abs((a11 + a22 - sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2))
      |  ELSE sqrt(a11 * a22 - a12 * a21) END, 6) AS stability_mod,
      |  CASE WHEN (CASE WHEN (a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21) >= 0
      |  THEN greatest(abs((a11 + a22 + sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2),
      |                abs((a11 + a22 - sqrt((a11 + a22) * (a11 + a22) - 4 * (a11 * a22 - a12 * a21))) / 2))
      |  ELSE sqrt(a11 * a22 - a12 * a21) END) < 1 THEN 'stable' ELSE 'explosive' END AS verdict
      |FROM amat""".stripMargin

  /** C938 stat_e_value — VanderWeele's E-value for the deep-discount →
    * return risk ratio: the minimum confounder strength (on the RR
    * scale, with both exposure and outcome) that could explain the
    * association away; E = RR* + √(RR*(RR*−1)) with RR* the
    * away-from-null direction, plus the E-value of the 95% CI bound
    * nearer the null. The one-line sensitivity analysis every
    * observational claim should carry.
    */
  def statEValue(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .select(expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("dd"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
      .groupBy("dd")
      .agg(count(lit(1)).cast("long").as("n"), sum(col("y")).cast("long").as("k"))
    val a = g.filter(col("dd") === 1L).selectExpr("n AS n1", "k AS k1")
    val b = g.filter(col("dd") === 0L).selectExpr("n AS n0", "k AS k0")
    a.crossJoin(broadcast(b))
      .selectExpr("n1", "n0",
        "(CAST(k1 AS DOUBLE) / n1) / (CAST(k0 AS DOUBLE) / n0) AS rr",
        """sqrt(CAST(1 AS DOUBLE) / k1 - CAST(1 AS DOUBLE) / n1
          | + CAST(1 AS DOUBLE) / k0 - CAST(1 AS DOUBLE) / n0) AS selog""".stripMargin)
      .selectExpr("n1", "n0", "rr",
        "exp(ln(rr) - 1.959964 * selog) AS cil", "exp(ln(rr) + 1.959964 * selog) AS ciu")
      .selectExpr("n1 AS n_discounted", "n0 AS n_full_price", "round(rr, 6) AS risk_ratio",
        "round(cil, 6) AS rr_ci_low",
        """round(CASE WHEN rr >= 1 THEN rr + sqrt(rr * (rr - 1))
          |ELSE CAST(1 AS DOUBLE) / rr + sqrt((CAST(1 AS DOUBLE) / rr) * (CAST(1 AS DOUBLE) / rr - 1)) END, 6)
          |AS e_value""".stripMargin,
        """round(CASE
          |WHEN rr >= 1 AND cil > 1 THEN cil + sqrt(cil * (cil - 1))
          |WHEN rr < 1 AND ciu < 1 THEN CAST(1 AS DOUBLE) / ciu + sqrt((CAST(1 AS DOUBLE) / ciu) * (CAST(1 AS DOUBLE) / ciu - 1))
          |ELSE CAST(1 AS DOUBLE) END, 6) AS e_value_ci""".stripMargin)
  }
  val statEValueSql: String =
    """WITH g AS (
      |  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS dd,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM lineitem GROUP BY 1),
      |ab AS (
      |  SELECT a.n AS n1, a.k AS k1, b.n AS n0, b.k AS k0,
      |    (CAST(a.k AS DOUBLE) / a.n) / (CAST(b.k AS DOUBLE) / b.n) AS rr,
      |    sqrt(CAST(1 AS DOUBLE) / a.k - CAST(1 AS DOUBLE) / a.n
      |     + CAST(1 AS DOUBLE) / b.k - CAST(1 AS DOUBLE) / b.n) AS selog
      |  FROM g a, g b WHERE a.dd = 1 AND b.dd = 0),
      |ci AS (
      |  SELECT n1, n0, rr,
      |    exp(ln(rr) - 1.959964 * selog) AS cil, exp(ln(rr) + 1.959964 * selog) AS ciu
      |  FROM ab)
      |SELECT n1 AS n_discounted, n0 AS n_full_price, round(rr, 6) AS risk_ratio,
      |  round(cil, 6) AS rr_ci_low,
      |  round(CASE WHEN rr >= 1 THEN rr + sqrt(rr * (rr - 1))
      |  ELSE CAST(1 AS DOUBLE) / rr + sqrt((CAST(1 AS DOUBLE) / rr) * (CAST(1 AS DOUBLE) / rr - 1)) END, 6)
      |  AS e_value,
      |  round(CASE
      |  WHEN rr >= 1 AND cil > 1 THEN cil + sqrt(cil * (cil - 1))
      |  WHEN rr < 1 AND ciu < 1 THEN CAST(1 AS DOUBLE) / ciu + sqrt((CAST(1 AS DOUBLE) / ciu) * (CAST(1 AS DOUBLE) / ciu - 1))
      |  ELSE CAST(1 AS DOUBLE) END, 6) AS e_value_ci
      |FROM ci""".stripMargin

  /** C939 analytics_synthetic_control — an inverse-MSE synthetic
    * control for nation 0's monthly mean order total: donor nations
    * 1–24 weighted ∝ 1/(preMSE_d + 1) on the pre-1997 window
    * (the documented deterministic variant of Abadie's QP — same
    * donor-pool idea, closed-form weights), synthetic series = the
    * weighted donor pool with per-(month, donor) contributions
    * ·10⁶-quantized before the sum; reports pre-RMSE (fit quality)
    * and the post-1997 mean gap — the "what would have happened"
    * counterfactual for a unit-level intervention.
    */
  def analyticsSyntheticControl(s: SparkSession, d: String): DataFrame = {
    val nm = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .groupBy(col("c_nationkey").as("nk"), expr("date_trunc('month', o_orderdate)").as("m"))
      .agg((sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").cast("double") / count(lit(1))).as("y"))
      .localCheckpoint(true) // <= 25 nations x months rows, many consumers
    val t0 = nm.filter(col("nk") === 0L).select(col("m"), col("y").as("y0"))
    val donors = nm.filter(col("nk") =!= 0L)
    val mse = donors.join(t0, Seq("m"))
      .filter(expr("m < DATE '1997-01-01'"))
      .groupBy("nk")
      .agg(sum(expr("CAST(floor((y - y0) * (y - y0) / 1e4 + 0.5) AS BIGINT)")).cast("long").as("sq"),
        count(lit(1)).cast("long").as("np"))
      .selectExpr("nk", "CAST(1 AS DOUBLE) / (CAST(sq AS DOUBLE) * 1e4 / np + 1) AS wraw")
    val wsum = mse.agg(sum(col("wraw")).as("ws"))
    val wts = mse.crossJoin(broadcast(wsum)).selectExpr("nk", "wraw / ws AS w")
    val synth = donors.join(broadcast(wts), Seq("nk"))
      .groupBy("m")
      .agg(sum(expr("CAST(floor(w * y * 1e6 + 0.5) AS BIGINT)")).cast("long").as("sq6"))
      .selectExpr("m", "CAST(sq6 AS DOUBLE) / 1e6 AS ys")
    val joined = t0.join(synth, Seq("m"))
      .select(col("m"), col("y0"), col("ys"),
        expr("CASE WHEN m < DATE '1997-01-01' THEN 1L ELSE 0L END").as("pre"))
    joined.agg(
        sum(col("pre")).cast("long").as("n_pre"),
        sum(expr("1L - pre")).cast("long").as("n_post"),
        sum(expr("CASE WHEN pre = 1 THEN CAST(floor((y0 - ys) * (y0 - ys) / 1e4 + 0.5) AS BIGINT) ELSE 0L END"))
          .cast("long").as("preq"),
        sum(expr("CASE WHEN pre = 0 THEN CAST(floor((y0 - ys) * 1e2 + 0.5) AS BIGINT) ELSE 0L END"))
          .cast("long").as("postgap"))
      .selectExpr("n_pre", "n_post",
        "round(sqrt(CAST(preq AS DOUBLE) * 1e4 / n_pre) / 100, 2) AS pre_rmse_dollars",
        "round(CAST(postgap AS DOUBLE) / 1e2 / n_post / 100, 2) AS post_gap_dollars",
        """round((CAST(postgap AS DOUBLE) / 1e2 / n_post)
          |/ sqrt(CAST(preq AS DOUBLE) * 1e4 / n_pre), 4) AS gap_over_pre_rmse""".stripMargin)
  }
  val analyticsSyntheticControlSql: String =
    """WITH nm AS (
      |  SELECT c_nationkey AS nk, date_trunc('month', o_orderdate) AS m,
      |    CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE)
      |      / count(*) AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |t0 AS (SELECT m, y AS y0 FROM nm WHERE nk = 0),
      |donors AS (SELECT * FROM nm WHERE nk <> 0),
      |mse AS (
      |  SELECT nk, CAST(1 AS DOUBLE) / (CAST(sq AS DOUBLE) * 1e4 / np + 1) AS wraw FROM (
      |    SELECT d.nk,
      |      CAST(sum(CAST(floor((d.y - t.y0) * (d.y - t.y0) / 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
      |      CAST(count(*) AS BIGINT) AS np
      |    FROM donors d JOIN t0 t ON d.m = t.m
      |    WHERE d.m < DATE '1997-01-01' GROUP BY 1)),
      |wsum AS (SELECT sum(wraw) AS ws FROM mse),
      |wts AS (SELECT nk, wraw / ws AS w FROM mse, wsum),
      |synth AS (
      |  SELECT d.m, CAST(sum(CAST(floor(w.w * d.y * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS ys
      |  FROM donors d JOIN wts w ON d.nk = w.nk GROUP BY 1),
      |joined AS (
      |  SELECT t.m, t.y0, s.ys,
      |    CASE WHEN t.m < DATE '1997-01-01' THEN 1 ELSE 0 END AS pre
      |  FROM t0 t JOIN synth s ON t.m = s.m),
      |agg AS (
      |  SELECT CAST(sum(pre) AS BIGINT) AS n_pre,
      |    CAST(sum(1 - pre) AS BIGINT) AS n_post,
      |    CAST(sum(CASE WHEN pre = 1 THEN CAST(floor((y0 - ys) * (y0 - ys) / 1e4 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS preq,
      |    CAST(sum(CASE WHEN pre = 0 THEN CAST(floor((y0 - ys) * 1e2 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS postgap
      |  FROM joined)
      |SELECT n_pre, n_post,
      |  round(sqrt(CAST(preq AS DOUBLE) * 1e4 / n_pre) / 100, 2) AS pre_rmse_dollars,
      |  round(CAST(postgap AS DOUBLE) / 1e2 / n_post / 100, 2) AS post_gap_dollars,
      |  round((CAST(postgap AS DOUBLE) / 1e2 / n_post)
      |  / sqrt(CAST(preq AS DOUBLE) * 1e4 / n_pre), 4) AS gap_over_pre_rmse
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_event_study" -> (analyticsEventStudy _),
    "time_var_irf" -> (timeVarIrf _),
    "stat_e_value" -> (statEValue _),
    "analytics_synthetic_control" -> (analyticsSyntheticControl _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_event_study" -> analyticsEventStudySql,
    "time_var_irf" -> timeVarIrfSql,
    "stat_e_value" -> statEValueSql,
    "analytics_synthetic_control" -> analyticsSyntheticControlSql,
  )
}
