package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 152 (C1028–C1035): two-sample EDF testing (Kolmogorov–Smirnov
  * via exact prefix-sum integers), ranking quality (average-precision
  * PR-AUC), robust regression (exact τ = 0.9 quantile regression by
  * candidate enumeration), spectral analysis of gappy series
  * (Lomb–Scargle at fixed periods), wavelet energy (Daubechies-4,
  * two levels), Wilder's ADX trend-strength system, Peto pooled odds
  * across nation strata, and Chauvenet's outlier criterion.
  *
  * Shared discipline: EDF gaps and AP terms are exact integers or
  * once-quantized normalized terms on the 1e15 grid; the quantile-
  * regression loss is an exact ×10-scaled integer per candidate line;
  * Lomb–Scargle trig terms quantize ·1e9 before exact DECIMAL sums
  * (two-pass τ then power); D4 coefficients quantize onto the 1e-3
  * dollar grid before integer energy sums; the ADX state machine
  * carries all four Wilder smoothings on 1e-3/1e-6 grids (driver walk
  * + recursive-CTE oracle); Peto (a−E) and V terms quantize ·1e9 on
  * the bounded 25-nation frame.
  */
object Extras252 {

  // ---------------------------------------------------------------- C1028
  /** stat_ks_two_sample — the two-sample Kolmogorov–Smirnov D between
    * purchase and view event-value distributions on the literally-
    * clamped cent grid (the C1003 histogram machinery): D·n_x·n_y =
    * max |cumX·n_y − cumY·n_x| is an EXACT integer max over the
    * bounded value histogram; the asymptotic two-sided p-value is the
    * 4-term Kolmogorov series evaluated identically in both engines.
    */
  def statKsTwoSample(s: SparkSession, d: String): DataFrame = {
    val h = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type").as("g"),
        expr("least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0L), 100000L)").as("v"))
      .groupBy("v")
      .agg(sum(when(col("g") === "purchase", 1L).otherwise(0L)).as("cx"),
        sum(when(col("g") === "view", 1L).otherwise(0L)).as("cy"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val pre = h
      .withColumn("fx", sum(col("cx")).over(w))
      .withColumn("fy", sum(col("cy")).over(w))
    pre.crossJoin(broadcast(
        h.agg(sum(col("cx")).cast("long").as("tnx"),
          sum(col("cy")).cast("long").as("tny"))))
      .agg(max(col("tnx")).as("nx"), max(col("tny")).as("ny"),
        max(expr("abs(CAST(fx AS DECIMAL(38,0)) * tny - CAST(fy AS DECIMAL(38,0)) * tnx)")).as("dmax"))
      .selectExpr("nx", "ny",
        "round(CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny), 6) AS d_stat",
        """round(2 * (exp(-2 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
          |- exp(-8 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
          |+ exp(-18 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
          |- exp(-32 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
          |  * (CAST(nx AS DOUBLE) * ny / (nx + ny)))), 6) AS p_asymptotic""".stripMargin)
  }
  val statKsTwoSampleSql: String =
    """WITH h AS (
      |  SELECT least(greatest(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT), 0), 100000) AS v,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      |  FROM events WHERE event_type IN ('purchase', 'view')
      |  GROUP BY 1),
      |pre AS (
      |  SELECT v, cx, cy,
      |    sum(cx) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fx,
      |    sum(cy) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fy
      |  FROM h),
      |tot AS (SELECT CAST(sum(cx) AS BIGINT) AS tnx, CAST(sum(cy) AS BIGINT) AS tny FROM h),
      |a AS (
      |  SELECT max(tnx) AS nx, max(tny) AS ny,
      |    max(abs(CAST(fx AS DECIMAL(38,0)) * tny - CAST(fy AS DECIMAL(38,0)) * tnx)) AS dmax
      |  FROM pre, tot)
      |SELECT nx, ny,
      |  round(CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny), 6) AS d_stat,
      |  round(2 * (exp(-2 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
      |  - exp(-8 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
      |  + exp(-18 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(nx AS DOUBLE) * ny / (nx + ny)))
      |  - exp(-32 * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(dmax AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))
      |    * (CAST(nx AS DOUBLE) * ny / (nx + ny)))), 6) AS p_asymptotic
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- C1029
  /** stat_pr_auc — average precision (step-interpolated PR-AUC) of the
    * C955 scorecard: descending-threshold inclusive cumulatives from
    * the GlobalRank exclusive prefixes, AP = Σ_g (og/O)·P_g with each
    * normalized term quantized ·1e15 before the exact 11-term sum.
    * The ranking-quality twin of C995's ROC AUC — the one that stays
    * honest under the 1:3 class imbalance here.
    */
  def statPrAuc(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_discount").as("x"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("og"))
      .withColumn("pq", expr(
        "CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * x))) + 0.5) AS BIGINT)"))
      .selectExpr("pq", "og", "ng - og AS zg")
    // bounded 11-row strata: shared single-task window, no GlobalRank
    // machinery (r14; plan-gate legal via the l_discount grouping)
    val spine = graft.plans.BoundedPrefix.prefixSums(
      g, Seq((col("zg"), "cumz"), (col("og"), "cumo")), Seq(col("pq").asc))
    val tot = g.agg(sum(col("og")).cast("long").as("o"),
      sum(col("zg")).cast("long").as("z"))
    spine.crossJoin(broadcast(tot))
      .selectExpr("o", "z",
        """CAST(floor(CAST(og AS DOUBLE) / o
          |* (CAST(o - cumo AS DOUBLE) / ((o - cumo) + (z - cumz)))
          |* 1e15 + 0.5) AS BIGINT) AS apq""".stripMargin)
      .groupBy("o", "z")
      .agg(sum(col("apq")).cast("long").as("ap"))
      .selectExpr("o + z AS n_items",
        "round(CAST(o AS DOUBLE) / (o + z), 6) AS prevalence",
        "round(CAST(ap AS DOUBLE) / 1e15, 6) AS pr_auc")
  }
  val statPrAucSql: String =
    """WITH g AS (
      |  SELECT CAST(floor(1e12 / (1 + exp(-(CAST(-0.7 AS DOUBLE) + 3 * l_discount))) + 0.5) AS BIGINT) AS pq,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og,
      |    CAST(count(*) - sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS zg
      |  FROM lineitem GROUP BY l_discount),
      |spine AS (
      |  SELECT pq, og, zg,
      |    CAST(coalesce(sum(zg) OVER (ORDER BY pq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumz,
      |    CAST(coalesce(sum(og) OVER (ORDER BY pq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumo
      |  FROM g),
      |tot AS (SELECT CAST(sum(og) AS BIGINT) AS o, CAST(sum(zg) AS BIGINT) AS z FROM g),
      |q AS (
      |  SELECT o, z,
      |    CAST(floor(CAST(og AS DOUBLE) / o
      |    * (CAST(o - cumo AS DOUBLE) / ((o - cumo) + (z - cumz)))
      |    * 1e15 + 0.5) AS BIGINT) AS apq
      |  FROM spine, tot)
      |SELECT o + z AS n_items,
      |  round(CAST(o AS DOUBLE) / (o + z), 6) AS prevalence,
      |  round(CAST(sum(apq) AS DOUBLE) / 1e15, 6) AS pr_auc
      |FROM q GROUP BY o, z""".stripMargin

  // ---------------------------------------------------------------- C1030
  /** stat_quantile_regression — EXACT τ = 0.9 quantile regression of
    * monthly revenue on time by candidate enumeration (the C951 LAD
    * machinery with the asymmetric check loss): an optimal quantile
    * line passes through two sample points, so all ≤C(80,2) candidate
    * lines are scored with the ×10-integer check loss (9·over + 1·
    * under) and the minimum taken with deterministic tie-breaks. The
    * 90th-percentile growth trend robust fitting can't fake.
    */
  def statQuantileRegression(s: SparkSession, d: String): DataFrame = {
    val seq0 = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .select(expr("CAST(row_number() OVER (ORDER BY m) AS BIGINT)").as("t"), col("v"))
      .localCheckpoint(true) // bounded 80-row calendar frame, consumed 3x
    val cand = seq0.selectExpr("t AS ti", "v AS vi")
      .join(seq0.selectExpr("t AS tj", "v AS vj"), expr("ti < tj"))
      .selectExpr("ti", "tj",
        "CAST(vj - vi AS DOUBLE) / (tj - ti) AS b",
        "vi - CAST(vj - vi AS DOUBLE) / (tj - ti) * ti AS a")
    val scored = cand.crossJoin(broadcast(seq0))
      .select(col("ti"), col("tj"), col("a"), col("b"),
        expr(
          """CASE WHEN v - a - b * t >= 0
            |THEN CAST(floor(9 * (v - a - b * t) + 0.5) AS BIGINT)
            |ELSE CAST(floor(1 * (a + b * t - v) + 0.5) AS BIGINT) END""".stripMargin)
          .as("q"))
      .groupBy("ti", "tj", "a", "b")
      .agg(sum(col("q")).cast("long").as("loss"), count(lit(1)).cast("long").as("nm"))
    scored.orderBy(col("loss"), col("ti"), col("tj")).limit(1)
      .selectExpr("nm AS n_months",
        "round(b / 100, 6) AS slope_dollars_per_month",
        "round(a / 100, 2) AS intercept_dollars",
        "round(CAST(loss AS DOUBLE) / 10 / 100, 2) AS check_loss_dollars")
  }
  val statQuantileRegressionSql: String =
    """WITH seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |cand AS (
      |  SELECT a.t AS ti, b.t AS tj,
      |    CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS b,
      |    a.v - CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) * a.t AS a
      |  FROM seq a JOIN seq b ON a.t < b.t),
      |scored AS (
      |  SELECT ti, tj, a, b,
      |    CAST(sum(CASE WHEN v - a - b * t >= 0
      |      THEN CAST(floor(9 * (v - a - b * t) + 0.5) AS BIGINT)
      |      ELSE CAST(floor(1 * (a + b * t - v) + 0.5) AS BIGINT) END) AS BIGINT) AS loss,
      |    CAST(count(*) AS BIGINT) AS nm
      |  FROM cand, seq GROUP BY 1, 2, 3, 4)
      |SELECT nm AS n_months,
      |  round(b / 100, 6) AS slope_dollars_per_month,
      |  round(a / 100, 2) AS intercept_dollars,
      |  round(CAST(loss AS DOUBLE) / 10 / 100, 2) AS check_loss_dollars
      |FROM scored ORDER BY loss, ti, tj LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- C1031
  /** time_lomb_scargle — the Lomb–Scargle normalized periodogram of
    * daily revenue at the four business periods (7 / 30.44 / 91.31 /
    * 365.25 days), the spectral tool that — unlike the FFT rows —
    * needs NO regular sampling and handles the no-order-day gaps
    * natively. Two exact passes: τ per period from ·1e9-quantized
    * Σsin2ωt / Σcos2ωt, then the centered power from cleared-
    * denominator integer products (y·n − S) × quantized trig, all in
    * DECIMAL. One final O(1) division per period.
    */
  def timeLombScargle(s: SparkSession, d: String): DataFrame = {
    val daily0 = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"))
    val base = daily0.agg(
      min(expr("CAST(datediff(day, CAST('1970-01-01' AS DATE)) AS BIGINT)"))
        .cast("long").as("t0"),
      count(lit(1)).cast("long").as("n"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
    val pts = daily0.crossJoin(broadcast(base))
      .selectExpr("CAST(datediff(day, CAST('1970-01-01' AS DATE)) AS BIGINT) - t0 AS t",
        "CAST(y AS DECIMAL(38,0)) * n - sy AS ycn", "n", "sy", "syy")
      .withColumn("p", explode(array(
        lit(7.0d), lit(30.44d), lit(91.31d), lit(365.25d))))
    val tau = pts.groupBy("p")
      .agg(sum(expr(
        "CAST(floor(sin(2 * (2 * pi() / p) * t) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("s2"),
        sum(expr(
          "CAST(floor(cos(2 * (2 * pi() / p) * t) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("c2"))
      .selectExpr("p AS tp",
        "atan2(CAST(s2 AS DOUBLE), CAST(c2 AS DOUBLE)) / (2 * (2 * pi() / tp)) AS tau")
    pts.join(broadcast(tau), col("p") === col("tp"))
      .selectExpr("p", "n", "sy", "syy",
        "CAST(floor(cos((2 * pi() / p) * (t - tau)) * 1e9 + 0.5) AS BIGINT) AS cq",
        "CAST(floor(sin((2 * pi() / p) * (t - tau)) * 1e9 + 0.5) AS BIGINT) AS sq",
        "ycn")
      .groupBy("p")
      .agg(max(col("n")).as("n"), max(col("sy")).as("sy"), max(col("syy")).as("syy"),
        sum(expr("ycn * cq")).cast("decimal(38,0)").as("yc"),
        sum(expr("ycn * sq")).cast("decimal(38,0)").as("ys"),
        sum(expr("CAST(cq AS DECIMAL(38,0)) * cq")).cast("decimal(38,0)").as("cc"),
        sum(expr("CAST(sq AS DECIMAL(38,0)) * sq")).cast("decimal(38,0)").as("ss"))
      .selectExpr("p AS period_days", "n AS n_days",
        """round(CAST(0.5 AS DOUBLE) * (
          |  (CAST(yc AS DOUBLE) / n / 1e9) * (CAST(yc AS DOUBLE) / n / 1e9)
          |    / (CAST(cc AS DOUBLE) / 1e18)
          |+ (CAST(ys AS DOUBLE) / n / 1e9) * (CAST(ys AS DOUBLE) / n / 1e9)
          |    / (CAST(ss AS DOUBLE) / 1e18))
          |/ ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * n)),
          |6) AS lomb_power_norm""".stripMargin)
      .orderBy("period_days")
  }
  val timeLombScargleSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT CAST(min(day - CAST('1970-01-01' AS DATE)) AS BIGINT) AS t0,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
      |  FROM daily),
      |pp AS (SELECT unnest([7.0, 30.44, 91.31, 365.25]) AS p),
      |pts AS (
      |  SELECT CAST(day - CAST('1970-01-01' AS DATE) AS BIGINT) - t0 AS t,
      |    CAST(y AS DECIMAL(38,0)) * n - sy AS ycn, n, sy, syy, p
      |  FROM daily, base, pp),
      |tau AS (
      |  SELECT p AS tp,
      |    atan2(CAST(sum(CAST(floor(sin(2 * (2 * pi() / p) * t) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE),
      |      CAST(sum(CAST(floor(cos(2 * (2 * pi() / p) * t) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE))
      |    / (2 * (2 * pi() / p)) AS tau
      |  FROM pts GROUP BY 1),
      |q AS (
      |  SELECT p, n, sy, syy,
      |    CAST(floor(cos((2 * pi() / p) * (t - tau)) * 1e9 + 0.5) AS BIGINT) AS cq,
      |    CAST(floor(sin((2 * pi() / p) * (t - tau)) * 1e9 + 0.5) AS BIGINT) AS sq,
      |    ycn
      |  FROM pts JOIN tau ON p = tp),
      |a AS (
      |  SELECT p, max(n) AS n, max(sy) AS sy, max(syy) AS syy,
      |    CAST(sum(ycn * cq) AS DECIMAL(38,0)) AS yc,
      |    CAST(sum(ycn * sq) AS DECIMAL(38,0)) AS ys,
      |    CAST(sum(CAST(cq AS HUGEINT) * cq) AS DECIMAL(38,0)) AS cc,
      |    CAST(sum(CAST(sq AS HUGEINT) * sq) AS DECIMAL(38,0)) AS ss
      |  FROM q GROUP BY 1)
      |SELECT p AS period_days, n AS n_days,
      |  round(CAST(0.5 AS DOUBLE) * (
      |    (CAST(yc AS DOUBLE) / n / 1e9) * (CAST(yc AS DOUBLE) / n / 1e9)
      |      / (CAST(cc AS DOUBLE) / 1e18)
      |  + (CAST(ys AS DOUBLE) / n / 1e9) * (CAST(ys AS DOUBLE) / n / 1e9)
      |      / (CAST(ss AS DOUBLE) / 1e18))
      |  / ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * n)),
      |  6) AS lomb_power_norm
      |FROM a ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- C1032
  /** time_db4_energy — two-level Daubechies-4 wavelet energy split of
    * monthly revenue: the four D4 taps evaluated as identical IEEE
    * constants ((1±√3)/(4√2)), level-1/-2 coefficients from lag
    * columns on the bounded month frame (downsample = idx parity
    * filter, no self-join), each coefficient quantized onto the 0.1-
    * dollar grid before the exact integer energy sums. Reported as
    * detail/approx energy shares — the multi-resolution cousin of
    * C*'s Haar energy with overlapping (not blocky) basis functions.
    */
  def timeDb4Energy(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.orderBy("m")
    def taps(x0: String, x1: String, x2: String, x3: String, hp: Boolean): String = {
      val (c0, c1, c2, c3) =
        ("((1 + sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((3 + sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((3 - sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((1 - sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))")
      if (!hp) s"($c0 * $x0 + $c1 * $x1 + $c2 * $x2 + $c3 * $x3)"
      else s"($c3 * $x0 - $c2 * $x1 + $c1 * $x2 - $c0 * $x3)"
    }
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("x1", lag(col("v"), 1).over(wOrd))
      .withColumn("x2", lag(col("v"), 2).over(wOrd))
      .withColumn("x3", lag(col("v"), 3).over(wOrd))
      .filter(col("x3").isNotNull && col("idx") % 2 === 0)
      .selectExpr("idx",
        s"CAST(floor(${taps("x3", "x2", "x1", "v", hp = false)} / 1e3 + 0.5) AS BIGINT) AS a1",
        s"CAST(floor(${taps("x3", "x2", "x1", "v", hp = true)} / 1e3 + 0.5) AS BIGINT) AS d1")
    val wOrd2 = Window.orderBy("idx")
    val lvl2 = ms
      .withColumn("k", row_number().over(wOrd2).cast("long"))
      .withColumn("a1l1", lag(col("a1"), 1).over(wOrd2))
      .withColumn("a1l2", lag(col("a1"), 2).over(wOrd2))
      .withColumn("a1l3", lag(col("a1"), 3).over(wOrd2))
      .filter(col("a1l3").isNotNull && col("k") % 2 === 0)
      .selectExpr(
        s"CAST(floor(${taps("a1l3", "a1l2", "a1l1", "a1", hp = false)} + 0.5) AS BIGINT) AS a2",
        s"CAST(floor(${taps("a1l3", "a1l2", "a1l1", "a1", hp = true)} + 0.5) AS BIGINT) AS d2")
    val e1 = ms.agg(count(lit(1)).cast("long").as("n1"),
      sum(expr("d1 * d1")).cast("decimal(38,0)").as("ed1"))
    val e2 = lvl2.agg(count(lit(1)).cast("long").as("n2"),
      sum(expr("d2 * d2")).cast("decimal(38,0)").as("ed2"),
      sum(expr("a2 * a2")).cast("decimal(38,0)").as("ea2"))
    e1.crossJoin(broadcast(e2))
      .selectExpr("n1 AS n_l1_coeffs", "n2 AS n_l2_coeffs",
        "CAST(ed1 AS DOUBLE) + CAST(ed2 AS DOUBLE) + CAST(ea2 AS DOUBLE) AS tot",
        "CAST(ed1 AS DOUBLE) AS e1d", "CAST(ed2 AS DOUBLE) AS e2d",
        "CAST(ea2 AS DOUBLE) AS e3d")
      .selectExpr("n_l1_coeffs", "n_l2_coeffs",
        "round(e1d / tot, 6) AS share_detail1",
        "round(e2d / tot, 6) AS share_detail2",
        "round(e3d / tot, 6) AS share_approx2",
        "round(ln(tot), 4) AS ln_total_energy")
  }
  val timeDb4EnergySql: String = {
    def taps(x0: String, x1: String, x2: String, x3: String, hp: Boolean): String = {
      val (c0, c1, c2, c3) =
        ("((1 + sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((3 + sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((3 - sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))",
          "((1 - sqrt(CAST(3 AS DOUBLE))) / (4 * sqrt(CAST(2 AS DOUBLE))))")
      if (!hp) s"($c0 * $x0 + $c1 * $x1 + $c2 * $x2 + $c3 * $x3)"
      else s"($c3 * $x0 - $c2 * $x1 + $c1 * $x2 - $c0 * $x3)"
    }
    s"""WITH mo AS (
       |  SELECT m, v,
       |    CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS idx,
       |    lag(v, 1) OVER (ORDER BY m) AS x1,
       |    lag(v, 2) OVER (ORDER BY m) AS x2,
       |    lag(v, 3) OVER (ORDER BY m) AS x3
       |  FROM (
       |    SELECT date_trunc('month', o_orderdate) AS m,
       |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
       |    FROM orders GROUP BY 1)),
       |l1 AS (
       |  SELECT idx,
       |    CAST(floor(${taps("x3", "x2", "x1", "v", hp = false)} / 1e3 + 0.5) AS BIGINT) AS a1,
       |    CAST(floor(${taps("x3", "x2", "x1", "v", hp = true)} / 1e3 + 0.5) AS BIGINT) AS d1
       |  FROM mo WHERE x3 IS NOT NULL AND idx % 2 = 0),
       |l1k AS (
       |  SELECT a1, d1,
       |    CAST(row_number() OVER (ORDER BY idx) AS BIGINT) AS k,
       |    lag(a1, 1) OVER (ORDER BY idx) AS a1l1,
       |    lag(a1, 2) OVER (ORDER BY idx) AS a1l2,
       |    lag(a1, 3) OVER (ORDER BY idx) AS a1l3
       |  FROM l1),
       |l2 AS (
       |  SELECT
       |    CAST(floor(${taps("a1l3", "a1l2", "a1l1", "a1", hp = false)} + 0.5) AS BIGINT) AS a2,
       |    CAST(floor(${taps("a1l3", "a1l2", "a1l1", "a1", hp = true)} + 0.5) AS BIGINT) AS d2
       |  FROM l1k WHERE a1l3 IS NOT NULL AND k % 2 = 0),
       |e1 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n1,
       |    CAST(sum(CAST(d1 AS HUGEINT) * d1) AS DECIMAL(38,0)) AS ed1
       |  FROM l1),
       |e2 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n2,
       |    CAST(sum(CAST(d2 AS HUGEINT) * d2) AS DECIMAL(38,0)) AS ed2,
       |    CAST(sum(CAST(a2 AS HUGEINT) * a2) AS DECIMAL(38,0)) AS ea2
       |  FROM l2),
       |t AS (
       |  SELECT n1, n2,
       |    CAST(ed1 AS DOUBLE) + CAST(ed2 AS DOUBLE) + CAST(ea2 AS DOUBLE) AS tot,
       |    CAST(ed1 AS DOUBLE) AS e1d, CAST(ed2 AS DOUBLE) AS e2d,
       |    CAST(ea2 AS DOUBLE) AS e3d
       |  FROM e1, e2)
       |SELECT n1 AS n_l1_coeffs, n2 AS n_l2_coeffs,
       |  round(e1d / tot, 6) AS share_detail1,
       |  round(e2d / tot, 6) AS share_detail2,
       |  round(e3d / tot, 6) AS share_approx2,
       |  round(ln(tot), 4) AS ln_total_energy
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------------------- C1033
  /** win_adx — Wilder's directional-movement system (period 10) on
    * monthly bars: +DM/−DM/TR are exact integer lag arithmetic; the
    * three Wilder smoothings carry 1e-3 grids and the ADX smoothing a
    * 1e-6 DX grid — driver walk + recursive-CTE oracle. Reported with
    * the months-above-25 trend count (exact integer compares on the
    * carried grid).
    */
  def winAdx(s: SparkSession, d: String): DataFrame = {
    val bars = orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("m")
      .agg(max(struct(col("o_orderkey"), col("p"))).as("lo"),
        max(col("p")).cast("long").as("h"), min(col("p")).cast("long").as("l"))
      .selectExpr("m", "lo.p AS c", "h", "l")
      .orderBy("m").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // (c is field 1? no)
    // NOTE: selectExpr order is (m, c, h, l) → getLong(1)=c, 2=h, 3=l
    val cs = bars.map(_._1); val hs = bars.map(_._2); val ls = bars.map(_._3)
    var strq = (hs(0) - ls(0)) * 1000L
    var spq = 0L; var smq = 0L; var adxq = 0L
    var nAbove = 0L
    for (t <- 2 to bars.length) {
      val hp = hs(t - 2); val lp = ls(t - 2); val pc = cs(t - 2)
      val h = hs(t - 1); val l = ls(t - 1)
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      val pdm = if (h - hp > lp - l && h - hp > 0) h - hp else 0L
      val mdm = if (lp - l > h - hp && lp - l > 0) lp - l else 0L
      strq = math.floor((1.0 / 10 * tr + 9.0 / 10 * (strq / 1e3)) * 1e3 + 0.5).toLong
      spq = math.floor((1.0 / 10 * pdm + 9.0 / 10 * (spq / 1e3)) * 1e3 + 0.5).toLong
      smq = math.floor((1.0 / 10 * mdm + 9.0 / 10 * (smq / 1e3)) * 1e3 + 0.5).toLong
      val dxq =
        if (spq + smq == 0L) 0L
        else math.floor(math.abs(spq - smq).toDouble / (spq + smq) * 100 * 1e6 + 0.5).toLong
      adxq = math.floor((1.0 / 10 * (dxq / 1e6) + 9.0 / 10 * (adxq / 1e6)) * 1e6 + 0.5).toLong
      if (adxq > 25000000L) nAbove += 1
    }
    import s.implicits._
    Seq((bars.length.toLong, nAbove,
      if (strq == 0) 0.0 else 100.0 * spq / strq,
      if (strq == 0) 0.0 else 100.0 * smq / strq,
      adxq / 1e6))
      .toDF("n0", "na", "pdi", "mdi", "adx")
      .selectExpr("n0 AS n_months", "na AS n_adx_above_25",
        "round(pdi, 4) AS plus_di", "round(mdi, 4) AS minus_di",
        "round(adx, 4) AS adx")
  }
  val winAdxSql: String = {
    val strN = "CAST(floor((CAST(1 AS DOUBLE) / 10 * s2.tr + CAST(9 AS DOUBLE) / 10 * (it.strq / 1e3)) * 1e3 + 0.5) AS BIGINT)"
    val spN = "CAST(floor((CAST(1 AS DOUBLE) / 10 * s2.pdm + CAST(9 AS DOUBLE) / 10 * (it.spq / 1e3)) * 1e3 + 0.5) AS BIGINT)"
    val smN = "CAST(floor((CAST(1 AS DOUBLE) / 10 * s2.mdm + CAST(9 AS DOUBLE) / 10 * (it.smq / 1e3)) * 1e3 + 0.5) AS BIGINT)"
    val dxN =
      s"""(CASE WHEN ($spN) + ($smN) = 0 THEN 0
         |ELSE CAST(floor(CAST(abs(($spN) - ($smN)) AS DOUBLE) / (($spN) + ($smN)) * 100 * 1e6 + 0.5) AS BIGINT) END)""".stripMargin
    val adxN = s"CAST(floor((CAST(1 AS DOUBLE) / 10 * (($dxN) / 1e6) + CAST(9 AS DOUBLE) / 10 * (it.adxq / 1e6)) * 1e6 + 0.5) AS BIGINT)"
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
       |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t,
       |    greatest(h - l, abs(h - lag(c) OVER (ORDER BY m)),
       |      abs(l - lag(c) OVER (ORDER BY m))) AS tr,
       |    CASE WHEN h - lag(h) OVER (ORDER BY m) > lag(l) OVER (ORDER BY m) - l
       |      AND h - lag(h) OVER (ORDER BY m) > 0
       |      THEN h - lag(h) OVER (ORDER BY m) ELSE 0 END AS pdm,
       |    CASE WHEN lag(l) OVER (ORDER BY m) - l > h - lag(h) OVER (ORDER BY m)
       |      AND lag(l) OVER (ORDER BY m) - l > 0
       |      THEN lag(l) OVER (ORDER BY m) - l ELSE 0 END AS mdm,
       |    h, l
       |  FROM bars),
       |it(t, strq, spq, smq, adxq, nab) AS (
       |  SELECT CAST(1 AS BIGINT), (h - l) * 1000, CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM seq WHERE t = 1
       |  UNION ALL
       |  SELECT s2.t, $strN, $spN, $smN, $adxN,
       |    it.nab + CASE WHEN ($adxN) > 25000000 THEN 1 ELSE 0 END
       |  FROM it JOIN seq s2 ON s2.t = it.t + 1),
       |fin AS (SELECT * FROM it ORDER BY t DESC LIMIT 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM seq)
       |SELECT n0 AS n_months, nab AS n_adx_above_25,
       |  round(CASE WHEN strq = 0 THEN CAST(0 AS DOUBLE)
       |    ELSE CAST(100.0 AS DOUBLE) * spq / strq END, 4) AS plus_di,
       |  round(CASE WHEN strq = 0 THEN CAST(0 AS DOUBLE)
       |    ELSE CAST(100.0 AS DOUBLE) * smq / strq END, 4) AS minus_di,
       |  round(adxq / 1e6, 4) AS adx
       |FROM fin, nn""".stripMargin
  }

  // ---------------------------------------------------------------- C1034
  /** stat_peto_odds — the Peto one-step pooled odds ratio of returns
    * for discounted (> 5%) vs full-price lines across the 25 nation
    * strata: per-stratum O−E and hypergeometric V from exact 2×2
    * integer counts, each quantized ·1e9 on the bounded nation frame,
    * pooled lnOR = Σ(O−E)/ΣV with its χ². The sparse-event
    * meta-analysis estimator (Cochrane's choice when cells are thin)
    * beside C*'s Mantel–Haenszel and DerSimonian–Laird.
    */
  def statPetoOdds(s: SparkSession, d: String): DataFrame = {
    val cell = lineitem(s, d)
      .join(orders(s, d), expr("l_orderkey = o_orderkey"))
      .join(customer(s, d), expr("o_custkey = c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).cast("long").as("nn"),
        sum(expr("CASE WHEN l_discount > 0.05 THEN 1L ELSE 0L END")).cast("long").as("n1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr(
          "CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END"))
          .cast("long").as("a"))
      .filter(col("n1") > 0 && col("n1") < col("nn") && col("m1") > 0 && col("m1") < col("nn"))
      .selectExpr("nk",
        "CAST(floor((a - CAST(n1 AS DOUBLE) * m1 / nn) * 1e9 + 0.5) AS BIGINT) AS oeq",
        """CAST(floor(CAST(n1 AS DOUBLE) * (nn - n1) * m1 * (nn - m1)
          |/ (CAST(nn AS DOUBLE) * nn * (nn - 1)) * 1e9 + 0.5) AS BIGINT) AS vq""".stripMargin)
    cell.agg(count(lit(1)).cast("long").as("k"),
        sum(col("oeq")).cast("long").as("soe"),
        sum(col("vq")).cast("long").as("sv"))
      .selectExpr("k AS n_strata",
        "round(CAST(soe AS DOUBLE) / sv, 6) AS peto_lnor",
        "round(exp(CAST(soe AS DOUBLE) / sv), 6) AS peto_or",
        """round((CAST(soe AS DOUBLE) / 1e9) * (CAST(soe AS DOUBLE) / 1e9)
          |/ (CAST(sv AS DOUBLE) / 1e9), 4) AS chi2""".stripMargin)
  }
  val statPetoOddsSql: String =
    """WITH cell AS (
      |  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS nn,
      |    CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1
      |  HAVING sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) > 0
      |    AND sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) < count(*)
      |    AND sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
      |    AND sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) < count(*)),
      |q AS (
      |  SELECT nk,
      |    CAST(floor((a - CAST(n1 AS DOUBLE) * m1 / nn) * 1e9 + 0.5) AS BIGINT) AS oeq,
      |    CAST(floor(CAST(n1 AS DOUBLE) * (nn - n1) * m1 * (nn - m1)
      |    / (CAST(nn AS DOUBLE) * nn * (nn - 1)) * 1e9 + 0.5) AS BIGINT) AS vq
      |  FROM cell)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  round(CAST(sum(oeq) AS DOUBLE) / sum(vq), 6) AS peto_lnor,
      |  round(exp(CAST(sum(oeq) AS DOUBLE) / sum(vq)), 6) AS peto_or,
      |  round((CAST(sum(oeq) AS DOUBLE) / 1e9) * (CAST(sum(oeq) AS DOUBLE) / 1e9)
      |  / (CAST(sum(vq) AS DOUBLE) / 1e9), 4) AS chi2
      |FROM q""".stripMargin

  // ---------------------------------------------------------------- C1035
  /** stat_chauvenet — Chauvenet's outlier criterion on order values:
    * reject x when n·2(1−Φ(|z|)) < 1/2, with μ̂/σ̂ from exact corpus
    * moments and Φ the Zelen–Severo rational evaluated once per
    * DISTINCT value on the histogram frame (the C976 Lilliefors
    * shape). The rejection decision quantizes the expected-count
    * ·1e6 before the integer compare — no IEEE on the boundary.
    */
  def statChauvenet(s: SparkSession, d: String): DataFrame = {
    val phiSqlE: String => String = z =>
      s"exp(-(($z) * ($z)) / 2) / sqrt(2 * pi())"
    val polySqlE: String => String = t =>
      s"""(($t) * (CAST(0.319381530 AS DOUBLE) + ($t) * (CAST(-0.356563782 AS DOUBLE)
         |  + ($t) * (CAST(1.781477937 AS DOUBLE) + ($t) * (CAST(-1.821255978 AS DOUBLE)
         |  + ($t) * CAST(1.330274429 AS DOUBLE))))))""".stripMargin
    val bigPhiSqlE: String => String = z =>
      s"""CASE WHEN ($z) >= 0
         |  THEN 1 - ${phiSqlE(z)} * ${polySqlE(s"1 / (1 + CAST(0.2316419 AS DOUBLE) * ($z))")}
         |  ELSE ${phiSqlE(z)} * ${polySqlE(s"1 / (1 - CAST(0.2316419 AS DOUBLE) * ($z))")} END""".stripMargin
    val pv = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("v").agg(count(lit(1)).cast("long").as("cntv"))
    val mom = pv.agg(sum(col("cntv")).cast("long").as("n"),
      sum(expr("CAST(cntv AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(cntv AS DECIMAL(38,0)) * v * v")).cast("decimal(38,0)").as("svv"))
      .selectExpr("n", "CAST(sv AS DOUBLE) / n AS mu",
        """sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
          |  - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          |  / (CAST(n AS DOUBLE) * (n - 1))) AS sig""".stripMargin)
    pv.crossJoin(broadcast(mom))
      .selectExpr("n", "cntv", "abs((v - mu) / sig) AS az")
      .selectExpr("n", "cntv", "az",
        s"""CAST(floor(n * 2 * (1 - ${bigPhiSqlE("az")}) * 1e6 + 0.5) AS BIGINT)
           |AS expq""".stripMargin)
      .groupBy("n")
      .agg(sum(expr("CASE WHEN expq < 500000 THEN cntv ELSE 0L END"))
          .cast("long").as("n_rejected"),
        max(expr("CASE WHEN expq < 500000 THEN CAST(floor(az * 1e6 + 0.5) AS BIGINT) ELSE NULL END"))
          .as("zmaxq"),
        min(expr("CASE WHEN expq < 500000 THEN CAST(floor(az * 1e6 + 0.5) AS BIGINT) ELSE NULL END"))
          .as("zminq"))
      .selectExpr("n AS n_obs", "n_rejected",
        "round(coalesce(CAST(zminq AS DOUBLE), 0) / 1e6, 4) AS min_rejected_absz",
        "round(coalesce(CAST(zmaxq AS DOUBLE), 0) / 1e6, 4) AS max_rejected_absz")
  }
  val statChauvenetSql: String = {
    val phiSqlE: String => String = z =>
      s"exp(-(($z) * ($z)) / 2) / sqrt(2 * pi())"
    val polySqlE: String => String = t =>
      s"""(($t) * (CAST(0.319381530 AS DOUBLE) + ($t) * (CAST(-0.356563782 AS DOUBLE)
         |  + ($t) * (CAST(1.781477937 AS DOUBLE) + ($t) * (CAST(-1.821255978 AS DOUBLE)
         |  + ($t) * CAST(1.330274429 AS DOUBLE))))))""".stripMargin
    val bigPhiSqlE: String => String = z =>
      s"""CASE WHEN ($z) >= 0
         |  THEN 1 - ${phiSqlE(z)} * ${polySqlE(s"1 / (1 + CAST(0.2316419 AS DOUBLE) * ($z))")}
         |  ELSE ${phiSqlE(z)} * ${polySqlE(s"1 / (1 - CAST(0.2316419 AS DOUBLE) * ($z))")} END""".stripMargin
    s"""WITH pv AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS cntv
       |  FROM orders GROUP BY 1),
       |mom AS (
       |  SELECT CAST(sum(cntv) AS BIGINT) AS n,
       |    CAST(sum(CAST(cntv AS HUGEINT) * v) AS DOUBLE) / sum(cntv) AS mu,
       |    sqrt((CAST(sum(cntv) AS DOUBLE) * CAST(sum(CAST(cntv AS HUGEINT) * v * v) AS DOUBLE)
       |      - CAST(sum(CAST(cntv AS HUGEINT) * v) AS DOUBLE) * CAST(sum(CAST(cntv AS HUGEINT) * v) AS DOUBLE))
       |      / (CAST(sum(cntv) AS DOUBLE) * (sum(cntv) - 1))) AS sig
       |  FROM pv),
       |z AS (
       |  SELECT n, cntv, abs((v - mu) / sig) AS az FROM pv, mom),
       |q AS (
       |  SELECT n, cntv, az,
       |    CAST(floor(n * 2 * (1 - ${bigPhiSqlE("az")}) * 1e6 + 0.5) AS BIGINT) AS expq
       |  FROM z)
       |SELECT n AS n_obs,
       |  CAST(sum(CASE WHEN expq < 500000 THEN cntv ELSE 0 END) AS BIGINT) AS n_rejected,
       |  round(coalesce(CAST(min(CASE WHEN expq < 500000
       |    THEN CAST(floor(az * 1e6 + 0.5) AS BIGINT) END) AS DOUBLE), 0) / 1e6, 4) AS min_rejected_absz,
       |  round(coalesce(CAST(max(CASE WHEN expq < 500000
       |    THEN CAST(floor(az * 1e6 + 0.5) AS BIGINT) END) AS DOUBLE), 0) / 1e6, 4) AS max_rejected_absz
       |FROM q GROUP BY n""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ks_two_sample" -> (statKsTwoSample _),
    "stat_pr_auc" -> (statPrAuc _),
    "stat_quantile_regression" -> (statQuantileRegression _),
    "time_lomb_scargle" -> (timeLombScargle _),
    "time_db4_energy" -> (timeDb4Energy _),
    "win_adx" -> (winAdx _),
    "stat_peto_odds" -> (statPetoOdds _),
    "stat_chauvenet" -> (statChauvenet _))

  val oracle: Map[String, String] = Map(
    "stat_ks_two_sample" -> statKsTwoSampleSql,
    "stat_pr_auc" -> statPrAucSql,
    "stat_quantile_regression" -> statQuantileRegressionSql,
    "time_lomb_scargle" -> timeLombScargleSql,
    "time_db4_energy" -> timeDb4EnergySql,
    "win_adx" -> winAdxSql,
    "stat_peto_odds" -> statPetoOddsSql,
    "stat_chauvenet" -> statChauvenetSql)
}
