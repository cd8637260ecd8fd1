package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 95 (C784–C787): robust location/uniformity inference —
  * the Alexander–Govern k-group test, Kuiper's circular uniformity V,
  * a leave-one-out jackknife CI for Pearson's r, and the
  * Fligner–Policello robust rank-order test.
  *
  * Shared discipline: per-group/per-value ingredients are exact
  * integer or DECIMAL sums; every per-unit IEEE term is quantized
  * before any distributed k-/n-sum; the jackknife is the closed-form
  * O(n) moment-subtraction version, not an n² resample.
  */
object Extras195 {

  /** C784 stat_alexander_govern — the Alexander–Govern test of equal
    * means across the 5 priority groups: normalized inverse-SE²
    * weights (quantized like C765's Welch pipeline), per-group
    * t_i = (x̄_i − x̃)/SE_i, Hill's normalizing transform
    * z_i = c + (c³+3c)/b − (4c⁷+33c⁵+240c³+855c)/(10b²+8bc⁴+1000b)
    * with a = ν−½, b = 48a², c = √(a·ln(1+t²/ν)), and A = Σz²
    * ~ χ²₄. More robust than classic ANOVA under heteroscedasticity,
    * cheaper than trimmed-mean alternatives — pure arithmetic, no
    * quantile tables.
    */
  def statAlexanderGovern(s: SparkSession, d: String): DataFrame = {
    val gm = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("cv")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("qg"))
      .withColumn("mu", expr("CAST(sg AS DOUBLE) / ng / 100"))
      // SE² = s²/n in dollars²
      .withColumn("se2", expr(
        """(CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
          |/ (CAST(ng AS DOUBLE) * (ng - 1)) / 1e4 / ng""".stripMargin))
      .withColumn("wq", expr("CAST(floor(1 / se2 * 1e12 + 0.5) AS BIGINT)"))
      .withColumn("wmq", expr("CAST(floor(1 / se2 * mu * 1e9 + 0.5) AS BIGINT)"))
    val tot = gm.agg(count(lit(1)).cast("long").as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("wq")).cast("long").as("wtot"), sum(col("wmq")).cast("long").as("wmtot"))
      .withColumn("grand", expr("CAST(wmtot AS DOUBLE) / wtot * 1e3"))
    gm.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        expr(
          """CAST(floor(
            |  CASE WHEN ng < 2 THEN 0.0D ELSE
            |  pow(sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1)))
            |      + (pow(sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))), 3)
            |         + 3 * sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))))
            |        / (48 * (ng - 1.5D) * (ng - 1.5D))
            |      - (4 * pow(sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))), 7)
            |         + 33 * pow(sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))), 5)
            |         + 240 * pow(sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))), 3)
            |         + 855 * sqrt((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1))))
            |        / (10 * 48 * (ng - 1.5D) * (ng - 1.5D) * 48 * (ng - 1.5D) * (ng - 1.5D)
            |           + 8 * 48 * (ng - 1.5D) * (ng - 1.5D)
            |             * ((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1)))
            |             * ((ng - 1.5D) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1)))
            |           + 1000 * 48 * (ng - 1.5D) * (ng - 1.5D))
            |  , 2) END * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("z2q"))
      .groupBy("k", "n").agg(sum(col("z2q")).cast("long").as("a_q"))
      .selectExpr("k", "n", "round(CAST(a_q AS DOUBLE) / 1e9, 6) AS a_stat",
        "CAST(k - 1 AS BIGINT) AS dof")
  }
  val statAlexanderGovernSql: String = {
    val c = "sqrt((ng - 1.5) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1)))"
    val cc = s"((ng - 1.5) * ln(1 + (mu - grand) * (mu - grand) / se2 / (ng - 1)))"
    s"""WITH base AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv
      |  FROM orders),
      |gm0 AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(cv AS DECIMAL(38,0)) * cv) AS DECIMAL(38,0)) AS qg
      |  FROM base GROUP BY 1),
      |gm AS (
      |  SELECT grp, ng, CAST(sg AS DOUBLE) / ng / 100 AS mu,
      |    (CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
      |      / (CAST(ng AS DOUBLE) * (ng - 1)) / 1e4 / ng AS se2
      |  FROM gm0),
      |gq AS (
      |  SELECT grp, ng, mu, se2,
      |    CAST(floor(1 / se2 * 1e12 + 0.5) AS BIGINT) AS wq,
      |    CAST(floor(1 / se2 * mu * 1e9 + 0.5) AS BIGINT) AS wmq
      |  FROM gm),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(wq) AS BIGINT) AS wtot, CAST(sum(wmq) AS BIGINT) AS wmtot
      |  FROM gq),
      |tg AS (SELECT k, n, CAST(wmtot AS DOUBLE) / wtot * 1e3 AS grand FROM tot),
      |z AS (
      |  SELECT t.k, t.n,
      |    CAST(floor(
      |      CASE WHEN g.ng < 2 THEN 0.0 ELSE
      |      pow($c
      |          + (pow($c, 3) + 3 * $c) / (48 * (ng - 1.5) * (ng - 1.5))
      |          - (4 * pow($c, 7) + 33 * pow($c, 5) + 240 * pow($c, 3) + 855 * $c)
      |            / (10 * 48 * (ng - 1.5) * (ng - 1.5) * 48 * (ng - 1.5) * (ng - 1.5)
      |               + 8 * 48 * (ng - 1.5) * (ng - 1.5) * $cc * $cc
      |               + 1000 * 48 * (ng - 1.5) * (ng - 1.5))
      |      , 2) END * 1e9 + 0.5) AS BIGINT) AS z2q
      |  FROM gq g, tg t)
      |SELECT k, n, round(CAST(CAST(sum(z2q) AS BIGINT) AS DOUBLE) / 1e9, 6) AS a_stat,
      |  CAST(k - 1 AS BIGINT) AS dof
      |FROM z GROUP BY k, n""".stripMargin
  }

  /** C785 stat_kuiper — Kuiper's V against hour-of-day uniformity:
    * cumulative counts C_k through each of the 24 bins, D⁺/D⁻ as
    * EXACT integer maxima of 24·C_k − k·N, V = D⁺ + D⁻, plus the
    * finite-sample-corrected V·(√N + 0.155 + 0.24/√N). Unlike the
    * C-line Watson U² (a quadratic EDF functional), Kuiper reads the
    * two worst one-sided gaps — and both are rotation-invariant.
    */
  def statKuiper(s: SparkSession, d: String): DataFrame = {
    val hist = events(s, d)
      .groupBy(expr("hour(ts)").as("h"))
      .agg(count(lit(1)).cast("long").as("m"))
    // 24-bin agg-bounded frame: single-task inclusive window
    val withC = hist.withColumn("ck", sum(col("m")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("h").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)).cast("long"))
    val tot = hist.agg(sum(col("m")).cast("long").as("n"))
    withC.crossJoin(broadcast(tot))
      .select(col("n"),
        expr("24 * ck - (h + 1) * n").as("dplus24n"),
        expr("(h + 1) * n - 24 * ck").as("dminus24n"))
      .groupBy("n")
      .agg(max(col("dplus24n")).cast("long").as("dp"),
        max(col("dminus24n")).cast("long").as("dm"))
      .selectExpr("n",
        "round(CAST(greatest(dp, 0L) AS DOUBLE) / 24 / n, 6) AS d_plus",
        "round(CAST(greatest(dm, 0L) AS DOUBLE) / 24 / n, 6) AS d_minus",
        """round((CAST(greatest(dp, 0L) AS DOUBLE) + greatest(dm, 0L)) / 24 / n
          |* (sqrt(CAST(n AS DOUBLE)) + 0.155D + 0.24D / sqrt(CAST(n AS DOUBLE))), 6) AS v_corrected""".stripMargin)
  }
  val statKuiperSql: String =
    """WITH hist AS (
      |  SELECT hour(ts) AS h, CAST(count(*) AS BIGINT) AS m FROM events GROUP BY 1),
      |blocks AS (
      |  SELECT h, m, CAST(sum(m) OVER (ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ck
      |  FROM hist),
      |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM hist),
      |d AS (
      |  SELECT t.n,
      |    CAST(max(24 * b.ck - (b.h + 1) * t.n) AS BIGINT) AS dp,
      |    CAST(max((b.h + 1) * t.n - 24 * b.ck) AS BIGINT) AS dm
      |  FROM blocks b, tot t GROUP BY 1)
      |SELECT n,
      |  round(CAST(greatest(dp, 0) AS DOUBLE) / 24 / n, 6) AS d_plus,
      |  round(CAST(greatest(dm, 0) AS DOUBLE) / 24 / n, 6) AS d_minus,
      |  round((CAST(greatest(dp, 0) AS DOUBLE) + greatest(dm, 0)) / 24 / n
      |    * (sqrt(CAST(n AS DOUBLE)) + 0.155 + 0.24 / sqrt(CAST(n AS DOUBLE))), 6) AS v_corrected
      |FROM d""".stripMargin

  /** C786 stat_jackknife_corr_ci — a delete-1 jackknife 95% CI for
    * Pearson's r(quantity, price) WITHOUT n² resampling: global exact
    * moment sums, per-row leave-one-out moments by exact DECIMAL
    * subtraction, per-row z_(−i) = ½ln((1+r)/(1−r)) quantized ·10⁹,
    * two passes (mean, then squared deviations). SE_jack =
    * √((n−1)/n·Σ(z−z̄)²); CI back-transformed through tanh. The
    * resampling answer at O(n) cost — the 100 TB-safe jackknife.
    */
  def statJackknifeCorrCi(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
    val g = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"))
    // r_(−i) from exact loo moments; z quantized ·1e9
    val zq = base.crossJoin(broadcast(g))
      .select(col("n"),
        expr(
          """CAST(floor(0.5D * ln(
            |(1 + ((n-1) * CAST(sxy - CAST(x AS DECIMAL(38,0)) * y AS DOUBLE) - CAST(sx - x AS DOUBLE) * CAST(sy - y AS DOUBLE))
            | / sqrt(((n-1) * CAST(sxx - CAST(x AS DECIMAL(38,0)) * x AS DOUBLE) - CAST(sx - x AS DOUBLE) * CAST(sx - x AS DOUBLE))
            |      * ((n-1) * CAST(syy - CAST(y AS DECIMAL(38,0)) * y AS DOUBLE) - CAST(sy - y AS DOUBLE) * CAST(sy - y AS DOUBLE))))
            |/
            |(1 - ((n-1) * CAST(sxy - CAST(x AS DECIMAL(38,0)) * y AS DOUBLE) - CAST(sx - x AS DOUBLE) * CAST(sy - y AS DOUBLE))
            | / sqrt(((n-1) * CAST(sxx - CAST(x AS DECIMAL(38,0)) * x AS DOUBLE) - CAST(sx - x AS DOUBLE) * CAST(sx - x AS DOUBLE))
            |      * ((n-1) * CAST(syy - CAST(y AS DECIMAL(38,0)) * y AS DOUBLE) - CAST(sy - y AS DOUBLE) * CAST(sy - y AS DOUBLE))))
            |) * 1e9 + 0.5) AS BIGINT)""".stripMargin).as("zq"))
    val m = zq.groupBy("n").agg(sum(col("zq")).cast("long").as("szq"))
      .withColumn("zbar_q", expr("CAST(szq AS DOUBLE) / n")) // still ·1e9 units
    val dev = zq.crossJoin(broadcast(m.select(col("zbar_q")).limit(1)))
      .select(col("n"),
        expr("CAST(floor((zq - zbar_q) * (zq - zbar_q) + 0.5) AS BIGINT)").as("d2q"))
      .groupBy("n").agg(sum(col("d2q")).cast("long").as("sd2q"))
    val rfull = g.selectExpr(
      """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |/ sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_full""".stripMargin)
    dev.crossJoin(broadcast(m.select(col("zbar_q")).limit(1)))
      .crossJoin(broadcast(rfull))
      .selectExpr("n", "round(r_full, 6) AS r",
        // SE in z-units: sd2q is ·1e9 (quantized (Δ·1e9)²/1e9)
        """round((exp(2 * (zbar_q / 1e9 - 1.959964D * sqrt((n - 1.0D) / n * CAST(sd2q AS DOUBLE) / 1e18))) - 1)
          |/ (exp(2 * (zbar_q / 1e9 - 1.959964D * sqrt((n - 1.0D) / n * CAST(sd2q AS DOUBLE) / 1e18))) + 1), 6) AS ci_low""".stripMargin,
        """round((exp(2 * (zbar_q / 1e9 + 1.959964D * sqrt((n - 1.0D) / n * CAST(sd2q AS DOUBLE) / 1e18))) - 1)
          |/ (exp(2 * (zbar_q / 1e9 + 1.959964D * sqrt((n - 1.0D) / n * CAST(sd2q AS DOUBLE) / 1e18))) + 1), 6) AS ci_high""".stripMargin)
  }
  val statJackknifeCorrCiSql: String = {
    val loo =
      """((t.n-1) * CAST(t.sxy - CAST(b.x AS DECIMAL(38,0)) * b.y AS DOUBLE) - CAST(t.sx - b.x AS DOUBLE) * CAST(t.sy - b.y AS DOUBLE))
        | / sqrt(((t.n-1) * CAST(t.sxx - CAST(b.x AS DECIMAL(38,0)) * b.x AS DOUBLE) - CAST(t.sx - b.x AS DOUBLE) * CAST(t.sx - b.x AS DOUBLE))
        |      * ((t.n-1) * CAST(t.syy - CAST(b.y AS DECIMAL(38,0)) * b.y AS DOUBLE) - CAST(t.sy - b.y AS DOUBLE) * CAST(t.sy - b.y AS DOUBLE)))""".stripMargin
    s"""WITH base AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |  FROM base),
      |zq AS (
      |  SELECT t.n,
      |    CAST(floor(0.5 * ln((1 + $loo) / (1 - $loo)) * 1e9 + 0.5) AS BIGINT) AS zq
      |  FROM base b, g t),
      |m AS (
      |  SELECT n, CAST(CAST(sum(zq) AS BIGINT) AS DOUBLE) / n AS zbar_q FROM zq GROUP BY 1),
      |dev AS (
      |  SELECT z.n,
      |    CAST(sum(CAST(floor((z.zq - m.zbar_q) * (z.zq - m.zbar_q) + 0.5) AS BIGINT)) AS BIGINT) AS sd2q
      |  FROM zq z, m GROUP BY 1),
      |rf AS (
      |  SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_full
      |  FROM g)
      |SELECT d.n, round(rf.r_full, 6) AS r,
      |  round((exp(2 * (m.zbar_q / 1e9 - 1.959964 * sqrt((d.n - 1.0) / d.n * CAST(d.sd2q AS DOUBLE) / 1e18))) - 1)
      |    / (exp(2 * (m.zbar_q / 1e9 - 1.959964 * sqrt((d.n - 1.0) / d.n * CAST(d.sd2q AS DOUBLE) / 1e18))) + 1), 6) AS ci_low,
      |  round((exp(2 * (m.zbar_q / 1e9 + 1.959964 * sqrt((d.n - 1.0) / d.n * CAST(d.sd2q AS DOUBLE) / 1e18))) - 1)
      |    / (exp(2 * (m.zbar_q / 1e9 + 1.959964 * sqrt((d.n - 1.0) / d.n * CAST(d.sd2q AS DOUBLE) / 1e18))) + 1), 6) AS ci_high
      |FROM dev d, m, rf""".stripMargin
  }

  /** C787 stat_fligner_policello — the robust rank-order test for
    * P(X>Y) = ½ WITHOUT equal-variance or equal-shape assumptions
    * (the Mann–Whitney fine print): tie-exact ×2 placements from the
    * quantity histogram, placement variances as exact DECIMAL sums,
    * Û = (ΣP − ΣQ)/(2√(V₁+V₂+P̄Q̄)). The A-vs-R location readout to
    * run when C-line mannwhitney_u's exchangeability assumption is in
    * doubt.
    */
  def statFlignerPolicello(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("l1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("l2"))
    // ≤50-bucket agg-bounded frame: both exclusive prefixes from one
    // single-task window pass (plan-gate-legal)
    val wref = org.apache.spark.sql.expressions.Window.orderBy(col("qv").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withC = hist
      .withColumn("c1", coalesce(sum(col("l1")).over(wref), lit(0L)).cast("long"))
      .withColumn("c2", coalesce(sum(col("l2")).over(wref), lit(0L)).cast("long"))
    val tot = hist.agg(sum(col("l1")).cast("long").as("n1"), sum(col("l2")).cast("long").as("n2"))
    // ×2 placements: P2(v) = 2·(#R < v) + (#R = v); Q2(v) symmetric
    val pl = withC.crossJoin(broadcast(tot))
      .select(col("l1"), col("l2"), col("n1"), col("n2"),
        expr("2 * c2 + l2").as("p2"), expr("2 * c1 + l1").as("q2"))
    val sums = pl.groupBy("n1", "n2")
      .agg(sum(expr("CAST(l1 AS DECIMAL(38,0)) * p2")).cast("decimal(38,0)").as("sp2"),
        sum(expr("CAST(l2 AS DECIMAL(38,0)) * q2")).cast("decimal(38,0)").as("sq2"),
        sum(expr("CAST(l1 AS DECIMAL(38,0)) * p2 * p2")).cast("decimal(38,0)").as("spp4"),
        sum(expr("CAST(l2 AS DECIMAL(38,0)) * q2 * q2")).cast("decimal(38,0)").as("sqq4"))
    sums.selectExpr("n1", "n2",
        // all in ×2 units: V1·4 = Σl1·p2² − (Σl1·p2)²/n1, P̄·2 = sp2/n1
        """round((CAST(sp2 AS DOUBLE) - CAST(sq2 AS DOUBLE))
          |/ (2 * sqrt(
          |  (CAST(spp4 AS DOUBLE) - CAST(sp2 AS DOUBLE) * CAST(sp2 AS DOUBLE) / n1)
          |  + (CAST(sqq4 AS DOUBLE) - CAST(sq2 AS DOUBLE) * CAST(sq2 AS DOUBLE) / n2)
          |  + (CAST(sp2 AS DOUBLE) / n1) * (CAST(sq2 AS DOUBLE) / n2))), 6) AS u_hat""".stripMargin,
        "round(CAST(sp2 AS DOUBLE) / n1 / 2 / n2, 6) AS p_x_gt_y")
  }
  val statFlignerPolicelloSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |blocks AS (
      |  SELECT l1, l2,
      |    COALESCE(sum(l1) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(l2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM hist),
      |tot AS (
      |  SELECT CAST(sum(l1) AS BIGINT) AS n1, CAST(sum(l2) AS BIGINT) AS n2 FROM hist),
      |sums AS (
      |  SELECT t.n1, t.n2,
      |    CAST(sum(CAST(b.l1 AS DECIMAL(38,0)) * (2*b.c2 + b.l2)) AS DECIMAL(38,0)) AS sp2,
      |    CAST(sum(CAST(b.l2 AS DECIMAL(38,0)) * (2*b.c1 + b.l1)) AS DECIMAL(38,0)) AS sq2,
      |    CAST(sum(CAST(b.l1 AS DECIMAL(38,0)) * (2*b.c2 + b.l2) * (2*b.c2 + b.l2)) AS DECIMAL(38,0)) AS spp4,
      |    CAST(sum(CAST(b.l2 AS DECIMAL(38,0)) * (2*b.c1 + b.l1) * (2*b.c1 + b.l1)) AS DECIMAL(38,0)) AS sqq4
      |  FROM blocks b, tot t GROUP BY 1, 2)
      |SELECT n1, n2,
      |  round((CAST(sp2 AS DOUBLE) - CAST(sq2 AS DOUBLE))
      |    / (2 * sqrt(
      |      (CAST(spp4 AS DOUBLE) - CAST(sp2 AS DOUBLE) * CAST(sp2 AS DOUBLE) / n1)
      |      + (CAST(sqq4 AS DOUBLE) - CAST(sq2 AS DOUBLE) * CAST(sq2 AS DOUBLE) / n2)
      |      + (CAST(sp2 AS DOUBLE) / n1) * (CAST(sq2 AS DOUBLE) / n2))), 6) AS u_hat,
      |  round(CAST(sp2 AS DOUBLE) / n1 / 2 / n2, 6) AS p_x_gt_y
      |FROM sums""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_alexander_govern" -> (statAlexanderGovern _),
    "stat_kuiper" -> (statKuiper _),
    "stat_jackknife_corr_ci" -> (statJackknifeCorrCi _),
    "stat_fligner_policello" -> (statFlignerPolicello _),
  )

  val oracle: Map[String, String] = Map(
    "stat_alexander_govern" -> statAlexanderGovernSql,
    "stat_kuiper" -> statKuiperSql,
    "stat_jackknife_corr_ci" -> statJackknifeCorrCiSql,
    "stat_fligner_policello" -> statFlignerPolicelloSql,
  )
}
