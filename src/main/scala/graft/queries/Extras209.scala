package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 109 (C840–C843): corpus-scale rank scores + trade geometry +
  * long-range cross-correlation + quantile forecast loss — the Savage
  * exponential-scores test (harmonic spine via ChunkedRange +
  * GlobalRank), the log-log trade gravity model, detrended
  * cross-correlation (DCCA), and the pinball-loss grid at exact global
  * quantiles.
  *
  * Shared discipline: harmonic numbers are exact ·10¹² integer-div
  * reciprocal prefix sums on the distributed spine (never a
  * single-task array or window); gravity/DCCA moments are quantized
  * once then summed exactly; per-box DCCA residual sums are floored to
  * integers BEFORE the cross-box sum so no engine can permute a float
  * reduction; pinball losses are pure integer cent×percent products.
  */
object Extras209 {

  /** C840 stat_savage_scores — the Savage (exponential-scores) test:
    * do URGENT orders sit differently in the order-total distribution
    * than the rest, weighting the upper tail the way an exponential
    * model demands? Scores a(r) = H_N − H_{N−r} from an EXACT harmonic
    * spine: reciprocals 10¹² div i on a ChunkedRange-generated 1..N
    * support, prefix-summed by GlobalRank, joined back by rank (also
    * GlobalRank — tie-free (cents, orderkey) total order). The
    * locally-most-powerful rank test against Lehman/exponential-scale
    * alternatives — the tail-sensitive sibling of Wilcoxon.
    */
  def statSavageScores(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"),
        expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END").as("ga"))
    val tot = base.agg(count(lit(1)).cast("long").as("nn"))
    // exact harmonic spine H_i (·10^12): distributed generation +
    // distributed prefix sum — never one N-element array or window
    val spine = graft.functions.ChunkedRange
      .explodeRange(tot, lit(1L), col("nn"), "i")
      .withColumn("qinv", expr("1000000000000L div i"))
    val hcum = graft.plans.GlobalRank
      .withExclusivePrefixSum(spine.select("i", "qinv"), "h0", col("qinv"), Seq(col("i").asc))
      .withColumn("h", expr("h0 + qinv"))
      .select(col("i"), col("h"))
    val hn = spine.agg(sum(col("qinv")).cast("long").as("hnn"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumber(base, "r", Seq(col("cv").asc, col("okey").asc))
      .crossJoin(broadcast(tot))
      .withColumn("i", expr("nn - r"))
    val scored = ranked
      .join(hcum, Seq("i"), "left")
      .crossJoin(broadcast(hn))
      // score quantized ONCE to 1e6 units (s6 = (H_N - H_{N-r}) div 1e6)
      .withColumn("s6", expr("(hnn - coalesce(h, 0L)) div 1000000L"))
    scored.agg(
        sum(expr("ga * s6")).cast("decimal(38,0)").as("t"),
        sum(col("s6")).cast("decimal(38,0)").as("sw"),
        sum(expr("CAST(s6 AS DECIMAL(38,0)) * s6")).cast("decimal(38,0)").as("ss"),
        sum(col("ga")).cast("long").as("na"),
        count(lit(1)).cast("long").as("n"))
      .selectExpr("na AS n_urgent", "n - na AS n_rest",
        """round((CAST(t AS DOUBLE) - CAST(na AS DOUBLE) * CAST(sw AS DOUBLE) / n)
          |/ sqrt(CAST(na AS DOUBLE) * (n - na)
          |       * (CAST(ss AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / n)
          |       / (CAST(n AS DOUBLE) * (n - 1))), 4) AS savage_z""".stripMargin)
      .selectExpr("n_urgent", "n_rest", "savage_z", "abs(savage_z) > 1.96 AS reject_95")
  }
  val statSavageScoresSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base),
      |spine AS (
      |  SELECT i, 1000000000000 // i AS qinv FROM (
      |    SELECT unnest(generate_series(1, (SELECT CAST(nn AS BIGINT) FROM tot))) AS i)),
      |hcum AS (
      |  SELECT i, CAST(sum(qinv) OVER (ORDER BY i
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS h
      |  FROM spine),
      |hn AS (SELECT CAST(sum(qinv) AS BIGINT) AS hnn FROM spine),
      |ranked AS (
      |  SELECT ga, row_number() OVER (ORDER BY cv, okey) AS r FROM base),
      |scored AS (
      |  SELECT rk.ga, (n.hnn - COALESCE(hc.h, 0)) // 1000000 AS s6
      |  FROM ranked rk
      |  CROSS JOIN tot t
      |  LEFT JOIN hcum hc ON hc.i = t.nn - rk.r, hn n),
      |ag AS (
      |  SELECT CAST(sum(ga * s6) AS DECIMAL(38,0)) AS t,
      |    CAST(sum(s6) AS DECIMAL(38,0)) AS sw,
      |    CAST(sum(CAST(s6 AS HUGEINT) * s6) AS DECIMAL(38,0)) AS ss,
      |    CAST(sum(ga) AS BIGINT) AS na, CAST(count(*) AS BIGINT) AS n
      |  FROM scored),
      |z AS (
      |  SELECT na AS n_urgent, n - na AS n_rest,
      |    round((CAST(t AS DOUBLE) - CAST(na AS DOUBLE) * CAST(sw AS DOUBLE) / n)
      |    / sqrt(CAST(na AS DOUBLE) * (n - na)
      |           * (CAST(ss AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / n)
      |           / (CAST(n AS DOUBLE) * (n - 1))), 4) AS savage_z
      |  FROM ag)
      |SELECT n_urgent, n_rest, savage_z, abs(savage_z) > 1.96 AS reject_95 FROM z""".stripMargin

  /** C841 analytics_gravity_model — the bilateral trade gravity fit:
    * revenue flows between supplier nation and customer nation (25×25
    * grid from two corpus equi-joins), log-log OLS of flow on the
    * product of origin/destination masses — ln quantized ·10⁹ once per
    * pair, exact integer moments, closed-form elasticity β, intercept
    * and R². The workhorse spatial-interaction model; β near 1 says
    * flows factor into mass products (independence), β > 1
    * concentration.
    */
  def analyticsGravityModel(s: SparkSession, d: String): DataFrame = {
    val flows = lineitem(s, d)
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("ns")), Seq("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey")), Seq("l_orderkey"))
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nc")), Seq("o_custkey"))
      .groupBy("ns", "nc")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("f"))
    val outM = flows.groupBy("ns").agg(sum(col("f")).cast("decimal(38,0)").as("mo"))
    val inM = flows.groupBy("nc").agg(sum(col("f")).cast("decimal(38,0)").as("mi"))
    val pts = flows.join(broadcast(outM), Seq("ns")).join(broadcast(inM), Seq("nc"))
      .filter(col("f") > 0)
      .select(
        expr("CAST(floor(ln(CAST(f AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(ln(CAST(mo AS DOUBLE) * CAST(mi AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)").as("x"))
    pts.agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .selectExpr("n_pairs",
        """round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
          |AS beta""".stripMargin,
        """round((CAST(sy AS DOUBLE) - ((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
          |/ CAST(n_pairs AS DOUBLE) / 1e9, 6) AS alpha_ln""".stripMargin,
        """round(pow(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
          |/ ((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |   * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
          |AS r2""".stripMargin)
  }
  val analyticsGravityModelSql: String =
    """WITH flows AS (
      |  SELECT s.s_nationkey AS ns, c.c_nationkey AS nc,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS f
      |  FROM lineitem l
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |outm AS (SELECT ns, CAST(sum(f) AS DECIMAL(38,0)) AS mo FROM flows GROUP BY 1),
      |inm AS (SELECT nc, CAST(sum(f) AS DECIMAL(38,0)) AS mi FROM flows GROUP BY 1),
      |pts AS (
      |  SELECT CAST(floor(ln(CAST(fl.f AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS y,
      |    CAST(floor(ln(CAST(o.mo AS DOUBLE) * CAST(i.mi AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS x
      |  FROM flows fl JOIN outm o ON o.ns = fl.ns JOIN inm i ON i.nc = fl.nc
      |  WHERE fl.f > 0),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
      |  FROM pts)
      |SELECT n_pairs,
      |  round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
      |  round((CAST(sy AS DOUBLE) - ((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
      |  / CAST(n_pairs AS DOUBLE) / 1e9, 6) AS alpha_ln,
      |  round(pow(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
      |  / ((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
      |FROM ag""".stripMargin

  /** C842 time_dcca — detrended cross-correlation (Podobnik–Stanley)
    * between daily order revenue and daily order count at box size 16:
    * per-box closed-form linear detrend from exact integer moments
    * (Σt, Σx, Σy, Σtx, Σty, Σxy, Σtt, Σxx, Σyy — cents and counts),
    * per-box residual covariances FLOORED to integer ·10⁻⁶ units
    * before the cross-box sum (both engines floor identical doubles —
    * no float-reduction ordering), ρ_DCCA = ΣSxy/√(ΣSxx·ΣSyy). The
    * scale-resolved correlation that survives common trends where raw
    * Pearson reads spurious coupling.
    */
  def timeDcca(s: SparkSession, d: String): DataFrame = {
    // index by PRESENT-day row number (dense observation index — the
    // standard DCCA practice): every box is full except the tail, at
    // any sf. The window runs over the calendar-bounded daily frame
    // (≤ the fixed ~2400-day span), gate-provably bounded.
    val daily = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("x"),
        count(lit(1)).cast("long").as("y"))
    val boxed = daily
      .withColumn("t", expr("CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)"))
      .withColumn("box", expr("t div 16"))
    val mom = boxed.groupBy("box")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("t")).cast("decimal(38,0)").as("st"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * t")).cast("decimal(38,0)").as("stt"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("stx"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sty"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      .filter(col("m") === 16)
    // centered: Cab = Sab - Sa*Sb/m; residual: Rab = Cab - Cta*Ctb/Ctt
    def cen(ab: String, a: String, b: String) =
      s"(CAST(s$ab AS DOUBLE) - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE) / m)"
    def res(ab: String, a: String, b: String) =
      s"(${cen(ab, a, b)} - ${cen("t" + a, "t", a)} * ${cen("t" + b, "t", b)} / ${cen("tt", "t", "t")})"
    // the m = 16 guard must live INSIDE the expression: ANSI Spark
    // evaluates fused projections speculatively, so the filter alone
    // does not protect the Ctt division on a 1-day box (Ctt = 0).
    // Per-series quantization scales (x in cents is ~10⁶× the count
    // series y — one shared scale floors the y residuals to zero):
    // xy ÷10³, xx ÷10⁶, yy ×10³; the final rho re-applies the scales.
    def guarded(e: String, scale: String) =
      s"CASE WHEN m = 16 THEN CAST(floor($e $scale) AS BIGINT) ELSE 0L END"
    val perBox = mom.select(
      expr(guarded(res("xy", "x", "y"), "/ 1e3")).as("qxy"),
      expr(guarded(res("xx", "x", "x"), "/ 1e6")).as("qxx"),
      expr(guarded(res("yy", "y", "y"), "* 1e3")).as("qyy"))
    perBox.agg(count(lit(1)).cast("long").as("n_boxes"),
        sum(col("qxy")).cast("decimal(38,0)").as("fxy"),
        sum(col("qxx")).cast("decimal(38,0)").as("fxx"),
        sum(col("qyy")).cast("decimal(38,0)").as("fyy"))
      .selectExpr("n_boxes",
        """CASE WHEN CAST(fxx AS DOUBLE) * CAST(fyy AS DOUBLE) = 0 THEN 0.0D
          |ELSE round(CAST(fxy AS DOUBLE) * 1e3
          |  / sqrt(CAST(fxx AS DOUBLE) * 1e6 * (CAST(fyy AS DOUBLE) / 1e3)), 6)
          |END AS rho_dcca""".stripMargin)
  }
  val timeDccaSql: String = {
    def cen(ab: String, a: String, b: String) =
      s"(CAST(s$ab AS DOUBLE) - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE) / m)"
    def res(ab: String, a: String, b: String) =
      s"(${cen(ab, a, b)} - ${cen("t" + a, "t", a)} * ${cen("t" + b, "t", b)} / ${cen("tt", "t", "t")})"
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |boxed AS (
      |  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t, x, y,
      |    CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) // 16 AS box
      |  FROM daily),
      |mom AS (
      |  SELECT box, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(t) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(t AS HUGEINT) * t) AS DECIMAL(38,0)) AS stt,
      |    CAST(sum(CAST(t AS HUGEINT) * x) AS DECIMAL(38,0)) AS stx,
      |    CAST(sum(CAST(t AS HUGEINT) * y) AS DECIMAL(38,0)) AS sty,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy
      |  FROM boxed GROUP BY 1),
      |perbox AS (
      |  SELECT CAST(floor(${res("xy", "x", "y")} / 1e3) AS BIGINT) AS qxy,
      |    CAST(floor(${res("xx", "x", "x")} / 1e6) AS BIGINT) AS qxx,
      |    CAST(floor(${res("yy", "y", "y")} * 1e3) AS BIGINT) AS qyy
      |  FROM mom WHERE m = 16),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_boxes,
      |    CAST(sum(qxy) AS DECIMAL(38,0)) AS fxy,
      |    CAST(sum(qxx) AS DECIMAL(38,0)) AS fxx,
      |    CAST(sum(qyy) AS DECIMAL(38,0)) AS fyy
      |  FROM perbox)
      |SELECT n_boxes,
      |  CASE WHEN CAST(fxx AS DOUBLE) * CAST(fyy AS DOUBLE) = 0 THEN 0.0
      |  ELSE round(CAST(fxy AS DOUBLE) * 1e3
      |    / sqrt(CAST(fxx AS DOUBLE) * 1e6 * (CAST(fyy AS DOUBLE) / 1e3)), 6) END AS rho_dcca
      |FROM ag""".stripMargin
  }

  /** C843 stat_pinball_loss — the quantile-forecast loss grid: exact
    * type-1 global quantiles of order totals at τ ∈ {.1,.25,.5,.75,.9}
    * (GlobalRank order statistics, pivoted to ONE broadcast row), then
    * the mean pinball loss of each constant forecast over the corpus
    * as pure integer cent×percent sums. The proper scoring rule every
    * quantile-regression baseline is judged by — and the sanity check
    * that the exact quantile MINIMIZES its own loss.
    */
  def statPinballLoss(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "rn", "nn", Seq(col("cv").asc, col("okey").asc))
    val qrow = ranked
      .filter(expr(
        """rn = CAST(ceil(0.10 * nn) AS BIGINT) OR rn = CAST(ceil(0.25 * nn) AS BIGINT)
          |OR rn = CAST(ceil(0.50 * nn) AS BIGINT) OR rn = CAST(ceil(0.75 * nn) AS BIGINT)
          |OR rn = CAST(ceil(0.90 * nn) AS BIGINT)""".stripMargin))
      .agg(
        min(expr("CASE WHEN rn = CAST(ceil(0.10 * nn) AS BIGINT) THEN cv END")).as("q10"),
        min(expr("CASE WHEN rn = CAST(ceil(0.25 * nn) AS BIGINT) THEN cv END")).as("q25"),
        min(expr("CASE WHEN rn = CAST(ceil(0.50 * nn) AS BIGINT) THEN cv END")).as("q50"),
        min(expr("CASE WHEN rn = CAST(ceil(0.75 * nn) AS BIGINT) THEN cv END")).as("q75"),
        min(expr("CASE WHEN rn = CAST(ceil(0.90 * nn) AS BIGINT) THEN cv END")).as("q90"))
    base.crossJoin(broadcast(qrow))
      .select(col("cv"), explode(expr(
        """array(named_struct('tau', 10, 'q', q10), named_struct('tau', 25, 'q', q25),
          |named_struct('tau', 50, 'q', q50), named_struct('tau', 75, 'q', q75),
          |named_struct('tau', 90, 'q', q90))""".stripMargin)).as("s"))
      .select(col("s.tau").as("tau100"), col("s.q").as("q"), col("cv"))
      .groupBy("tau100", "q")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr(
          """CASE WHEN cv > q THEN CAST(tau100 AS DECIMAL(38,0)) * (cv - q)
            |ELSE CAST(100 - tau100 AS DECIMAL(38,0)) * (q - cv) END""".stripMargin))
          .cast("decimal(38,0)").as("l100"))
      .selectExpr("round(CAST(tau100 AS DOUBLE) / 100, 2) AS tau",
        "round(CAST(q AS DOUBLE) / 100, 2) AS forecast",
        "round(CAST(l100 AS DOUBLE) / n / 100 / 100, 4) AS pinball_mean")
      .orderBy("tau")
  }
  val statPinballLossSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS rn,
      |    count(*) OVER () AS nn
      |  FROM base),
      |qrow AS (
      |  SELECT
      |    min(CASE WHEN rn = CAST(ceil(0.10 * nn) AS BIGINT) THEN cv END) AS q10,
      |    min(CASE WHEN rn = CAST(ceil(0.25 * nn) AS BIGINT) THEN cv END) AS q25,
      |    min(CASE WHEN rn = CAST(ceil(0.50 * nn) AS BIGINT) THEN cv END) AS q50,
      |    min(CASE WHEN rn = CAST(ceil(0.75 * nn) AS BIGINT) THEN cv END) AS q75,
      |    min(CASE WHEN rn = CAST(ceil(0.90 * nn) AS BIGINT) THEN cv END) AS q90
      |  FROM ranked
      |  WHERE rn IN (CAST(ceil(0.10 * nn) AS BIGINT), CAST(ceil(0.25 * nn) AS BIGINT),
      |    CAST(ceil(0.50 * nn) AS BIGINT), CAST(ceil(0.75 * nn) AS BIGINT),
      |    CAST(ceil(0.90 * nn) AS BIGINT))),
      |pl AS (
      |  SELECT u.tau100, u.q, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN b.cv > u.q THEN CAST(u.tau100 AS HUGEINT) * (b.cv - u.q)
      |      ELSE CAST(100 - u.tau100 AS HUGEINT) * (u.q - b.cv) END) AS DECIMAL(38,0)) AS l100
      |  FROM base b CROSS JOIN (
      |    SELECT 10 AS tau100, q10 AS q FROM qrow
      |    UNION ALL SELECT 25, q25 FROM qrow
      |    UNION ALL SELECT 50, q50 FROM qrow
      |    UNION ALL SELECT 75, q75 FROM qrow
      |    UNION ALL SELECT 90, q90 FROM qrow) u
      |  GROUP BY 1, 2)
      |SELECT round(tau100 / 100.0, 2) AS tau,
      |  round(CAST(q AS DOUBLE) / 100, 2) AS forecast,
      |  round(CAST(l100 AS DOUBLE) / n / 100 / 100, 4) AS pinball_mean
      |FROM pl ORDER BY tau""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_savage_scores" -> (statSavageScores _),
    "analytics_gravity_model" -> (analyticsGravityModel _),
    "time_dcca" -> (timeDcca _),
    "stat_pinball_loss" -> (statPinballLoss _),
  )

  val oracle: Map[String, String] = Map(
    "stat_savage_scores" -> statSavageScoresSql,
    "analytics_gravity_model" -> analyticsGravityModelSql,
    "time_dcca" -> timeDccaSql,
    "stat_pinball_loss" -> statPinballLossSql,
  )
}
