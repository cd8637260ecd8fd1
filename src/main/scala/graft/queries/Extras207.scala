package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 107 (C832–C835): diversity spectra + clinical-style margins +
  * covariate adjustment + mediation — Hill numbers, a non-inferiority
  * proportion test, one-way ANCOVA, and the Sobel mediation test.
  *
  * Shared discipline: Hill q∈{0,1,2} come from one token histogram
  * (entropy terms ·10⁹-quantized, Simpson mass exact rationals);
  * the NI margin decision uses exact counts; ANCOVA and Sobel are
  * pure closed-form moment algebra — exact DECIMAL sums in, a handful
  * of identical IEEE expressions out.
  */
object Extras207 {

  /** C832 text_hill_numbers — the Hill diversity spectrum of each
    * source's token distribution: q=0 (vocabulary size), q=1
    * (exp Shannon, ·10⁹-quantized terms), q=2 (inverse Simpson from
    * exact Σm² rationals). One number per q — and the SLOPE across q
    * says whether diversity lives in the long tail (q0≫q1) or the
    * core (q0≈q2). The unified replacement for reading entropy and
    * HHI rows side-by-side.
    */
  def textHillNumbers(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).cast("long").as("m"))
    val tot = tf.groupBy("source").agg(sum(col("m")).cast("long").as("n"))
    tf.join(broadcast(tot), Seq("source"))
      .groupBy("source")
      .agg(max(col("n")).as("n_tokens"),
        count(lit(1)).cast("long").as("hill_q0"),
        sum(expr(
          "CAST(floor(CAST(m AS DOUBLE) * ln(CAST(n AS DOUBLE) / m) * 1e9 + 0.5) AS BIGINT)"))
          .cast("long").as("hq"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).cast("decimal(38,0)").as("m2"))
      .selectExpr("source", "n_tokens", "hill_q0",
        "round(exp(CAST(hq AS DOUBLE) / 1e9 / n_tokens), 4) AS hill_q1",
        """round(CAST(n_tokens AS DOUBLE) * n_tokens / CAST(m2 AS DOUBLE), 4) AS hill_q2""")
      .orderBy("source")
  }
  val textHillNumbersSql: String =
    """WITH tf AS (
      |  SELECT source, w, CAST(count(*) AS BIGINT) AS m FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(m) AS BIGINT) AS n FROM tf GROUP BY 1)
      |SELECT f.source, max(t.n) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS hill_q0,
      |  round(exp(CAST(CAST(sum(CAST(floor(CAST(f.m AS DOUBLE) * ln(CAST(t.n AS DOUBLE) / f.m) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / 1e9 / max(t.n)), 4) AS hill_q1,
      |  round(CAST(max(t.n) AS DOUBLE) * max(t.n)
      |    / CAST(CAST(sum(CAST(f.m AS DECIMAL(38,0)) * f.m) AS DECIMAL(38,0)) AS DOUBLE), 4) AS hill_q2
      |FROM tf f JOIN tot t ON t.source = f.source
      |GROUP BY f.source ORDER BY f.source""".stripMargin

  /** C833 stat_noninferiority_prop — the one-sided non-inferiority
    * test for on-time shipping (lead ≤ 30 days): is the discounted
    * population's rate NOT WORSE than the full-price population's by
    * more than δ = 2pp? z = (p₁ − p₂ + δ)/SE_Wald from exact counts;
    * conclusion at z > 1.645. Superiority tests can't answer
    * "acceptably similar" — this is the margin framing reviews
    * actually need.
    */
  def statNoninferiorityProp(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("g"),
        expr("CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN 1L ELSE 0L END").as("ok"))
    base.agg(
        sum(expr("CASE WHEN g = 1 THEN 1L ELSE 0L END")).cast("long").as("n1"),
        sum(expr("CASE WHEN g = 1 THEN ok ELSE 0L END")).cast("long").as("k1"),
        sum(expr("CASE WHEN g = 0 THEN 1L ELSE 0L END")).cast("long").as("n2"),
        sum(expr("CASE WHEN g = 0 THEN ok ELSE 0L END")).cast("long").as("k2"))
      .selectExpr("n1", "n2",
        "CAST(k1 AS DOUBLE) / n1 AS p1", "CAST(k2 AS DOUBLE) / n2 AS p2")
      .selectExpr("n1", "n2", "round(p1, 6) AS rate_discounted", "round(p2, 6) AS rate_fullprice",
        """round((p1 - p2 + 0.02D)
          |/ sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2), 4) AS z_noninferiority""".stripMargin,
        """(p1 - p2 + 0.02D)
          |/ sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2) > 1.645D AS noninferior_at_2pp""".stripMargin)
  }
  val statNoninferiorityPropSql: String =
    """WITH base AS (
      |  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS g,
      |    CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END AS ok
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |m AS (
      |  SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN g = 1 THEN ok ELSE 0 END) AS BIGINT) AS k1,
      |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN g = 0 THEN ok ELSE 0 END) AS BIGINT) AS k2
      |  FROM base),
      |v AS (
      |  SELECT n1, n2, CAST(k1 AS DOUBLE) / n1 AS p1, CAST(k2 AS DOUBLE) / n2 AS p2 FROM m)
      |SELECT n1, n2, round(p1, 6) AS rate_discounted, round(p2, 6) AS rate_fullprice,
      |  round((p1 - p2 + 0.02)
      |    / sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2), 4) AS z_noninferiority,
      |  (p1 - p2 + 0.02)
      |    / sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2) > 1.645 AS noninferior_at_2pp
      |FROM v""".stripMargin

  /** C834 stat_ancova_adjusted — one-way ANCOVA of line value across
    * return flags with quantity as the covariate: pooled within-group
    * slope b_w = ΣSxy_g/ΣSxx_g from exact per-group centered moments,
    * covariate-adjusted group means, and the adjusted-group-effect F =
    * ((SSE_cov − SSE_full)/(k−1))/(SSE_full/(N−k−1)). Answers "do the
    * groups differ AT THE SAME quantity" — the raw ANOVA conflates
    * group mix with the covariate.
    */
  def statAncovaAdjusted(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"))
      // centered within-group sums as doubles (exact inputs)
      .selectExpr("grp", "ng", "sx", "sy",
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / ng AS wxx",
        "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / ng AS wxy",
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / ng AS wyy")
    val pooled = g.agg(count(lit(1)).cast("long").as("k"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("sx")).cast("decimal(38,0)").as("tx"),
        sum(col("sy")).cast("decimal(38,0)").as("ty"),
        sum(expr("CAST(floor(wxx * 1e3 + 0.5) AS DECIMAL(38,0))")).as("wxx3"),
        sum(expr("CAST(floor(wxy * 1e3 + 0.5) AS DECIMAL(38,0))")).as("wxy3"),
        // wyy is ~1e21-scale: quantize DOWN (grid 1e6) so the double floor
        // stays far from the silent Long.MaxValue clamp
        sum(expr("CAST(floor(wyy / 1e6 + 0.5) AS DECIMAL(38,0))")).as("wyy6"))
    // covariate-only (no groups) sums need raw totals: recompute from base
    val totm = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
      .agg(count(lit(1)).cast("long").as("nt"),
        sum(col("x")).cast("decimal(38,0)").as("ax"),
        sum(col("y")).cast("decimal(38,0)").as("ay"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("axx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("axy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("ayy"))
    pooled.crossJoin(broadcast(totm))
      .selectExpr("k", "n",
        "CAST(wxx3 AS DOUBLE) / 1e3 AS wxx", "CAST(wxy3 AS DOUBLE) / 1e3 AS wxy",
        "CAST(wyy6 AS DOUBLE) * 1e6 AS wyy",
        "CAST(axx AS DOUBLE) - CAST(ax AS DOUBLE) * CAST(ax AS DOUBLE) / nt AS txx",
        "CAST(axy AS DOUBLE) - CAST(ax AS DOUBLE) * CAST(ay AS DOUBLE) / nt AS txy",
        "CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * CAST(ay AS DOUBLE) / nt AS tyy")
      .selectExpr("k", "n",
        "wyy - wxy * wxy / wxx AS sse_full",
        "tyy - txy * txy / txx AS sse_cov",
        "round(wxy / wxx / 100, 6) AS pooled_slope_dollars_per_unit")
      .selectExpr("k", "n", "pooled_slope_dollars_per_unit",
        """round(((sse_cov - sse_full) / (k - 1))
          |/ (sse_full / (n - k - 1)), 4) AS f_ancova""".stripMargin)
  }
  val statAncovaAdjustedSql: String =
    """WITH g AS (
      |  SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      |  FROM (
      |    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |    FROM lineitem)
      |  GROUP BY 1),
      |w AS (
      |  SELECT grp, ng, sx, sy,
      |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / ng AS wxx,
      |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / ng AS wxy,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / ng AS wyy
      |  FROM g),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(wxx * 1e3 + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS wxx3,
      |    CAST(sum(CAST(floor(wxy * 1e3 + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS wxy3,
      |    CAST(sum(CAST(floor(wyy / 1e6 + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS wyy6
      |  FROM w),
      |totm AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nt,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS ax, CAST(sum(y) AS DECIMAL(38,0)) AS ay,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS axx,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS axy,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS ayy
      |  FROM (
      |    SELECT CAST(l_quantity AS BIGINT) AS x,
      |      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |    FROM lineitem)),
      |v AS (
      |  SELECT p.k, p.n,
      |    CAST(p.wxx3 AS DOUBLE) / 1e3 AS wxx, CAST(p.wxy3 AS DOUBLE) / 1e3 AS wxy,
      |    CAST(p.wyy6 AS DOUBLE) * 1e6 AS wyy,
      |    CAST(t.axx AS DOUBLE) - CAST(t.ax AS DOUBLE) * CAST(t.ax AS DOUBLE) / t.nt AS txx,
      |    CAST(t.axy AS DOUBLE) - CAST(t.ax AS DOUBLE) * CAST(t.ay AS DOUBLE) / t.nt AS txy,
      |    CAST(t.ayy AS DOUBLE) - CAST(t.ay AS DOUBLE) * CAST(t.ay AS DOUBLE) / t.nt AS tyy
      |  FROM pooled p, totm t),
      |f AS (
      |  SELECT k, n,
      |    wyy - wxy * wxy / wxx AS sse_full,
      |    tyy - txy * txy / txx AS sse_cov,
      |    round(wxy / wxx / 100, 6) AS pooled_slope_dollars_per_unit
      |  FROM v)
      |SELECT k, n, pooled_slope_dollars_per_unit,
      |  round(((sse_cov - sse_full) / (k - 1))
      |    / (sse_full / (n - k - 1)), 4) AS f_ancova
      |FROM f""".stripMargin

  /** C835 stat_sobel_mediation — the Sobel test of whether discount
    * MEDIATES the quantity→price relationship: a = slope(M~X),
    * b = partial slope(Y~M | X) from the 2-regressor normal equations,
    * both with closed-form SEs from exact centered moments,
    * z = ab/√(a²SE_b² + b²SE_a²) and the mediated share ab/(total
    * effect). The causal-chain decomposition — pure moment algebra,
    * no bootstrap.
    */
  def statSobelMediation(s: SparkSession, d: String): DataFrame = {
    val m = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("mm"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("mm")).cast("decimal(38,0)").as("sm"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(mm AS DECIMAL(38,0)) * mm")).cast("decimal(38,0)").as("smm"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * mm")).cast("decimal(38,0)").as("sxm"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(mm AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("smy"))
    m.selectExpr("n",
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS cxx",
        "CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / n AS cmm",
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cyy",
        "CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE) / n AS cxm",
        "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cxy",
        "CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cmy")
      .selectExpr("n",
        "cxm / cxx AS a",
        "(cmm - cxm * cxm / cxx) / (n - 2) AS siga2_num", // Var resid of M~X, per df
        "(cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm) AS b",
        "cxy / cxx AS total_slope",
        "cxx", "cmm", "cxm", "cyy", "cxy", "cmy")
      .selectExpr("n", "a", "b", "total_slope",
        "siga2_num / cxx AS se_a2",
        // SSE of Y ~ (X, M); SE(b)^2 = sse/(n-3) * cxx / (cxx*cmm - cxm^2)
        """(cyy - ((cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm)) * cxy
          |- ((cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm)) * cmy) / (n - 3)
          |* cxx / (cxx * cmm - cxm * cxm) AS se_b2""".stripMargin)
      .selectExpr("n",
        "round(a, 6) AS a_x_to_m",
        "round(b / 100, 6) AS b_m_to_y_dollars",
        "round(a * b / (total_slope), 6) AS mediated_share",
        "round(a * b / sqrt(a * a * se_b2 + b * b * se_a2), 4) AS sobel_z")
  }
  val statSobelMediationSql: String =
    """WITH m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(mm) AS DECIMAL(38,0)) AS sm,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(mm AS DECIMAL(38,0)) * mm) AS DECIMAL(38,0)) AS smm,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * mm) AS DECIMAL(38,0)) AS sxm,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(mm AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS smy
      |  FROM (
      |    SELECT CAST(l_quantity AS BIGINT) AS x,
      |      CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS mm,
      |      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
      |    FROM lineitem)),
      |c AS (
      |  SELECT n,
      |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS cxx,
      |    CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / n AS cmm,
      |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cyy,
      |    CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE) / n AS cxm,
      |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cxy,
      |    CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cmy
      |  FROM m),
      |v AS (
      |  SELECT n,
      |    cxm / cxx AS a,
      |    (cmm - cxm * cxm / cxx) / (n - 2) / cxx AS se_a2,
      |    (cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm) AS b,
      |    cxy / cxx AS total_slope,
      |    (cyy - ((cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm)) * cxy
      |      - ((cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm)) * cmy) / (n - 3)
      |      * cxx / (cxx * cmm - cxm * cxm) AS se_b2
      |  FROM c)
      |SELECT n,
      |  round(a, 6) AS a_x_to_m,
      |  round(b / 100, 6) AS b_m_to_y_dollars,
      |  round(a * b / total_slope, 6) AS mediated_share,
      |  round(a * b / sqrt(a * a * se_b2 + b * b * se_a2), 4) AS sobel_z
      |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hill_numbers" -> (textHillNumbers _),
    "stat_noninferiority_prop" -> (statNoninferiorityProp _),
    "stat_ancova_adjusted" -> (statAncovaAdjusted _),
    "stat_sobel_mediation" -> (statSobelMediation _),
  )

  val oracle: Map[String, String] = Map(
    "text_hill_numbers" -> textHillNumbersSql,
    "stat_noninferiority_prop" -> statNoninferiorityPropSql,
    "stat_ancova_adjusted" -> statAncovaAdjustedSql,
    "stat_sobel_mediation" -> statSobelMediationSql,
  )
}
