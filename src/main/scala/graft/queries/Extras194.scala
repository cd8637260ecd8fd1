package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 94 (C780–C783): lexical-richness constants + tie-exact
  * k-sample EDF testing + categorical PRE + shape screening —
  * the Guiraud/Herdan/Honoré/Sichel richness battery, the
  * Scholz–Stephens two-sample Anderson–Darling A²akN, Goodman–Kruskal
  * tau, and the Sarle bimodality coefficient.
  *
  * Shared discipline: richness constants are pure (N, V, V1, V2)
  * integer functions; the AD statistic's midrank blocks keep halves
  * ×2/×4 in integers; τ's conditional error masses stay exact
  * rationals until one division; the bimodality coefficient quantizes
  * the per-row standardized deviation once.
  */
object Extras194 {

  /** C780 text_richness_battery — the four classical lexical-richness
    * constants per source, each designed to cancel corpus-size
    * effects that raw TTR (C-line text_hapax_ratio) cannot: Guiraud
    * R = V/√N, Herdan C = lnV/lnN, Honoré R = 100·lnN/(1−V1/V),
    * Sichel S = V2/V. One explode, one (source, term) aggregate, one
    * rollup — all integers until four final IEEE expressions.
    */
  def textRichnessBattery(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).cast("long").as("c"))
    tf.groupBy("source")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("vocab"),
        sum(expr("CASE WHEN c = 1 THEN 1L ELSE 0L END")).cast("long").as("v1"),
        sum(expr("CASE WHEN c = 2 THEN 1L ELSE 0L END")).cast("long").as("v2"))
      .selectExpr("source", "n_tokens", "vocab", "v1", "v2",
        "round(CAST(vocab AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r",
        "round(ln(CAST(vocab AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c",
        // Honoré diverges when every type is a hapax; guarded exact
        """CASE WHEN v1 = vocab THEN CAST(NULL AS DOUBLE)
          |ELSE round(100 * ln(CAST(n_tokens AS DOUBLE))
          |  / (1 - CAST(v1 AS DOUBLE) / vocab), 6) END AS honore_r""".stripMargin,
        "round(CAST(v2 AS DOUBLE) / vocab, 6) AS sichel_s")
      .orderBy("source")
  }
  val textRichnessBatterySql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      |ag AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, vocab, v1, v2,
      |  round(CAST(vocab AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS guiraud_r,
      |  round(ln(CAST(vocab AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c,
      |  CASE WHEN v1 = vocab THEN CAST(NULL AS DOUBLE)
      |    ELSE round(100 * ln(CAST(n_tokens AS DOUBLE))
      |      / (1 - CAST(v1 AS DOUBLE) / vocab), 6) END AS honore_r,
      |  round(CAST(v2 AS DOUBLE) / vocab, 6) AS sichel_s
      |FROM ag ORDER BY source""".stripMargin

  /** C781 stat_ad_two_sample — the Scholz–Stephens tie-adjusted
    * two-sample Anderson–Darling statistic A²akN (the midrank version
    * scipy's anderson_ksamp computes) for returned ('R') vs
    * acknowledged ('A') lineitem quantities: per distinct value j with
    * tie-block size l_j, pooled prefix b_j and sample-1 prefix m_j,
    * the block term is l_j·(N·(m_j + l1_j/2) − n1·(b_j + l_j/2))² /
    * (B_aj(N−B_aj) − N·l_j/4), kept in ×4 integers; summed for both
    * samples and scaled by (N−1)/N². Tail-sensitive where C-line
    * stat_ks_test is middle-sensitive.
    */
  def statAdTwoSample(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("l1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("l2"))
      .withColumn("l", expr("l1 + l2"))
    // ≤50-bucket agg-bounded frame: all three exclusive prefixes from
    // ONE single-task window (plan-gate-legal; beats 3 GlobalRank passes)
    val wref = org.apache.spark.sql.expressions.Window.orderBy(col("qv").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withM = hist
      .withColumn("b", coalesce(sum(col("l")).over(wref), lit(0L)).cast("long"))
      .withColumn("m1", coalesce(sum(col("l1")).over(wref), lit(0L)).cast("long"))
      .withColumn("m2", coalesce(sum(col("l2")).over(wref), lit(0L)).cast("long"))
    val tot = hist.agg(sum(col("l1")).cast("long").as("n1"),
      sum(col("l2")).cast("long").as("n2"),
      (sum(col("l1")) + sum(col("l2"))).cast("long").as("nn"))
    // ×4 numerators: (2N(2m+l_i) − 2n_i(2b+l))² /16 → keep (2N(2m+li) − 2ni(2b+l))²
    // and ×4 denominator: (2b+l)(2N−2b−l) − N·l
    val terms = withM.crossJoin(broadcast(tot))
      .select(col("l"),
        expr(
          """CASE WHEN (CAST(2*b + l AS DECIMAL(38,0)) * (2*nn - 2*b - l) - CAST(nn AS DECIMAL(38,0)) * l) = 0
            |THEN CAST(0 AS DOUBLE) ELSE
            |CAST(l AS DOUBLE) *
            |(CAST(nn AS DOUBLE) * (2*m1 + l1) - CAST(n1 AS DOUBLE) * (2*b + l))
            |* (CAST(nn AS DOUBLE) * (2*m1 + l1) - CAST(n1 AS DOUBLE) * (2*b + l))
            |/ CAST(CAST(2*b + l AS DECIMAL(38,0)) * (2*nn - 2*b - l) - CAST(nn AS DECIMAL(38,0)) * l AS DOUBLE)
            |/ n1 END""".stripMargin).as("t1d"),
        expr(
          """CASE WHEN (CAST(2*b + l AS DECIMAL(38,0)) * (2*nn - 2*b - l) - CAST(nn AS DECIMAL(38,0)) * l) = 0
            |THEN CAST(0 AS DOUBLE) ELSE
            |CAST(l AS DOUBLE) *
            |(CAST(nn AS DOUBLE) * (2*m2 + l2) - CAST(n2 AS DOUBLE) * (2*b + l))
            |* (CAST(nn AS DOUBLE) * (2*m2 + l2) - CAST(n2 AS DOUBLE) * (2*b + l))
            |/ CAST(CAST(2*b + l AS DECIMAL(38,0)) * (2*nn - 2*b - l) - CAST(nn AS DECIMAL(38,0)) * l AS DOUBLE)
            |/ n2 END""".stripMargin).as("t2d"))
      // ×4 cancels: numerator carries ×4 (doubled factors squared = ×4·N²…),
      // denominator carries ×4 — quantize each block term before summing
      .select(expr("CAST(floor(t1d * 1e6 + 0.5) AS BIGINT)").as("q1"),
        expr("CAST(floor(t2d * 1e6 + 0.5) AS BIGINT)").as("q2"))
    terms.agg(sum(col("q1")).cast("long").as("s1"), sum(col("q2")).cast("long").as("s2"))
      .crossJoin(broadcast(tot))
      .selectExpr("n1", "n2",
        """round((CAST(nn AS DOUBLE) - 1) / nn / nn
          |* (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) / 1e6, 6) AS a2_akn""".stripMargin)
  }
  val statAdTwoSampleSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |blocks AS (
      |  SELECT qv, l1, l2, l1 + l2 AS l,
      |    COALESCE(sum(l1 + l2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS b,
      |    COALESCE(sum(l1) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS m1,
      |    COALESCE(sum(l2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS m2
      |  FROM hist),
      |tot AS (
      |  SELECT CAST(sum(l1) AS BIGINT) AS n1, CAST(sum(l2) AS BIGINT) AS n2,
      |    CAST(sum(l1 + l2) AS BIGINT) AS nn
      |  FROM hist),
      |terms AS (
      |  SELECT
      |    CAST(floor(CASE WHEN (CAST(2*k.b + k.l AS DECIMAL(38,0)) * (2*t.nn - 2*k.b - k.l) - CAST(t.nn AS DECIMAL(38,0)) * k.l) = 0
      |      THEN CAST(0 AS DOUBLE) ELSE
      |      CAST(k.l AS DOUBLE) *
      |      (CAST(t.nn AS DOUBLE) * (2*k.m1 + k.l1) - CAST(t.n1 AS DOUBLE) * (2*k.b + k.l))
      |      * (CAST(t.nn AS DOUBLE) * (2*k.m1 + k.l1) - CAST(t.n1 AS DOUBLE) * (2*k.b + k.l))
      |      / CAST(CAST(2*k.b + k.l AS DECIMAL(38,0)) * (2*t.nn - 2*k.b - k.l) - CAST(t.nn AS DECIMAL(38,0)) * k.l AS DOUBLE)
      |      / t.n1 END * 1e6 + 0.5) AS BIGINT) AS q1,
      |    CAST(floor(CASE WHEN (CAST(2*k.b + k.l AS DECIMAL(38,0)) * (2*t.nn - 2*k.b - k.l) - CAST(t.nn AS DECIMAL(38,0)) * k.l) = 0
      |      THEN CAST(0 AS DOUBLE) ELSE
      |      CAST(k.l AS DOUBLE) *
      |      (CAST(t.nn AS DOUBLE) * (2*k.m2 + k.l2) - CAST(t.n2 AS DOUBLE) * (2*k.b + k.l))
      |      * (CAST(t.nn AS DOUBLE) * (2*k.m2 + k.l2) - CAST(t.n2 AS DOUBLE) * (2*k.b + k.l))
      |      / CAST(CAST(2*k.b + k.l AS DECIMAL(38,0)) * (2*t.nn - 2*k.b - k.l) - CAST(t.nn AS DECIMAL(38,0)) * k.l AS DOUBLE)
      |      / t.n2 END * 1e6 + 0.5) AS BIGINT) AS q2
      |  FROM blocks k, tot t)
      |SELECT t.n1, t.n2,
      |  round((CAST(t.nn AS DOUBLE) - 1) / t.nn / t.nn
      |    * (CAST(CAST(sum(q1) AS BIGINT) AS DOUBLE) + CAST(CAST(sum(q2) AS BIGINT) AS DOUBLE)) / 1e6, 6) AS a2_akn
      |FROM terms, tot t GROUP BY t.n1, t.n2, t.nn""".stripMargin

  /** C782 stat_gk_tau — Goodman–Kruskal's τ (proportional reduction
    * in classification error) for predicting a document's language
    * from its source, and the reverse: τ(Y|X) = (E1 − E2)/E1 with
    * E1 = 1 − Σ_y p_y², E2 = 1 − Σ_x Σ_y p_xy²/p_x·. Exact rationals
    * over the bounded lang×source table (kept as N²-scaled integers),
    * one division each. The asymmetric PRE complement to the
    * symmetric Cramér's V and to λ's modal-only reduction.
    */
  def statGkTau(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy(col("lang").as("y"), col("source").as("x"))
      .agg(count(lit(1)).cast("long").as("m"))
    val margX = cells.groupBy("x").agg(sum(col("m")).cast("long").as("mx"))
    val margY = cells.groupBy("y").agg(sum(col("m")).cast("long").as("my"))
    val n = cells.agg(sum(col("m")).cast("long").as("n"))
    // E2 terms need Σ_x (Σ_y m_xy²)/m_x — exact rational with common
    // denominator Π m_x is explosive; quantize each x-block ·10⁹ instead
    val e2y = cells.join(broadcast(margX), Seq("x")).crossJoin(broadcast(n))
      .groupBy("x").agg(max(col("n")).as("n"), max(col("mx")).as("mx"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).cast("decimal(38,0)").as("sm2"))
      .select(expr("CAST(floor(CAST(sm2 AS DOUBLE) / mx / n * 1e9 + 0.5) AS BIGINT)").as("tq"),
        col("n"))
      .groupBy("n").agg(sum(col("tq")).cast("long").as("sum_xq"))
    val e2x = cells.join(broadcast(margY), Seq("y")).crossJoin(broadcast(n))
      .groupBy("y").agg(max(col("n")).as("n"), max(col("my")).as("my"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).cast("decimal(38,0)").as("sm2"))
      .select(expr("CAST(floor(CAST(sm2 AS DOUBLE) / my / n * 1e9 + 0.5) AS BIGINT)").as("tq"),
        col("n"))
      .groupBy("n").agg(sum(col("tq")).cast("long").as("sum_yq"))
    val m2 = margY.agg(sum(expr("CAST(my AS DECIMAL(38,0)) * my")).cast("decimal(38,0)").as("sy2"))
    val m2x = margX.agg(sum(expr("CAST(mx AS DECIMAL(38,0)) * mx")).cast("decimal(38,0)").as("sx2"))
    e2y.crossJoin(broadcast(e2x.selectExpr("sum_yq"))).crossJoin(broadcast(m2))
      .crossJoin(broadcast(m2x))
      .selectExpr("n",
        // τ(Y|X) = (Σ p_xy²/p_x − Σ p_y²) / (1 − Σ p_y²)
        """round((CAST(sum_xq AS DOUBLE) / 1e9 - CAST(sy2 AS DOUBLE) / n / n)
          |/ (1 - CAST(sy2 AS DOUBLE) / n / n), 6) AS tau_lang_given_source""".stripMargin,
        """round((CAST(sum_yq AS DOUBLE) / 1e9 - CAST(sx2 AS DOUBLE) / n / n)
          |/ (1 - CAST(sx2 AS DOUBLE) / n / n), 6) AS tau_source_given_lang""".stripMargin)
  }
  val statGkTauSql: String =
    """WITH cells AS (
      |  SELECT lang AS y, source AS x, CAST(count(*) AS BIGINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(sum(m) AS BIGINT) AS mx FROM cells GROUP BY 1),
      |my AS (SELECT y, CAST(sum(m) AS BIGINT) AS my FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM cells),
      |e2y AS (
      |  SELECT CAST(sum(tq) AS BIGINT) AS sum_xq FROM (
      |    SELECT CAST(floor(CAST(CAST(sum(CAST(c.m AS DECIMAL(38,0)) * c.m) AS DECIMAL(38,0)) AS DOUBLE)
      |      / max(x.mx) / max(t.n) * 1e9 + 0.5) AS BIGINT) AS tq
      |    FROM cells c JOIN mx x ON x.x = c.x, n t GROUP BY c.x)),
      |e2x AS (
      |  SELECT CAST(sum(tq) AS BIGINT) AS sum_yq FROM (
      |    SELECT CAST(floor(CAST(CAST(sum(CAST(c.m AS DECIMAL(38,0)) * c.m) AS DECIMAL(38,0)) AS DOUBLE)
      |      / max(y.my) / max(t.n) * 1e9 + 0.5) AS BIGINT) AS tq
      |    FROM cells c JOIN my y ON y.y = c.y, n t GROUP BY c.y)),
      |sy2 AS (SELECT CAST(sum(CAST(my AS DECIMAL(38,0)) * my) AS DECIMAL(38,0)) AS sy2 FROM my),
      |sx2 AS (SELECT CAST(sum(CAST(mx AS DECIMAL(38,0)) * mx) AS DECIMAL(38,0)) AS sx2 FROM mx)
      |SELECT t.n,
      |  round((CAST(a.sum_xq AS DOUBLE) / 1e9 - CAST(s.sy2 AS DOUBLE) / t.n / t.n)
      |    / (1 - CAST(s.sy2 AS DOUBLE) / t.n / t.n), 6) AS tau_lang_given_source,
      |  round((CAST(b.sum_yq AS DOUBLE) / 1e9 - CAST(x2.sx2 AS DOUBLE) / t.n / t.n)
      |    / (1 - CAST(x2.sx2 AS DOUBLE) / t.n / t.n), 6) AS tau_source_given_lang
      |FROM e2y a, e2x b, sy2 s, sx2 x2, n t""".stripMargin

  /** C783 stat_bimodality_coeff — Sarle's bimodality coefficient
    * BC = (g1² + 1)/(g2 + 3(n−1)²/((n−2)(n−3))) of order totals, with
    * sample skewness g1 and EXCESS kurtosis g2 from exact central
    * cent-integer moments (per-row deviations quantized once against
    * the exact mean, then DECIMAL powers). BC > 5/9 flags departure
    * from unimodality — the fast screen before any mixture fit.
    */
  def statBimodalityCoeff(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
    val m = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("cv")).cast("decimal(38,0)").as("sn"))
    // deviation in whole cents against the exact rational mean:
    // d = cv − S/n kept as n·d = n·cv − S (exact integer)
    val dev = base.crossJoin(broadcast(m))
      .select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * cv - sn").as("nd"))
      .select(col("n"),
        // scale down ONCE: u = n·d / n in DOUBLE, quantized to cents
        expr("CAST(floor(CAST(nd AS DOUBLE) / n + 0.5) AS BIGINT)").as("u"))
    dev.groupBy("n")
      .agg(sum(expr("CAST(u AS DECIMAL(38,0)) * u")).cast("decimal(38,0)").as("m2"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u * u")).cast("decimal(38,0)").as("m3"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u * u * u")).cast("decimal(38,0)").as("m4"))
      .selectExpr("n",
        "CAST(m3 AS DOUBLE) / n / pow(CAST(m2 AS DOUBLE) / n, 1.5D) AS g1",
        "CAST(m4 AS DOUBLE) / n / (CAST(m2 AS DOUBLE) / n * (CAST(m2 AS DOUBLE) / n)) - 3 AS g2")
      .selectExpr("n", "round(g1, 6) AS skewness", "round(g2, 6) AS excess_kurtosis",
        """round((g1 * g1 + 1)
          |/ (g2 + 3.0D * (n - 1) * (n - 1) / (CAST(n - 2 AS DOUBLE) * (n - 3))), 6) AS bimodality_coeff""".stripMargin)
  }
  val statBimodalityCoeffSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv FROM orders),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cv) AS DECIMAL(38,0)) AS sn FROM base),
      |dev AS (
      |  SELECT m.n,
      |    CAST(floor(CAST(CAST(m.n AS DECIMAL(38,0)) * b.cv - m.sn AS DOUBLE) / m.n + 0.5) AS BIGINT) AS u
      |  FROM base b, m),
      |mm AS (
      |  SELECT n,
      |    CAST(sum(CAST(u AS DECIMAL(38,0)) * u) AS DECIMAL(38,0)) AS m2,
      |    CAST(sum(CAST(u AS DECIMAL(38,0)) * u * u) AS DECIMAL(38,0)) AS m3,
      |    CAST(sum(CAST(u AS DECIMAL(38,0)) * u * u * u) AS DECIMAL(38,0)) AS m4
      |  FROM dev GROUP BY 1),
      |g AS (
      |  SELECT n,
      |    CAST(m3 AS DOUBLE) / n / pow(CAST(m2 AS DOUBLE) / n, 1.5) AS g1,
      |    CAST(m4 AS DOUBLE) / n / (CAST(m2 AS DOUBLE) / n * (CAST(m2 AS DOUBLE) / n)) - 3 AS g2
      |  FROM mm)
      |SELECT n, round(g1, 6) AS skewness, round(g2, 6) AS excess_kurtosis,
      |  round((g1 * g1 + 1)
      |    / (g2 + 3.0 * (n - 1) * (n - 1) / (CAST(n - 2 AS DOUBLE) * (n - 3))), 6) AS bimodality_coeff
      |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_richness_battery" -> (textRichnessBattery _),
    "stat_ad_two_sample" -> (statAdTwoSample _),
    "stat_gk_tau" -> (statGkTau _),
    "stat_bimodality_coeff" -> (statBimodalityCoeff _),
  )

  val oracle: Map[String, String] = Map(
    "text_richness_battery" -> textRichnessBatterySql,
    "stat_ad_two_sample" -> statAdTwoSampleSql,
    "stat_gk_tau" -> statGkTauSql,
    "stat_bimodality_coeff" -> statBimodalityCoeffSql,
  )
}
