package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 84 (C740–C743): the second rank-test battery — Cuzick's trend
  * test across ordered groups, Conover's squared-ranks scale test,
  * Brunner–Munzel (the nonparametric Behrens–Fisher), and
  * Kruskal–Wallis effect sizes.
  *
  * Shared discipline: every statistic is computed from VALUE
  * HISTOGRAMS (per-value group counts + prefix sums — one corpus scan,
  * O(distinct values) afterwards); midranks stay exact as doubled
  * integers; tie corrections use exact Σ(g³−g) DECIMAL terms.
  */
object Extras184 {

  /** Priority-group value histogram over order totals (cents), with
    * pooled prefix counts: m1..m5 = per-priority counts at each value.
    */
  private def hist(s: SparkSession, d: String): DataFrame = {
    val pv = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("v")
      .agg(
        sum(expr("CASE WHEN grp = 1 THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN grp = 2 THEN 1L ELSE 0L END")).cast("long").as("m2"),
        sum(expr("CASE WHEN grp = 3 THEN 1L ELSE 0L END")).cast("long").as("m3"),
        sum(expr("CASE WHEN grp = 4 THEN 1L ELSE 0L END")).cast("long").as("m4"),
        sum(expr("CASE WHEN grp = 5 THEN 1L ELSE 0L END")).cast("long").as("m5"))
      .withColumn("g", expr("m1 + m2 + m3 + m4 + m5"))
    graft.plans.GlobalRank.withExclusivePrefixSum(pv, "c", col("g"), Seq(col("v").asc))
  }
  private val histSql: String =
    """pv AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1) = '2' THEN 1 ELSE 0 END) AS BIGINT) AS m2,
      |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1) = '3' THEN 1 ELSE 0 END) AS BIGINT) AS m3,
      |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1) = '4' THEN 1 ELSE 0 END) AS BIGINT) AS m4,
      |    CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1) = '5' THEN 1 ELSE 0 END) AS BIGINT) AS m5
      |  FROM orders GROUP BY 1),
      |blocks AS (
      |  SELECT v, m1, m2, m3, m4, m5, m1 + m2 + m3 + m4 + m5 AS g,
      |    COALESCE(sum(m1 + m2 + m3 + m4 + m5) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM pv)""".stripMargin

  /** C740 stat_cuzick_trend — Cuzick's Wilcoxon-type trend test across
    * the ORDERED priority groups (scores 1..5): T = Σ_j l_j·R_j from
    * doubled midranks (exact), E[T] = (N+1)Σl_j n_j / 2, tie-corrected
    * Var; z. The "is there a dose-response" complement to the
    * Jonckheere row — rank sums instead of pairwise U's.
    */
  def statCuzickTrend(s: SparkSession, d: String): DataFrame = {
    hist(s, d)
      .agg(sum(col("g")).cast("long").as("nn"),
        sum(expr("m1 + 2*m2 + 3*m3 + 4*m4 + 5*m5")).cast("decimal(38,0)").as("ln1"),
        sum(expr("m1 + 4*m2 + 9*m3 + 16*m4 + 25*m5")).cast("decimal(38,0)").as("ln2"),
        sum(expr("CAST(m1 + 2*m2 + 3*m3 + 4*m4 + 5*m5 AS DECIMAL(38,0)) * (2 * c + g + 1)"))
          .cast("decimal(38,0)").as("tx2"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g * g - g")).cast("decimal(38,0)").as("ties"))
      .selectExpr("nn",
        "CAST(tx2 AS DOUBLE) / 2 AS t",
        "(CAST(nn AS DOUBLE) + 1) * CAST(ln1 AS DOUBLE) / 2 AS e_t",
        """CAST(nn AS DOUBLE) * (nn + 1) / 12
          |* (CAST(ln2 AS DOUBLE) - CAST(ln1 AS DOUBLE) * CAST(ln1 AS DOUBLE) / nn)
          |* (1 - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * nn * nn - nn)) AS var_t""".stripMargin)
      .selectExpr("nn AS n", "round(t, 2) AS t_stat", "round(e_t, 2) AS e_t",
        "round((t - e_t) / sqrt(var_t), 6) AS z")
  }
  val statCuzickTrendSql: String =
    s"""WITH $histSql,
      |agg AS (
      |  SELECT CAST(sum(g) AS BIGINT) AS nn,
      |    CAST(sum(m1 + 2*m2 + 3*m3 + 4*m4 + 5*m5) AS DECIMAL(38,0)) AS ln1,
      |    CAST(sum(m1 + 4*m2 + 9*m3 + 16*m4 + 25*m5) AS DECIMAL(38,0)) AS ln2,
      |    CAST(sum(CAST(m1 + 2*m2 + 3*m3 + 4*m4 + 5*m5 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS tx2,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * g * g - g) AS DECIMAL(38,0)) AS ties
      |  FROM blocks),
      |m AS (
      |  SELECT nn, CAST(tx2 AS DOUBLE) / 2 AS t,
      |    (CAST(nn AS DOUBLE) + 1) * CAST(ln1 AS DOUBLE) / 2 AS e_t,
      |    CAST(nn AS DOUBLE) * (nn + 1) / 12
      |      * (CAST(ln2 AS DOUBLE) - CAST(ln1 AS DOUBLE) * CAST(ln1 AS DOUBLE) / nn)
      |      * (1 - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * nn * nn - nn)) AS var_t
      |  FROM agg)
      |SELECT nn AS n, round(t, 2) AS t_stat, round(e_t, 2) AS e_t,
      |  round((t - e_t) / sqrt(var_t), 6) AS z
      |FROM m""".stripMargin

  /** C741 stat_kw_effect_size — the tie-corrected Kruskal–Wallis H on
    * the same histogram plus BOTH standard effect sizes: η²_H =
    * (H−k+1)/(N−k) and ε² = H(N+1)/(N²−1). The "is the difference big
    * or just significant" companion every KW report needs.
    */
  def statKwEffectSize(s: SparkSession, d: String): DataFrame = {
    hist(s, d)
      .agg(sum(col("g")).cast("long").as("nn"),
        sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"),
        sum(col("m3")).cast("long").as("n3"), sum(col("m4")).cast("long").as("n4"),
        sum(col("m5")).cast("long").as("n5"),
        sum(expr("CAST(m1 AS DECIMAL(38,0)) * (2 * c + g + 1)")).cast("decimal(38,0)").as("r1x2"),
        sum(expr("CAST(m2 AS DECIMAL(38,0)) * (2 * c + g + 1)")).cast("decimal(38,0)").as("r2x2"),
        sum(expr("CAST(m3 AS DECIMAL(38,0)) * (2 * c + g + 1)")).cast("decimal(38,0)").as("r3x2"),
        sum(expr("CAST(m4 AS DECIMAL(38,0)) * (2 * c + g + 1)")).cast("decimal(38,0)").as("r4x2"),
        sum(expr("CAST(m5 AS DECIMAL(38,0)) * (2 * c + g + 1)")).cast("decimal(38,0)").as("r5x2"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g * g - g")).cast("decimal(38,0)").as("ties"))
      .selectExpr("nn",
        """(12.0 / (CAST(nn AS DOUBLE) * (nn + 1))
          |* ((CAST(r1x2 AS DOUBLE) / 2) * (CAST(r1x2 AS DOUBLE) / 2) / n1
          |  + (CAST(r2x2 AS DOUBLE) / 2) * (CAST(r2x2 AS DOUBLE) / 2) / n2
          |  + (CAST(r3x2 AS DOUBLE) / 2) * (CAST(r3x2 AS DOUBLE) / 2) / n3
          |  + (CAST(r4x2 AS DOUBLE) / 2) * (CAST(r4x2 AS DOUBLE) / 2) / n4
          |  + (CAST(r5x2 AS DOUBLE) / 2) * (CAST(r5x2 AS DOUBLE) / 2) / n5)
          |- 3.0 * (nn + 1))
          |/ (1 - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * nn * nn - nn)) AS h""".stripMargin)
      .selectExpr("nn AS n", "5 AS k", "round(h, 6) AS h",
        "round((h - 5 + 1) / (nn - 5), 8) AS eta2_h",
        "round(h * (nn + 1) / (CAST(nn AS DOUBLE) * nn - 1), 8) AS epsilon2")
  }
  val statKwEffectSizeSql: String =
    s"""WITH $histSql,
      |agg AS (
      |  SELECT CAST(sum(g) AS BIGINT) AS nn,
      |    CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2,
      |    CAST(sum(m3) AS BIGINT) AS n3, CAST(sum(m4) AS BIGINT) AS n4,
      |    CAST(sum(m5) AS BIGINT) AS n5,
      |    CAST(sum(CAST(m1 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r1x2,
      |    CAST(sum(CAST(m2 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r2x2,
      |    CAST(sum(CAST(m3 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r3x2,
      |    CAST(sum(CAST(m4 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r4x2,
      |    CAST(sum(CAST(m5 AS DECIMAL(38,0)) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r5x2,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * g * g - g) AS DECIMAL(38,0)) AS ties
      |  FROM blocks),
      |m AS (
      |  SELECT nn,
      |    (12.0 / (CAST(nn AS DOUBLE) * (nn + 1))
      |      * ((CAST(r1x2 AS DOUBLE) / 2) * (CAST(r1x2 AS DOUBLE) / 2) / n1
      |        + (CAST(r2x2 AS DOUBLE) / 2) * (CAST(r2x2 AS DOUBLE) / 2) / n2
      |        + (CAST(r3x2 AS DOUBLE) / 2) * (CAST(r3x2 AS DOUBLE) / 2) / n3
      |        + (CAST(r4x2 AS DOUBLE) / 2) * (CAST(r4x2 AS DOUBLE) / 2) / n4
      |        + (CAST(r5x2 AS DOUBLE) / 2) * (CAST(r5x2 AS DOUBLE) / 2) / n5)
      |      - 3.0 * (nn + 1))
      |    / (1 - CAST(ties AS DOUBLE) / (CAST(nn AS DOUBLE) * nn * nn - nn)) AS h
      |  FROM agg)
      |SELECT nn AS n, 5 AS k, round(h, 6) AS h,
      |  round((h - 5 + 1) / (nn - 5), 8) AS eta2_h,
      |  round(h * (nn + 1) / (CAST(nn AS DOUBLE) * nn - 1), 8) AS epsilon2
      |FROM m""".stripMargin

  /** C742 stat_brunner_munzel — the nonparametric Behrens–Fisher test
    * (en vs de doc lengths, the scipy formulation): per-tied-block
    * PLACEMENTS (pooled midrank − within-group midrank, exact doubled
    * integers), group placement variances S²_j, and
    * W = n1·n2·(R̄₂−R̄₁)/((n1+n2)·√(n1·S₁²+n2·S₂²)), plus the
    * stochastic-superiority estimate p̂ = P(X<Y)+½P(X=Y). The test to
    * run when Mann–Whitney's equal-variance assumption is itself in
    * doubt.
    */
  def statBrunnerMunzel(s: SparkSession, d: String): DataFrame = {
    val pv = documents(s, d).filter(col("lang").isin("en", "de"))
      .groupBy(col("n_chars").as("v"))
      .agg(sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN lang = 'de' THEN 1L ELSE 0L END")).cast("long").as("m2"))
      .withColumn("g", expr("m1 + m2"))
    // three prefix sums over the SAME v-order, v = n_chars (generator-
    // capped bounded domain): one shared single-task window instead of
    // three GlobalRank machineries (r14; plan-gate legal via n_chars)
    val withC2 = graft.plans.BoundedPrefix.prefixSums(pv,
      Seq((col("g"), "c"), (col("m1"), "c1"), (col("m2"), "c2")), Seq(col("v").asc))
    // doubled placements: 2·(R(v) − r_j(v)) = (2c+g+1) − (2c_j+m_j+1)
    val agg = withC2.agg(
      sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"),
      sum(expr("CAST(m1 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c1 + m1 + 1))"))
        .cast("decimal(38,0)").as("p1x2"),
      sum(expr("CAST(m1 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c1 + m1 + 1)) * ((2*c + g + 1) - (2*c1 + m1 + 1))"))
        .cast("decimal(38,0)").as("q1x4"),
      sum(expr("CAST(m2 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c2 + m2 + 1))"))
        .cast("decimal(38,0)").as("p2x2"),
      sum(expr("CAST(m2 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c2 + m2 + 1)) * ((2*c + g + 1) - (2*c2 + m2 + 1))"))
        .cast("decimal(38,0)").as("q2x4"))
    agg.selectExpr("n1", "n2",
        "CAST(p1x2 AS DOUBLE) / 2 / n1 AS pm1", // mean placement group 1 = R̄₁ − (n1+1)/2
        "CAST(p2x2 AS DOUBLE) / 2 / n2 AS pm2",
        """(CAST(q1x4 AS DOUBLE) / 4 - (CAST(p1x2 AS DOUBLE) / 2) * (CAST(p1x2 AS DOUBLE) / 2) / n1)
          |/ (n1 - 1) AS s1sq""".stripMargin,
        """(CAST(q2x4 AS DOUBLE) / 4 - (CAST(p2x2 AS DOUBLE) / 2) * (CAST(p2x2 AS DOUBLE) / 2) / n2)
          |/ (n2 - 1) AS s2sq""".stripMargin)
      .selectExpr("n1", "n2",
        "round((pm2 - pm1) * CAST(n1 AS DOUBLE) * n2 / (n1 + n2) / sqrt(CAST(n1 AS DOUBLE) * s1sq + CAST(n2 AS DOUBLE) * s2sq), 6) AS w_bm",
        "round(pm2 / n1, 6) AS p_hat")
      .selectExpr("n1", "n2", "w_bm", "p_hat")
  }
  val statBrunnerMunzelSql: String =
    """WITH pv AS (
      |  SELECT n_chars AS v,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
      |blocks AS (
      |  SELECT v, m1, m2, m1 + m2 AS g,
      |    COALESCE(sum(m1 + m2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c,
      |    COALESCE(sum(m1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(m2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2,
      |    CAST(sum(CAST(m1 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c1 + m1 + 1))) AS DECIMAL(38,0)) AS p1x2,
      |    CAST(sum(CAST(m1 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c1 + m1 + 1)) * ((2*c + g + 1) - (2*c1 + m1 + 1))) AS DECIMAL(38,0)) AS q1x4,
      |    CAST(sum(CAST(m2 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c2 + m2 + 1))) AS DECIMAL(38,0)) AS p2x2,
      |    CAST(sum(CAST(m2 AS DECIMAL(38,0)) * ((2*c + g + 1) - (2*c2 + m2 + 1)) * ((2*c + g + 1) - (2*c2 + m2 + 1))) AS DECIMAL(38,0)) AS q2x4
      |  FROM blocks),
      |m AS (
      |  SELECT n1, n2,
      |    CAST(p1x2 AS DOUBLE) / 2 / n1 AS pm1,
      |    CAST(p2x2 AS DOUBLE) / 2 / n2 AS pm2,
      |    (CAST(q1x4 AS DOUBLE) / 4 - (CAST(p1x2 AS DOUBLE) / 2) * (CAST(p1x2 AS DOUBLE) / 2) / n1)
      |      / (n1 - 1) AS s1sq,
      |    (CAST(q2x4 AS DOUBLE) / 4 - (CAST(p2x2 AS DOUBLE) / 2) * (CAST(p2x2 AS DOUBLE) / 2) / n2)
      |      / (n2 - 1) AS s2sq
      |  FROM agg)
      |SELECT n1, n2,
      |  round((pm2 - pm1) * CAST(n1 AS DOUBLE) * n2 / (n1 + n2) / sqrt(CAST(n1 AS DOUBLE) * s1sq + CAST(n2 AS DOUBLE) * s2sq), 6) AS w_bm,
      |  round(pm2 / n1, 6) AS p_hat
      |FROM m""".stripMargin

  /** C743 stat_conover_squared_ranks — Conover's squared-ranks scale
    * test across the 5 priority groups: deviations |c·n_j − S_j|/n_j
    * from exact group means (quantized per row), pooled midranks of
    * the deviation HISTOGRAM, a_i = R², and the χ²(k−1) statistic
    * (Σ T_j²/n_j − N·ā²)/D². The k-group scale test that needs no
    * normality — the formal follow-up to C707's Hartley/Cochran
    * screens.
    */
  def statConoverSquaredRanks(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
    val gm = base.groupBy("grp")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("cv")).cast("decimal(38,0)").as("sg"))
    val devs = base.join(broadcast(gm), Seq("grp"))
      .select(col("grp"),
        expr("CAST(floor(abs(CAST(cv AS DOUBLE) - CAST(sg AS DOUBLE) / ng) + 0.5) AS BIGINT)").as("u"))
    val pv = devs.groupBy("u")
      .agg(
        sum(expr("CASE WHEN grp = 1 THEN 1L ELSE 0L END")).cast("long").as("m1"),
        sum(expr("CASE WHEN grp = 2 THEN 1L ELSE 0L END")).cast("long").as("m2"),
        sum(expr("CASE WHEN grp = 3 THEN 1L ELSE 0L END")).cast("long").as("m3"),
        sum(expr("CASE WHEN grp = 4 THEN 1L ELSE 0L END")).cast("long").as("m4"),
        sum(expr("CASE WHEN grp = 5 THEN 1L ELSE 0L END")).cast("long").as("m5"))
      .withColumn("g", expr("m1 + m2 + m3 + m4 + m5"))
    val withC = graft.plans.GlobalRank.withExclusivePrefixSum(pv, "c", col("g"), Seq(col("u").asc))
    // a(block) = midrank² = (2c+g+1)²/4 exact; Σa and Σa² per group
    val a2 = "(CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))" // 4·a
    val a4 = s"($a2 * (2*c + g + 1) * (2*c + g + 1))"               // 16·a²
    withC.agg(
        sum(col("g")).cast("long").as("nn"),
        sum(col("m1")).cast("long").as("n1"), sum(col("m2")).cast("long").as("n2"),
        sum(col("m3")).cast("long").as("n3"), sum(col("m4")).cast("long").as("n4"),
        sum(col("m5")).cast("long").as("n5"),
        sum(expr(s"CAST(m1 AS DECIMAL(38,0)) * $a2")).cast("decimal(38,0)").as("t1x4"),
        sum(expr(s"CAST(m2 AS DECIMAL(38,0)) * $a2")).cast("decimal(38,0)").as("t2x4"),
        sum(expr(s"CAST(m3 AS DECIMAL(38,0)) * $a2")).cast("decimal(38,0)").as("t3x4"),
        sum(expr(s"CAST(m4 AS DECIMAL(38,0)) * $a2")).cast("decimal(38,0)").as("t4x4"),
        sum(expr(s"CAST(m5 AS DECIMAL(38,0)) * $a2")).cast("decimal(38,0)").as("t5x4"),
        sum(expr(s"CAST(g AS DECIMAL(38,0)) * $a4")).cast("decimal(38,0)").as("sa2x16"))
      .selectExpr("nn", "n1", "n2", "n3", "n4", "n5",
        "CAST(t1x4 AS DOUBLE) / 4 AS t1", "CAST(t2x4 AS DOUBLE) / 4 AS t2",
        "CAST(t3x4 AS DOUBLE) / 4 AS t3", "CAST(t4x4 AS DOUBLE) / 4 AS t4",
        "CAST(t5x4 AS DOUBLE) / 4 AS t5", "CAST(sa2x16 AS DOUBLE) / 16 AS sa2")
      .selectExpr("nn",
        "(t1 + t2 + t3 + t4 + t5) / nn AS abar",
        "t1 * t1 / n1 + t2 * t2 / n2 + t3 * t3 / n3 + t4 * t4 / n4 + t5 * t5 / n5 AS tsq",
        "sa2")
      .selectExpr("nn AS n", "5 AS k",
        """round((tsq - CAST(nn AS DOUBLE) * abar * abar)
          |/ ((sa2 - CAST(nn AS DOUBLE) * abar * abar) / (nn - 1)), 6) AS t_conover""".stripMargin)
  }
  val statConoverSquaredRanksSql: String =
    """WITH base AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv
      |  FROM orders),
      |gm AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS sg
      |  FROM base GROUP BY 1),
      |devs AS (
      |  SELECT b.grp,
      |    CAST(floor(abs(CAST(b.cv AS DOUBLE) - CAST(m.sg AS DOUBLE) / m.ng) + 0.5) AS BIGINT) AS u
      |  FROM base b JOIN gm m ON m.grp = b.grp),
      |pv AS (
      |  SELECT u,
      |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
      |    CAST(sum(CASE WHEN grp = 3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
      |    CAST(sum(CASE WHEN grp = 4 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
      |    CAST(sum(CASE WHEN grp = 5 THEN 1 ELSE 0 END) AS BIGINT) AS m5
      |  FROM devs GROUP BY 1),
      |blocks AS (
      |  SELECT u, m1, m2, m3, m4, m5, m1 + m2 + m3 + m4 + m5 AS g,
      |    COALESCE(sum(m1 + m2 + m3 + m4 + m5) OVER (ORDER BY u
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(sum(g) AS BIGINT) AS nn,
      |    CAST(sum(m1) AS BIGINT) AS n1, CAST(sum(m2) AS BIGINT) AS n2,
      |    CAST(sum(m3) AS BIGINT) AS n3, CAST(sum(m4) AS BIGINT) AS n4,
      |    CAST(sum(m5) AS BIGINT) AS n5,
      |    CAST(sum(CAST(m1 AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))) AS DECIMAL(38,0)) AS t1x4,
      |    CAST(sum(CAST(m2 AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))) AS DECIMAL(38,0)) AS t2x4,
      |    CAST(sum(CAST(m3 AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))) AS DECIMAL(38,0)) AS t3x4,
      |    CAST(sum(CAST(m4 AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))) AS DECIMAL(38,0)) AS t4x4,
      |    CAST(sum(CAST(m5 AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1))) AS DECIMAL(38,0)) AS t5x4,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * (CAST(2*c + g + 1 AS DECIMAL(38,0)) * (2*c + g + 1) * (2*c + g + 1) * (2*c + g + 1))) AS DECIMAL(38,0)) AS sa2x16
      |  FROM blocks),
      |m0 AS (
      |  SELECT nn, n1, n2, n3, n4, n5,
      |    CAST(t1x4 AS DOUBLE) / 4 AS t1, CAST(t2x4 AS DOUBLE) / 4 AS t2,
      |    CAST(t3x4 AS DOUBLE) / 4 AS t3, CAST(t4x4 AS DOUBLE) / 4 AS t4,
      |    CAST(t5x4 AS DOUBLE) / 4 AS t5, CAST(sa2x16 AS DOUBLE) / 16 AS sa2
      |  FROM agg),
      |m1_ AS (
      |  SELECT nn, (t1 + t2 + t3 + t4 + t5) / nn AS abar,
      |    t1 * t1 / n1 + t2 * t2 / n2 + t3 * t3 / n3 + t4 * t4 / n4 + t5 * t5 / n5 AS tsq,
      |    sa2
      |  FROM m0)
      |SELECT nn AS n, 5 AS k,
      |  round((tsq - CAST(nn AS DOUBLE) * abar * abar)
      |    / ((sa2 - CAST(nn AS DOUBLE) * abar * abar) / (nn - 1)), 6) AS t_conover
      |FROM m1_""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cuzick_trend" -> (statCuzickTrend _),
    "stat_kw_effect_size" -> (statKwEffectSize _),
    "stat_brunner_munzel" -> (statBrunnerMunzel _),
    "stat_conover_squared_ranks" -> (statConoverSquaredRanks _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cuzick_trend" -> statCuzickTrendSql,
    "stat_kw_effect_size" -> statKwEffectSizeSql,
    "stat_brunner_munzel" -> statBrunnerMunzelSql,
    "stat_conover_squared_ranks" -> statConoverSquaredRanksSql,
  )
}
