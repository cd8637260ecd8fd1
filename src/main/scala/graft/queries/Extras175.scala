package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 75 (C704–C707): the two-sample scale/location-scale rank
  * battery — Ansari–Bradley, Cucconi, Lepage — plus the classic
  * variance-homogeneity screens (Hartley F_max + Cochran's C).
  *
  * Shared discipline: rank statistics are computed from the VALUE
  * HISTOGRAM (one groupBy over the corpus, then the two-pass
  * range-partitioned GlobalRank exclusive prefix sum — never a global
  * row_number over raw rows), midranks/midscores stay exact rationals
  * (doubled/quadrupled integers or the floor(x·1e6+0.5) quantize-
  * before-sum idiom), and every final statistic is a handful of
  * closed-form divisions over one aggregated row. All four rows are
  * O(distinct values) after the first scan — 100 TB-shaped.
  */
object Extras175 {

  /** Pooled en/de doc-length histogram with group-1 (en) counts,
    * exclusive prefix counts, and pooled totals — the shared frame of
    * the three rank tests.
    */
  private def blockFrame(s: SparkSession, d: String): DataFrame = {
    val pv = documents(s, d).filter(col("lang").isin("en", "de"))
      .groupBy(col("n_chars").as("v"))
      .agg(sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("m"),
        count(lit(1)).cast("long").as("g"))
    val withC = graft.plans.GlobalRank.withExclusivePrefixSum(
      pv, "c", col("g"), Seq(col("v").asc))
    val tot = pv.agg(sum(col("g")).cast("long").as("nn"),
      sum(col("m")).cast("long").as("n1"))
    withC.crossJoin(broadcast(tot))
  }
  private val blockFrameSql: String =
    """pv AS (
      |  SELECT n_chars AS v,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS m,
      |    CAST(count(*) AS BIGINT) AS g
      |  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
      |blocks AS (
      |  SELECT v, m, g,
      |    COALESCE(sum(g) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM pv),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn, CAST(sum(m) AS BIGINT) AS n1 FROM pv),
      |bf AS (SELECT * FROM blocks, tot)""".stripMargin

  /** Ansari–Bradley mid-score sum for a tie block occupying pooled
    * ranks (c, c+g]: scores a(r) = min(r, N+1−r) rise to the centre
    * rank s = (N+1) div 2 then fall; both partial sums are exact
    * triangular-number differences (x(x+1) div 2 — consecutive
    * products, so the halving is exact integer arithmetic).
    */
  private val blockSumExpr: String =
    """(CASE WHEN least(c + g, (nn + 1) div 2) > c
      |  THEN (least(c + g, (nn + 1) div 2) * (least(c + g, (nn + 1) div 2) + 1)
      |        - c * (c + 1)) div 2 ELSE 0L END)
      |+ (CASE WHEN c + g >= greatest(c + 1, (nn + 1) div 2 + 1)
      |  THEN (nn + 1) * (c + g - greatest(c + 1, (nn + 1) div 2 + 1) + 1)
      |       - ((c + g) * (c + g + 1)
      |          - (greatest(c + 1, (nn + 1) div 2 + 1) - 1)
      |            * greatest(c + 1, (nn + 1) div 2 + 1)) div 2
      |  ELSE 0L END)""".stripMargin
  private val blockSumSqlD: String = blockSumExpr.replace(" div ", " // ").replace("0L", "0")

  /** C704 stat_ansari_bradley — the two-sample SCALE rank test
    * (en vs de doc lengths): T = Σ group-1 mid-scores with the exact
    * tied-block score sums above; tie-corrected null moments
    * (Hollander–Wolfe, separate even/odd-N forms, verified to reduce
    * to the no-tie variances); z in final doubles. A |z| ≫ 0 says the
    * two languages' length DISPERSIONS differ even if medians agree.
    */
  def statAnsariBradley(s: SparkSession, d: String): DataFrame = {
    blockFrame(s, d)
      .withColumn("bs", expr(blockSumExpr))
      .agg(max(col("nn")).as("nn"), max(col("n1")).as("n1"),
        sum(expr("CAST(floor(m * bs / g * 1e6 + 0.5) AS BIGINT)"))
          .cast("decimal(38,0)").as("tq"),
        sum(expr("CAST(floor(bs * bs / g * 1e6 + 0.5) AS BIGINT)"))
          .cast("decimal(38,0)").as("ga2q"))
      .selectExpr("nn", "n1", "nn - n1 AS n2",
        "CAST(tq AS DOUBLE) / 1e6 AS t",
        "CAST(ga2q AS DOUBLE) / 1e6 AS ga2")
      .selectExpr("nn", "n1", "n2", "round(t, 4) AS t_ab",
        """round(CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
          |  ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END, 4) AS e_t""".stripMargin,
        """round((t - (CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
          |  ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END))
          |/ sqrt(CASE WHEN nn % 2 = 0
          |  THEN CAST(n1 AS DOUBLE) * (nn - n1) * (16 * ga2 - CAST(nn AS DOUBLE) * (nn + 2) * (nn + 2))
          |       / (16.0 * nn * (nn - 1))
          |  ELSE CAST(n1 AS DOUBLE) * (nn - n1)
          |       * (16.0 * nn * ga2 - CAST(nn + 1 AS DOUBLE) * (nn + 1) * (nn + 1) * (nn + 1))
          |       / (16.0 * nn * nn * (nn - 1)) END), 6) AS z""".stripMargin)
  }
  val statAnsariBradleySql: String =
    s"""WITH $blockFrameSql,
      |ab AS (SELECT bf.*, $blockSumSqlD AS bs FROM bf),
      |agg AS (
      |  SELECT max(nn) AS nn, max(n1) AS n1,
      |    CAST(sum(CAST(floor(m * bs / g * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS tq,
      |    CAST(sum(CAST(floor(bs * bs / g * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS ga2q
      |  FROM ab),
      |m0 AS (SELECT nn, n1, nn - n1 AS n2,
      |    CAST(tq AS DOUBLE) / 1e6 AS t, CAST(ga2q AS DOUBLE) / 1e6 AS ga2 FROM agg)
      |SELECT nn, n1, n2, round(t, 4) AS t_ab,
      |  round(CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
      |    ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END, 4) AS e_t,
      |  round((t - (CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
      |    ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END))
      |  / sqrt(CASE WHEN nn % 2 = 0
      |    THEN CAST(n1 AS DOUBLE) * (nn - n1) * (16 * ga2 - CAST(nn AS DOUBLE) * (nn + 2) * (nn + 2))
      |         / (16.0 * nn * (nn - 1))
      |    ELSE CAST(n1 AS DOUBLE) * (nn - n1)
      |         * (16.0 * nn * ga2 - CAST(nn + 1 AS DOUBLE) * (nn + 1) * (nn + 1) * (nn + 1))
      |         / (16.0 * nn * nn * (nn - 1)) END), 6) AS z
      |FROM m0""".stripMargin

  /** C705 stat_cucconi — the LOCATION-SCALE test in one statistic:
    * U from squared midranks, V from squared contrary midranks (both
    * exact: Σ m·(2c+g+1)²/4 with the quartering deferred to the end),
    * their null correlation ρ a closed form in N, and
    * C = (U² + V² − 2ρUV)/(2(1−ρ²)). Detects shifts in mean AND
    * variance simultaneously — the screen run before choosing a
    * location-only or scale-only follow-up.
    */
  def statCucconi(s: SparkSession, d: String): DataFrame = {
    blockFrame(s, d)
      .agg(max(col("nn")).as("nn"), max(col("n1")).as("n1"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * (2 * c + g + 1) * (2 * c + g + 1)"))
          .cast("decimal(38,0)").as("r2x4"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * (2 * (nn - c - g) + g + 1) * (2 * (nn - c - g) + g + 1)"))
          .cast("decimal(38,0)").as("s2x4"))
      .selectExpr("nn", "n1", "nn - n1 AS n2",
        "CAST(r2x4 AS DOUBLE) / 4 AS r2", "CAST(s2x4 AS DOUBLE) / 4 AS s2")
      .selectExpr("nn", "n1", "n2",
        """(6 * r2 - CAST(n1 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
          |/ sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5) AS u""".stripMargin,
        """(6 * s2 - CAST(n1 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
          |/ sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5) AS v""".stripMargin,
        """2.0 * (CAST(nn AS DOUBLE) * nn - 4)
          |/ ((2.0 * nn + 1) * (8 * nn + 11)) - 1 AS rho""".stripMargin)
      .selectExpr("nn", "n1", "n2",
        "round(u, 6) AS u", "round(v, 6) AS v", "round(rho, 6) AS rho",
        "round((u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho)), 6) AS c_stat")
  }
  val statCucconiSql: String =
    s"""WITH $blockFrameSql,
      |agg AS (
      |  SELECT max(nn) AS nn, max(n1) AS n1,
      |    CAST(sum(CAST(m AS DECIMAL(38,0)) * (2 * c + g + 1) * (2 * c + g + 1)) AS DECIMAL(38,0)) AS r2x4,
      |    CAST(sum(CAST(m AS DECIMAL(38,0)) * (2 * (nn - c - g) + g + 1) * (2 * (nn - c - g) + g + 1)) AS DECIMAL(38,0)) AS s2x4
      |  FROM bf),
      |m0 AS (SELECT nn, n1, nn - n1 AS n2,
      |    CAST(r2x4 AS DOUBLE) / 4 AS r2, CAST(s2x4 AS DOUBLE) / 4 AS s2 FROM agg),
      |m1 AS (SELECT nn, n1, n2,
      |    (6 * r2 - CAST(n1 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
      |      / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5) AS u,
      |    (6 * s2 - CAST(n1 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
      |      / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5) AS v,
      |    2.0 * (CAST(nn AS DOUBLE) * nn - 4) / ((2.0 * nn + 1) * (8 * nn + 11)) - 1 AS rho
      |  FROM m0)
      |SELECT nn, n1, n2, round(u, 6) AS u, round(v, 6) AS v, round(rho, 6) AS rho,
      |  round((u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho)), 6) AS c_stat
      |FROM m1""".stripMargin

  /** C706 stat_lepage — location + scale combined: D = W² + A² where
    * W is the tie-corrected standardized Wilcoxon rank-sum (midrank
    * sum Σ m(2c+g+1)/2 exact; variance with the Σ(g³−g) tie term) and
    * A the standardized Ansari–Bradley from C704's machinery — both
    * from the SAME one-pass block frame. D ~ χ²(2) under H₀.
    */
  def statLepage(s: SparkSession, d: String): DataFrame = {
    blockFrame(s, d)
      .withColumn("bs", expr(blockSumExpr))
      .agg(max(col("nn")).as("nn"), max(col("n1")).as("n1"),
        sum(expr("m * (2 * c + g + 1)")).cast("decimal(38,0)").as("twx2"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g * g - g")).cast("decimal(38,0)").as("ties"),
        sum(expr("CAST(floor(m * bs / g * 1e6 + 0.5) AS BIGINT)"))
          .cast("decimal(38,0)").as("tq"),
        sum(expr("CAST(floor(bs * bs / g * 1e6 + 0.5) AS BIGINT)"))
          .cast("decimal(38,0)").as("ga2q"))
      .selectExpr("nn", "n1", "nn - n1 AS n2",
        "CAST(twx2 AS DOUBLE) / 2 AS tw", "CAST(ties AS DOUBLE) AS ties",
        "CAST(tq AS DOUBLE) / 1e6 AS t", "CAST(ga2q AS DOUBLE) / 1e6 AS ga2")
      .selectExpr("nn", "n1", "n2",
        """(tw - CAST(n1 AS DOUBLE) * (nn + 1) / 2)
          |/ sqrt(CAST(n1 AS DOUBLE) * n2 / 12
          |  * ((nn + 1) - ties / (CAST(nn AS DOUBLE) * (nn - 1)))) AS w""".stripMargin,
        """(t - (CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
          |  ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END))
          |/ sqrt(CASE WHEN nn % 2 = 0
          |  THEN CAST(n1 AS DOUBLE) * n2 * (16 * ga2 - CAST(nn AS DOUBLE) * (nn + 2) * (nn + 2))
          |       / (16.0 * nn * (nn - 1))
          |  ELSE CAST(n1 AS DOUBLE) * n2
          |       * (16.0 * nn * ga2 - CAST(nn + 1 AS DOUBLE) * (nn + 1) * (nn + 1) * (nn + 1))
          |       / (16.0 * nn * nn * (nn - 1)) END) AS a""".stripMargin)
      .selectExpr("nn", "n1", "n2",
        "round(w, 6) AS w_wilcoxon", "round(a, 6) AS a_ansari",
        "round(w * w + a * a, 6) AS d_lepage")
  }
  val statLepageSql: String =
    s"""WITH $blockFrameSql,
      |ab AS (SELECT bf.*, $blockSumSqlD AS bs FROM bf),
      |agg AS (
      |  SELECT max(nn) AS nn, max(n1) AS n1,
      |    CAST(sum(m * (2 * c + g + 1)) AS DECIMAL(38,0)) AS twx2,
      |    CAST(sum(CAST(g AS DECIMAL(38,0)) * g * g - g) AS DECIMAL(38,0)) AS ties,
      |    CAST(sum(CAST(floor(m * bs / g * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS tq,
      |    CAST(sum(CAST(floor(bs * bs / g * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS ga2q
      |  FROM ab),
      |m0 AS (SELECT nn, n1, nn - n1 AS n2,
      |    CAST(twx2 AS DOUBLE) / 2 AS tw, CAST(ties AS DOUBLE) AS ties,
      |    CAST(tq AS DOUBLE) / 1e6 AS t, CAST(ga2q AS DOUBLE) / 1e6 AS ga2 FROM agg),
      |m1 AS (SELECT nn, n1, n2,
      |    (tw - CAST(n1 AS DOUBLE) * (nn + 1) / 2)
      |      / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
      |        * ((nn + 1) - ties / (CAST(nn AS DOUBLE) * (nn - 1)))) AS w,
      |    (t - (CASE WHEN nn % 2 = 0 THEN CAST(n1 AS DOUBLE) * (nn + 2) / 4
      |      ELSE CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END))
      |    / sqrt(CASE WHEN nn % 2 = 0
      |      THEN CAST(n1 AS DOUBLE) * n2 * (16 * ga2 - CAST(nn AS DOUBLE) * (nn + 2) * (nn + 2))
      |           / (16.0 * nn * (nn - 1))
      |      ELSE CAST(n1 AS DOUBLE) * n2
      |           * (16.0 * nn * ga2 - CAST(nn + 1 AS DOUBLE) * (nn + 1) * (nn + 1) * (nn + 1))
      |           / (16.0 * nn * nn * (nn - 1)) END) AS a
      |  FROM m0)
      |SELECT nn, n1, n2, round(w, 6) AS w_wilcoxon, round(a, 6) AS a_ansari,
      |  round(w * w + a * a, 6) AS d_lepage
      |FROM m1""".stripMargin

  /** C707 stat_hartley_cochran — the variance-homogeneity SCREENS run
    * before a pooled ANOVA: per-priority-group variances as EXACT
    * cent-quantized moment sums (n·Σx² − (Σx)² over DECIMAL), then
    * Hartley's F_max = s²max/s²min and Cochran's C = s²max/Σs² as
    * final double ratios. Complements the formal Bartlett /
    * Brown–Forsythe rows: these are the cheap lookup-table screens.
    */
  def statHartleyCochran(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
      .selectExpr("grp", "n",
        """CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * (n - 1)) / 1e4 AS s2""".stripMargin)
      .agg(count(lit(1)).cast("long").as("k"),
        min(col("n")).cast("long").as("min_n"),
        max(col("n")).cast("long").as("max_n"),
        max(col("s2")).as("s2max"), min(col("s2")).as("s2min"),
        sum(expr("CAST(floor(s2 * 100 + 0.5) AS DECIMAL(38,0))")).as("s2sumq"))
      .selectExpr("k", "min_n", "max_n",
        "round(s2max / s2min, 6) AS hartley_fmax",
        "round(s2max / (CAST(s2sumq AS DOUBLE) / 100), 6) AS cochran_c")
  }
  val statHartleyCochranSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS qc
      |  FROM orders GROUP BY 1),
      |v AS (
      |  SELECT grp, n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (n - 1)) / 1e4 AS s2
      |  FROM g)
      |SELECT CAST(count(*) AS BIGINT) AS k,
      |  CAST(min(n) AS BIGINT) AS min_n, CAST(max(n) AS BIGINT) AS max_n,
      |  round(max(s2) / min(s2), 6) AS hartley_fmax,
      |  round(max(s2) / (CAST(CAST(sum(CAST(floor(s2 * 100 + 0.5) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) / 100), 6) AS cochran_c
      |FROM v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ansari_bradley" -> (statAnsariBradley _),
    "stat_cucconi" -> (statCucconi _),
    "stat_lepage" -> (statLepage _),
    "stat_hartley_cochran" -> (statHartleyCochran _),
  )

  val oracle: Map[String, String] = Map(
    "stat_ansari_bradley" -> statAnsariBradleySql,
    "stat_cucconi" -> statCucconiSql,
    "stat_lepage" -> statLepageSql,
    "stat_hartley_cochran" -> statHartleyCochranSql,
  )
}
