package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 83 (C736–C739): the ordinal-association battery on one shared
  * 5×5 contingency table — order priority (ordinal by its leading
  * digit) × fixed price band — Goodman–Kruskal γ, Somers' D_{y|x},
  * Stuart's τ_c, and Goodman–Kruskal λ.
  *
  * Shared discipline: ONE corpus scan builds the ≤25-cell table;
  * concordant/discordant pair counts come from the cell×cell
  * inequality join where the broadcast side carries an explicit
  * LIMIT 100 (the 25-cell bound made visible to the plan gate — the
  * BNLJ's build side is provably bounded); every pair count is exact
  * integer algebra (n_a·n_b products, C(n,2) tie terms in DECIMAL).
  */
object Extras183 {

  /** The shared table: priority level 1–5 × price band 1–5. */
  private def cells(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("x"),
        expr(
          """CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
            |WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
            |ELSE 5 END""".stripMargin).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast("long").as("m"))
  private val cellsSql: String =
    """cells AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS x,
      |    CASE WHEN o_totalprice < 60000 THEN 1 WHEN o_totalprice < 120000 THEN 2
      |      WHEN o_totalprice < 180000 THEN 3 WHEN o_totalprice < 240000 THEN 4
      |      ELSE 5 END AS y,
      |    CAST(count(*) AS BIGINT) AS m
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  /** Concordant/discordant totals + tie terms, one aggregated row. */
  private def pairFrame(s: SparkSession, d: String): DataFrame = {
    val c = cells(s, d)
    val cd = c.as("a")
      .join(broadcast(c.limit(100).as("b")), // 25 cells by construction; LIMIT = the gate-visible bound
        expr("b.x > a.x AND b.y <> a.y"))
      .agg(
        sum(expr("CASE WHEN b.y > a.y THEN CAST(a.m AS DECIMAL(38,0)) * b.m ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("cc"),
        sum(expr("CASE WHEN b.y < a.y THEN CAST(a.m AS DECIMAL(38,0)) * b.m ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("dd"))
    val ties = c.agg(count(lit(1)).cast("long").as("n_cells"),
      sum(col("m")).cast("long").as("n"),
      sum(expr("CAST(m AS DECIMAL(38,0)) * (m - 1)")).cast("decimal(38,0)").as("txy2"))
    val tx = c.groupBy("x").agg(sum(col("m")).cast("long").as("mx"))
      .agg(sum(expr("CAST(mx AS DECIMAL(38,0)) * (mx - 1)")).cast("decimal(38,0)").as("tx2"))
    val ty = c.groupBy("y").agg(sum(col("m")).cast("long").as("my"))
      .agg(sum(expr("CAST(my AS DECIMAL(38,0)) * (my - 1)")).cast("decimal(38,0)").as("ty2"))
    cd.crossJoin(broadcast(ties)).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
  }
  private val pairFrameSql: String =
    """cd AS (
      |  SELECT
      |    CAST(sum(CASE WHEN b.y > a.y THEN CAST(a.m AS DECIMAL(38,0)) * b.m ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS cc,
      |    CAST(sum(CASE WHEN b.y < a.y THEN CAST(a.m AS DECIMAL(38,0)) * b.m ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS dd
      |  FROM cells a JOIN cells b ON b.x > a.x AND b.y <> a.y),
      |ties AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(m) AS BIGINT) AS n,
      |    CAST(sum(CAST(m AS DECIMAL(38,0)) * (m - 1)) AS DECIMAL(38,0)) AS txy2
      |  FROM cells),
      |tx AS (
      |  SELECT CAST(sum(CAST(mx AS DECIMAL(38,0)) * (mx - 1)) AS DECIMAL(38,0)) AS tx2
      |  FROM (SELECT x, CAST(sum(m) AS BIGINT) AS mx FROM cells GROUP BY 1)),
      |ty AS (
      |  SELECT CAST(sum(CAST(my AS DECIMAL(38,0)) * (my - 1)) AS DECIMAL(38,0)) AS ty2
      |  FROM (SELECT y, CAST(sum(m) AS BIGINT) AS my FROM cells GROUP BY 1)),
      |pf AS (SELECT * FROM cd, ties, tx, ty)""".stripMargin

  /** C736 stat_gk_gamma — Goodman–Kruskal γ = (C−D)/(C+D): the
    * ties-ignored ordinal association between priority and price band.
    */
  def statGkGamma(s: SparkSession, d: String): DataFrame =
    pairFrame(s, d).selectExpr("n", "CAST(cc AS DOUBLE) AS c_pairs", "CAST(dd AS DOUBLE) AS d_pairs")
      .selectExpr("n", "c_pairs", "d_pairs",
        "round((c_pairs - d_pairs) / (c_pairs + d_pairs), 6) AS gamma")
  val statGkGammaSql: String =
    s"""WITH $cellsSql,
      |$pairFrameSql
      |SELECT n, CAST(cc AS DOUBLE) AS c_pairs, CAST(dd AS DOUBLE) AS d_pairs,
      |  round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) / (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE)), 6) AS gamma
      |FROM pf""".stripMargin

  /** C737 stat_somers_d — Somers' D_{y|x} = (C−D)/(P − T_x): the
    * asymmetric ordinal association treating price band as the
    * dependent variable (pairs tied on the predictor are excluded
    * from the denominator, unlike γ which drops all ties).
    */
  def statSomersD(s: SparkSession, d: String): DataFrame =
    pairFrame(s, d)
      .selectExpr("n", "CAST(cc AS DOUBLE) AS c_pairs", "CAST(dd AS DOUBLE) AS d_pairs",
        "(CAST(n AS DOUBLE) * (n - 1) - CAST(tx2 AS DOUBLE)) / 2 AS not_tied_x")
      .selectExpr("n", "c_pairs", "d_pairs",
        "round((c_pairs - d_pairs) / not_tied_x, 6) AS somers_dyx")
  val statSomersDSql: String =
    s"""WITH $cellsSql,
      |$pairFrameSql
      |SELECT n, CAST(cc AS DOUBLE) AS c_pairs, CAST(dd AS DOUBLE) AS d_pairs,
      |  round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
      |    / ((CAST(n AS DOUBLE) * (n - 1) - CAST(tx2 AS DOUBLE)) / 2), 6) AS somers_dyx
      |FROM pf""".stripMargin

  /** C738 stat_stuart_tau_c — Stuart's τ_c = 2m(C−D)/(n²(m−1)) with
    * m = min(rows, cols) = 5: the rectangular-table-corrected Kendall
    * coefficient that can actually reach ±1 on a 5×5 table, unlike
    * τ_b under heavy marginal imbalance.
    */
  def statStuartTauC(s: SparkSession, d: String): DataFrame =
    pairFrame(s, d)
      .selectExpr("n", "CAST(cc AS DOUBLE) AS c_pairs", "CAST(dd AS DOUBLE) AS d_pairs")
      .selectExpr("n", "c_pairs", "d_pairs",
        "round(2.0 * 5 * (c_pairs - d_pairs) / (CAST(n AS DOUBLE) * n * 4), 6) AS tau_c")
  val statStuartTauCSql: String =
    s"""WITH $cellsSql,
      |$pairFrameSql
      |SELECT n, CAST(cc AS DOUBLE) AS c_pairs, CAST(dd AS DOUBLE) AS d_pairs,
      |  round(2.0 * 5 * (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) / (CAST(n AS DOUBLE) * n * 4), 6) AS tau_c
      |FROM pf""".stripMargin

  /** C739 stat_gk_lambda — Goodman–Kruskal λ_{y|x}: the
    * proportional-reduction-in-error of guessing the price band given
    * the priority, (Σ_x max_y n_xy − max_y n_+y)/(n − max_y n_+y) —
    * the NOMINAL association complement to the three ordinal rows,
    * from per-row modal cells (exact integer maxima).
    */
  def statGkLambda(s: SparkSession, d: String): DataFrame = {
    val c = cells(s, d)
    val rowMax = c.groupBy("x").agg(max(col("m")).as("mx"))
      .agg(sum(col("mx")).cast("long").as("sum_row_modes"))
    val colTot = c.groupBy("y").agg(sum(col("m")).cast("long").as("my"))
      .agg(max(col("my")).cast("long").as("mode_y"), sum(col("my")).cast("long").as("n"))
    rowMax.crossJoin(broadcast(colTot))
      .selectExpr("n", "sum_row_modes", "mode_y",
        "round(CAST(sum_row_modes - mode_y AS DOUBLE) / (n - mode_y), 6) AS lambda_yx")
  }
  val statGkLambdaSql: String =
    s"""WITH $cellsSql,
      |rowmax AS (
      |  SELECT CAST(sum(mx) AS BIGINT) AS sum_row_modes
      |  FROM (SELECT x, max(m) AS mx FROM cells GROUP BY 1)),
      |coltot AS (
      |  SELECT CAST(max(my) AS BIGINT) AS mode_y, CAST(sum(my) AS BIGINT) AS n
      |  FROM (SELECT y, CAST(sum(m) AS BIGINT) AS my FROM cells GROUP BY 1))
      |SELECT n, sum_row_modes, mode_y,
      |  round(CAST(sum_row_modes - mode_y AS DOUBLE) / (n - mode_y), 6) AS lambda_yx
      |FROM rowmax, coltot""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_gk_gamma" -> (statGkGamma _),
    "stat_somers_d" -> (statSomersD _),
    "stat_stuart_tau_c" -> (statStuartTauC _),
    "stat_gk_lambda" -> (statGkLambda _),
  )

  val oracle: Map[String, String] = Map(
    "stat_gk_gamma" -> statGkGammaSql,
    "stat_somers_d" -> statSomersDSql,
    "stat_stuart_tau_c" -> statStuartTauCSql,
    "stat_gk_lambda" -> statGkLambdaSql,
  )
}
