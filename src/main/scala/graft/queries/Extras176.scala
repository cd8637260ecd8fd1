package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 76 (C708–C711): autocorrelation geometry on the daily-revenue
  * series — Moran's I and Geary's C on the lag-1 adjacency graph (the
  * time-series instance of the spatial-autocorrelation pair), the
  * Cox–Stuart trend sign test, and the turning-points randomness test.
  *
  * Shared discipline: ONE corpus scan builds the exact cent-quantized
  * day frame (bounded by the calendar, so every window below sits
  * above an aggregate — the plan-gate-recognized bounded shape);
  * centred cross-products stay exact by cross-multiplying with n
  * (Σ(c·n−S)·(c'·n−S) over DECIMAL) instead of subtracting a double
  * mean; the graph moments S0/S1/S2 of the path graph are closed
  * forms in n.
  */
object Extras176 {

  /** Exact daily revenue cents with a dense day index. */
  private def dayFrame(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    bars.withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
  }
  private val dayFrameSql: String =
    """bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |df AS (
      |  SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars)""".stripMargin

  /** C708 stat_morans_i — Moran's I on the lag-1 path graph: does
    * today's revenue co-move with yesterday's? Numerator
    * 2Σ z_t z_{t+1} exact via (c·n−S) cross-multiplication; path-graph
    * moments S0 = 2(n−1), S1 = 4(n−1), S2 = 16n−24; z-score under the
    * normality null with E[I] = −1/(n−1).
    */
  def statMoransI(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("rn")
    f.withColumn("cnext", lead(col("c"), 1).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(expr("(c * n - sc) * (c * n - sc)")).cast("decimal(38,0)").as("z2"),
        sum(expr("CASE WHEN cnext IS NOT NULL THEN (c * n - sc) * (cnext * n - sc) ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("zz"))
      .selectExpr("n",
        """round(CAST(n AS DOUBLE) / (2.0 * (n - 1))
          |  * (2 * CAST(zz AS DOUBLE)) / CAST(z2 AS DOUBLE), 6) AS morans_i""".stripMargin,
        "round(CAST(-1 AS DOUBLE) / (n - 1), 6) AS e_i",
        """round((CAST(n AS DOUBLE) / (2.0 * (n - 1)) * (2 * CAST(zz AS DOUBLE)) / CAST(z2 AS DOUBLE)
          |  - (-1.0 / (n - 1)))
          |/ sqrt((CAST(n AS DOUBLE) * n * (4.0 * (n - 1)) - CAST(n AS DOUBLE) * (16.0 * n - 24)
          |        + 3.0 * (2.0 * (n - 1)) * (2 * (n - 1)))
          |       / ((CAST(n AS DOUBLE) * n - 1) * (2.0 * (n - 1)) * (2 * (n - 1)))
          |       - 1.0 / (CAST(n AS DOUBLE) - 1) / (n - 1)), 6) AS z""".stripMargin)
  }
  val statMoransISql: String =
    s"""WITH $dayFrameSql,
      |lagd AS (
      |  SELECT c, lead(c, 1) OVER (ORDER BY rn) AS cnext FROM df),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(c) AS DECIMAL(38,0)) AS sc FROM df),
      |agg AS (
      |  SELECT max(n) AS n,
      |    CAST(sum((c * n - sc) * (c * n - sc)) AS DECIMAL(38,0)) AS z2,
      |    CAST(sum(CASE WHEN cnext IS NOT NULL THEN (c * n - sc) * (cnext * n - sc) ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS zz
      |  FROM lagd, tot)
      |SELECT n,
      |  round(CAST(n AS DOUBLE) / (2.0 * (n - 1)) * (2 * CAST(zz AS DOUBLE)) / CAST(z2 AS DOUBLE), 6) AS morans_i,
      |  round(CAST(-1 AS DOUBLE) / (n - 1), 6) AS e_i,
      |  round((CAST(n AS DOUBLE) / (2.0 * (n - 1)) * (2 * CAST(zz AS DOUBLE)) / CAST(z2 AS DOUBLE)
      |    - (-1.0 / (n - 1)))
      |  / sqrt((CAST(n AS DOUBLE) * n * (4.0 * (n - 1)) - CAST(n AS DOUBLE) * (16.0 * n - 24)
      |          + 3.0 * (2.0 * (n - 1)) * (2 * (n - 1)))
      |         / ((CAST(n AS DOUBLE) * n - 1) * (2.0 * (n - 1)) * (2 * (n - 1)))
      |         - 1.0 / (CAST(n AS DOUBLE) - 1) / (n - 1)), 6) AS z
      |FROM agg""".stripMargin

  /** C709 stat_gearys_c — Geary's C on the same lag-1 graph: the
    * DIFFERENCE-based complement to Moran's product form (sensitive to
    * local jumps where I is sensitive to global co-movement).
    * Numerator 2Σ(c_t−c_{t+1})² needs no mean — raw cents exact;
    * variance under normality via the same S0/S1/S2 closed forms,
    * E[C] = 1.
    */
  def statGearysC(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("rn")
    f.withColumn("cnext", lead(col("c"), 1).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(expr("(c * n - sc) * (c * n - sc)")).cast("decimal(38,0)").as("z2"),
        sum(expr("CASE WHEN cnext IS NOT NULL THEN (c - cnext) * (c - cnext) ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("d2"))
      .selectExpr("n",
        """round((CAST(n AS DOUBLE) - 1) / (2.0 * (2 * (n - 1)))
          |  * (2 * CAST(d2 AS DOUBLE) * n * n) / CAST(z2 AS DOUBLE), 6) AS gearys_c""".stripMargin,
        """round(((CAST(n AS DOUBLE) - 1)
          |  * (2 * (4.0 * (n - 1)) + (16.0 * n - 24)) - 4.0 * (2.0 * (n - 1)) * (2 * (n - 1)))
          |  / (2.0 * (n + 1) * (2.0 * (n - 1)) * (2 * (n - 1))), 8) AS var_c""".stripMargin)
      .selectExpr("n", "gearys_c", "var_c",
        "round((gearys_c - 1) / sqrt(var_c), 6) AS z")
  }
  val statGearysCSql: String =
    s"""WITH $dayFrameSql,
      |lagd AS (
      |  SELECT c, lead(c, 1) OVER (ORDER BY rn) AS cnext FROM df),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(c) AS DECIMAL(38,0)) AS sc FROM df),
      |agg AS (
      |  SELECT max(n) AS n,
      |    CAST(sum((c * n - sc) * (c * n - sc)) AS DECIMAL(38,0)) AS z2,
      |    CAST(sum(CASE WHEN cnext IS NOT NULL THEN (c - cnext) * (c - cnext) ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS d2
      |  FROM lagd, tot),
      |m AS (
      |  SELECT n,
      |    round((CAST(n AS DOUBLE) - 1) / (2.0 * (2 * (n - 1)))
      |      * (2 * CAST(d2 AS DOUBLE) * n * n) / CAST(z2 AS DOUBLE), 6) AS gearys_c,
      |    round(((CAST(n AS DOUBLE) - 1)
      |      * (2 * (4.0 * (n - 1)) + (16.0 * n - 24)) - 4.0 * (2.0 * (n - 1)) * (2 * (n - 1)))
      |      / (2.0 * (n + 1) * (2.0 * (n - 1)) * (2 * (n - 1))), 8) AS var_c
      |  FROM agg)
      |SELECT n, gearys_c, var_c,
      |  round((gearys_c - 1) / sqrt(var_c), 6) AS z
      |FROM m""".stripMargin

  /** C710 stat_cox_stuart — the distribution-free TREND sign test:
    * pair day t with day t + n div 2 (middle day dropped when n is
    * odd), count strict increases among non-tied pairs, z with
    * continuity correction against Binomial(k, ½). The nonparametric
    * cousin of the Mann–Kendall row — O(n) pairs instead of O(n²)
    * concordances, via one rn-shifted equi-join on the bounded frame.
    */
  def statCoxStuart(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val tot = f.agg(count(lit(1)).cast("long").as("n"))
    val lhs = f.crossJoin(broadcast(tot)).filter(expr("rn <= n div 2"))
      .selectExpr("rn", "c AS c1", "n")
    val rhs = f.selectExpr("rn AS rn2", "c AS c2")
    lhs.join(rhs, expr("rn2 = rn + (n - n % 2) div 2 + n % 2"))
      .agg(max(col("n")).as("n"),
        sum(expr("CASE WHEN c2 > c1 THEN 1L ELSE 0L END")).cast("long").as("s_plus"),
        sum(expr("CASE WHEN c2 <> c1 THEN 1L ELSE 0L END")).cast("long").as("k"))
      .selectExpr("n", "k", "s_plus",
        """round(CASE WHEN s_plus * 2 = k THEN 0.0
          |  ELSE (abs(CAST(s_plus AS DOUBLE) - CAST(k AS DOUBLE) / 2) - 0.5)
          |       / sqrt(CAST(k AS DOUBLE) / 4)
          |       * (CASE WHEN 2 * s_plus > k THEN 1 ELSE -1 END) END, 6) AS z""".stripMargin)
  }
  val statCoxStuartSql: String =
    s"""WITH $dayFrameSql,
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM df),
      |pairs AS (
      |  SELECT a.c AS c1, b.c AS c2, t.n
      |  FROM df a, tot t, df b
      |  WHERE a.rn <= t.n // 2
      |    AND b.rn = a.rn + (t.n - t.n % 2) // 2 + t.n % 2),
      |agg AS (
      |  SELECT max(n) AS n,
      |    CAST(sum(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
      |    CAST(sum(CASE WHEN c2 <> c1 THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM pairs)
      |SELECT n, k, s_plus,
      |  round(CASE WHEN s_plus * 2 = k THEN 0.0
      |    ELSE (abs(CAST(s_plus AS DOUBLE) - CAST(k AS DOUBLE) / 2) - 0.5)
      |         / sqrt(CAST(k AS DOUBLE) / 4)
      |         * (CASE WHEN 2 * s_plus > k THEN 1 ELSE -1 END) END, 6) AS z
      |FROM agg""".stripMargin

  /** C711 time_turning_points — the turning-points randomness test:
    * count strict local extrema ((x_t−x_{t−1})(x_{t+1}−x_t) < 0) on
    * the day series; under i.i.d. E = 2(n−2)/3, Var = (16n−29)/90.
    * Too FEW turning points ⇒ trend/persistence; too MANY ⇒
    * oscillation — the one-scan screen before autocorrelation work.
    */
  def timeTurningPoints(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    val w = Window.orderBy("rn")
    f.withColumn("cprev", lag(col("c"), 1).over(w))
      .withColumn("cnext", lead(col("c"), 1).over(w))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr(
          """CASE WHEN cprev IS NOT NULL AND cnext IS NOT NULL
            |  AND ((c > cprev AND c > cnext) OR (c < cprev AND c < cnext))
            |THEN 1L ELSE 0L END""".stripMargin)).cast("long").as("tp"))
      .selectExpr("n", "tp",
        "round(CAST(2 AS DOUBLE) * (n - 2) / 3, 4) AS e_tp",
        """round((tp - 2.0 * (n - 2) / 3)
          |/ sqrt((16.0 * n - 29) / 90), 6) AS z""".stripMargin)
  }
  val timeTurningPointsSql: String =
    s"""WITH $dayFrameSql,
      |lagd AS (
      |  SELECT c, lag(c, 1) OVER (ORDER BY rn) AS cprev,
      |    lead(c, 1) OVER (ORDER BY rn) AS cnext
      |  FROM df)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN cprev IS NOT NULL AND cnext IS NOT NULL
      |    AND ((c > cprev AND c > cnext) OR (c < cprev AND c < cnext))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |  round(CAST(2 AS DOUBLE) * (count(*) - 2) / 3, 4) AS e_tp,
      |  round((CAST(sum(CASE WHEN cprev IS NOT NULL AND cnext IS NOT NULL
      |    AND ((c > cprev AND c > cnext) OR (c < cprev AND c < cnext))
      |    THEN 1 ELSE 0 END) AS BIGINT) - 2.0 * (count(*) - 2) / 3)
      |  / sqrt((16.0 * count(*) - 29) / 90), 6) AS z
      |FROM lagd""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_morans_i" -> (statMoransI _),
    "stat_gearys_c" -> (statGearysC _),
    "stat_cox_stuart" -> (statCoxStuart _),
    "time_turning_points" -> (timeTurningPoints _),
  )

  val oracle: Map[String, String] = Map(
    "stat_morans_i" -> statMoransISql,
    "stat_gearys_c" -> statGearysCSql,
    "stat_cox_stuart" -> statCoxStuartSql,
    "time_turning_points" -> timeTurningPointsSql,
  )
}
