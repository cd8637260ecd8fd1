package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 132 (C932–C935): the causal-inference battery the library
  * lacked — the binary-instrument Wald IV estimator, sharp regression
  * discontinuity, the 2×2 difference-in-differences, and binary
  * transfer entropy between the daily revenue and order-count series.
  *
  * Shared discipline: every estimator is pure exact-moment algebra
  * (cent/indicator integer sums; complement cells by subtraction);
  * RDD's local-linear fits quantize nothing — both intercepts are
  * rationals of exact integer moments evaluated with identical
  * expression text; transfer entropy's 8 trigram cells are exact
  * integer counts with per-cell ·10¹²-quantized log terms.
  */
object Extras232 {

  /** C932 stat_iv_wald — the Wald instrumental-variable estimator:
    * instrument z = urgent order priority, treatment d = deep discount
    * (≥5%), outcome y = returned; LATE = (ȳ₁−ȳ₀)/(d̄₁−d̄₀) with the
    * first-stage difference and its Welch t (the weak-instrument
    * screen — |t| must clear ~√10 before anyone quotes the LATE).
    * The simplest 2SLS, exact to the last integer.
    */
  def statIvWald(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        Seq("l_orderkey"))
      .select(expr("CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END").as("z"),
        expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("dd"),
        expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END").as("y"))
    val g = base.groupBy("z")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("dd")).cast("long").as("sd"), sum(col("y")).cast("long").as("sy"))
    val a = g.filter(col("z") === 1L).selectExpr("n AS n1", "sd AS sd1", "sy AS sy1")
    val b = g.filter(col("z") === 0L).selectExpr("n AS n0", "sd AS sd0", "sy AS sy0")
    a.crossJoin(broadcast(b))
      .selectExpr("n1", "n0",
        "CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 AS itt",
        "CAST(sd1 AS DOUBLE) / n1 - CAST(sd0 AS DOUBLE) / n0 AS fs",
        """sqrt(CAST(sd1 AS DOUBLE) / n1 * (1 - CAST(sd1 AS DOUBLE) / n1) / n1
          | + CAST(sd0 AS DOUBLE) / n0 * (1 - CAST(sd0 AS DOUBLE) / n0) / n0) AS fsse""".stripMargin)
      .selectExpr("n1 AS n_urgent", "n0 AS n_other",
        "round(itt, 6) AS itt_effect",
        "round(fs, 6) AS first_stage",
        "round(fs / fsse, 4) AS first_stage_t",
        "round(itt / fs, 6) AS wald_late")
  }
  val statIvWaldSql: String =
    """WITH base AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS z,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS dd,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |g AS (
      |  SELECT z, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(dd) AS BIGINT) AS sd, CAST(sum(y) AS BIGINT) AS sy
      |  FROM base GROUP BY 1),
      |ab AS (
      |  SELECT a.n AS n1, b.n AS n0,
      |    CAST(a.sy AS DOUBLE) / a.n - CAST(b.sy AS DOUBLE) / b.n AS itt,
      |    CAST(a.sd AS DOUBLE) / a.n - CAST(b.sd AS DOUBLE) / b.n AS fs,
      |    sqrt(CAST(a.sd AS DOUBLE) / a.n * (1 - CAST(a.sd AS DOUBLE) / a.n) / a.n
      |     + CAST(b.sd AS DOUBLE) / b.n * (1 - CAST(b.sd AS DOUBLE) / b.n) / b.n) AS fsse
      |  FROM g a, g b WHERE a.z = 1 AND b.z = 0)
      |SELECT n1 AS n_urgent, n0 AS n_other,
      |  round(itt, 6) AS itt_effect,
      |  round(fs, 6) AS first_stage,
      |  round(fs / fsse, 4) AS first_stage_t,
      |  round(itt / fs, 6) AS wald_late
      |FROM ab""".stripMargin

  /** C933 stat_regression_discontinuity — sharp RDD at the $150k
    * order-total cutoff (bandwidth $50k): outcome = the order's exact
    * return share ·10⁹, running variable x−c in cents, separate local
    * LINEAR fits on each side from exact integer moments, the causal
    * jump τ = â_R − â_L (intercepts AT the cutoff — a plain mean
    * difference would confound the slope). The design every
    * threshold-triggered policy (free shipping, credit line, review
    * queue) gets evaluated with.
    */
  def statRegressionDiscontinuity(s: SparkSession, d: String): DataFrame = {
    val ord = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).cast("long").as("k"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("r"))
      .select(col("l_orderkey").as("o_orderkey"),
        expr("(r * 1000000000L) div k").as("yq"))
      .join(orders(s, d).select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) - 15000000L").as("x")),
        Seq("o_orderkey"))
      .filter(expr("x >= -5000000L AND x <= 5000000L"))
      .select(expr("CASE WHEN x >= 0 THEN 1L ELSE 0L END").as("side"), col("x"), col("yq"))
    def fit(side: Long, tag: String) = ord.filter(col("side") === side)
      .agg(count(lit(1)).cast("long").as(s"n$tag"),
        sum(col("x")).cast("decimal(38,0)").as(s"sx$tag"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as(s"sxx$tag"),
        sum(col("yq")).cast("decimal(38,0)").as(s"sy$tag"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as(s"sxy$tag"))
    def icept(tag: String) =
      s"""(CAST(sy$tag AS DOUBLE) / n$tag
        | - (CAST(n$tag AS DOUBLE) * CAST(sxy$tag AS DOUBLE) - CAST(sx$tag AS DOUBLE) * CAST(sy$tag AS DOUBLE))
        |   / (CAST(n$tag AS DOUBLE) * CAST(sxx$tag AS DOUBLE) - CAST(sx$tag AS DOUBLE) * CAST(sx$tag AS DOUBLE))
        |   * CAST(sx$tag AS DOUBLE) / n$tag) / 1e9""".stripMargin
    fit(0L, "l").crossJoin(broadcast(fit(1L, "r")))
      .selectExpr("nl AS n_left", "nr AS n_right",
        s"round(${icept("l")}, 6) AS left_at_cutoff",
        s"round(${icept("r")}, 6) AS right_at_cutoff",
        s"round(${icept("r")} - ${icept("l")}, 6) AS rdd_jump")
  }
  val statRegressionDiscontinuitySql: String = {
    def icept(tag: String) =
      s"""(CAST(sy$tag AS DOUBLE) / n$tag
        | - (CAST(n$tag AS DOUBLE) * CAST(sxy$tag AS DOUBLE) - CAST(sx$tag AS DOUBLE) * CAST(sy$tag AS DOUBLE))
        |   / (CAST(n$tag AS DOUBLE) * CAST(sxx$tag AS DOUBLE) - CAST(sx$tag AS DOUBLE) * CAST(sx$tag AS DOUBLE))
        |   * CAST(sx$tag AS DOUBLE) / n$tag) / 1e9"""
    s"""WITH ord AS (
      |  SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side, x, yq FROM (
      |    SELECT li.yq,
      |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) - 15000000 AS x
      |    FROM (
      |      SELECT l_orderkey,
      |        (CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) * 1000000000)
      |          // count(*) AS yq
      |      FROM lineitem GROUP BY 1) li
      |    JOIN orders o ON li.l_orderkey = o.o_orderkey)
      |  WHERE x >= -5000000 AND x <= 5000000),
      |fl AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nl,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sxl,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxxl,
      |    CAST(sum(CAST(yq AS HUGEINT)) AS DECIMAL(38,0)) AS syl,
      |    CAST(sum(CAST(x AS HUGEINT) * yq) AS DECIMAL(38,0)) AS sxyl
      |  FROM ord WHERE side = 0),
      |fr AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nr,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sxr,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxxr,
      |    CAST(sum(CAST(yq AS HUGEINT)) AS DECIMAL(38,0)) AS syr,
      |    CAST(sum(CAST(x AS HUGEINT) * yq) AS DECIMAL(38,0)) AS sxyr
      |  FROM ord WHERE side = 1)
      |SELECT nl AS n_left, nr AS n_right,
      |  round(${icept("l")}, 6) AS left_at_cutoff,
      |  round(${icept("r")}, 6) AS right_at_cutoff,
      |  round(${icept("r")} - ${icept("l")}, 6) AS rdd_jump
      |FROM fl, fr""".stripMargin
  }

  /** C934 stat_diff_in_diff — the 2×2 difference-in-differences on
    * order totals: treated = customers of nations 0–11, post = orders
    * from 1998 on; DiD = (ȳᵀᵖᵒˢᵗ−ȳᵀᵖʳᵉ)−(ȳᶜᵖᵒˢᵗ−ȳᶜᵖʳᵉ) with the
    * four-cell Welch SE. The workhorse quasi-experimental design —
    * and the parallel-trends numbers (both pre means) reported beside
    * the estimate, as they must be.
    */
  def statDiffInDiff(s: SparkSession, d: String): DataFrame = {
    val cells = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .select(expr("CASE WHEN c_nationkey < 12 THEN 1L ELSE 0L END").as("tr"),
        expr("CASE WHEN o_orderdate >= DATE '1998-01-01' THEN 1L ELSE 0L END").as("post"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
      .groupBy("tr", "post")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"))
      .selectExpr("tr", "post", "n", "CAST(s1 AS DOUBLE) / n AS m",
        """(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1)) / n AS vm""".stripMargin)
    val wide = cells.groupBy()
      .agg(max(expr("CASE WHEN tr = 1 AND post = 0 THEN m END")).as("m10"),
        max(expr("CASE WHEN tr = 1 AND post = 1 THEN m END")).as("m11"),
        max(expr("CASE WHEN tr = 0 AND post = 0 THEN m END")).as("m00"),
        max(expr("CASE WHEN tr = 0 AND post = 1 THEN m END")).as("m01"),
        max(expr("CASE WHEN tr = 1 AND post = 0 THEN vm END")).as("v10"),
        max(expr("CASE WHEN tr = 1 AND post = 1 THEN vm END")).as("v11"),
        max(expr("CASE WHEN tr = 0 AND post = 0 THEN vm END")).as("v00"),
        max(expr("CASE WHEN tr = 0 AND post = 1 THEN vm END")).as("v01"),
        sum(col("n")).cast("long").as("n"))
    wide.selectExpr("n AS n_orders",
      "round(m10 / 100, 2) AS treated_pre",
      "round(m00 / 100, 2) AS control_pre",
      "round(((m11 - m10) - (m01 - m00)) / 100, 2) AS did_dollars",
      "round(((m11 - m10) - (m01 - m00)) / sqrt(v11 + v10 + v01 + v00), 4) AS t_stat")
  }
  val statDiffInDiffSql: String =
    """WITH cells AS (
      |  SELECT tr, post, CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS m,
      |    (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS DOUBLE)
      |      - CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE)
      |        * CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) / count(*) AS vm
      |  FROM (
      |    SELECT CASE WHEN c_nationkey < 12 THEN 1 ELSE 0 END AS tr,
      |      CASE WHEN o_orderdate >= DATE '1998-01-01' THEN 1 ELSE 0 END AS post,
      |      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v
      |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |  GROUP BY 1, 2),
      |wide AS (
      |  SELECT
      |    max(CASE WHEN tr = 1 AND post = 0 THEN m END) AS m10,
      |    max(CASE WHEN tr = 1 AND post = 1 THEN m END) AS m11,
      |    max(CASE WHEN tr = 0 AND post = 0 THEN m END) AS m00,
      |    max(CASE WHEN tr = 0 AND post = 1 THEN m END) AS m01,
      |    max(CASE WHEN tr = 1 AND post = 0 THEN vm END) AS v10,
      |    max(CASE WHEN tr = 1 AND post = 1 THEN vm END) AS v11,
      |    max(CASE WHEN tr = 0 AND post = 0 THEN vm END) AS v00,
      |    max(CASE WHEN tr = 0 AND post = 1 THEN vm END) AS v01,
      |    CAST(sum(n) AS BIGINT) AS n
      |  FROM cells)
      |SELECT n AS n_orders,
      |  round(m10 / 100, 2) AS treated_pre,
      |  round(m00 / 100, 2) AS control_pre,
      |  round(((m11 - m10) - (m01 - m00)) / 100, 2) AS did_dollars,
      |  round(((m11 - m10) - (m01 - m00)) / sqrt(v11 + v10 + v01 + v00), 4) AS t_stat
      |FROM wide""".stripMargin

  /** C935 time_transfer_entropy — binary transfer entropy between the
    * daily order-count and daily revenue series: ups xₜ = 1(countₜ >
    * countₜ₋₁), yₜ likewise for revenue; TE(X→Y) = Σ p(yₜ,yₜ₋₁,xₜ₋₁)
    * ln[p(yₜ|yₜ₋₁,xₜ₋₁)/p(yₜ|yₜ₋₁)] from the exact 8-cell trigram
    * histogram (each term ·10¹²-quantized), both directions and the
    * net. The directional, model-free successor to the symmetric
    * cross-correlation — does order FLOW lead revenue or vice versa?
    */
  def timeTransferEntropy(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"),
        count(lit(1)).cast("long").as("c"))
    val w = Window.orderBy("day")
    val ups = days
      .withColumn("vp", lag(col("v"), 1).over(w))
      .withColumn("cp", lag(col("c"), 1).over(w))
      .filter(col("vp").isNotNull)
      .select(col("day"),
        expr("CASE WHEN v > vp THEN 1L ELSE 0L END").as("yu"),
        expr("CASE WHEN c > cp THEN 1L ELSE 0L END").as("xu"))
      .withColumn("ypu", lag(col("yu"), 1).over(w))
      .withColumn("xpu", lag(col("xu"), 1).over(w))
      .filter(col("ypu").isNotNull)
    def te(cur: String, prevSame: String, prevOther: String, alias: String) = {
      val tri = ups.groupBy(col(cur).as("a"), col(prevSame).as("b"), col(prevOther).as("e"))
        .agg(count(lit(1)).cast("long").as("nabe"))
      val wBE = Window.partitionBy("b", "e")
      val wAB = Window.partitionBy("a", "b")
      val wB = Window.partitionBy("b")
      tri
        .withColumn("nbe", sum(col("nabe")).over(wBE).cast("long"))
        .withColumn("nab", sum(col("nabe")).over(wAB).cast("long"))
        .withColumn("nb", sum(col("nabe")).over(wB).cast("long"))
        .withColumn("nn", sum(col("nabe")).over(
          Window.partitionBy(lit(1))).cast("long"))
        .select(expr(
          """CAST(floor(CAST(nabe AS DOUBLE) / nn
            | * ln(CAST(nabe AS DOUBLE) * nb / (CAST(nbe AS DOUBLE) * nab))
            | * 1e12 + 0.5) AS BIGINT)""".stripMargin).as("tq"))
        .agg(sum(col("tq")).cast("long").as(alias))
    }
    te("yu", "ypu", "xpu", "te_xy").crossJoin(broadcast(te("xu", "xpu", "ypu", "te_yx")))
      .crossJoin(broadcast(ups.agg(count(lit(1)).cast("long").as("n_days"))))
      .selectExpr("n_days",
        "round(CAST(te_xy AS DOUBLE) / 1e12, 6) AS te_count_to_rev",
        "round(CAST(te_yx AS DOUBLE) / 1e12, 6) AS te_rev_to_count",
        "round((CAST(te_xy AS DOUBLE) - te_yx) / 1e12, 6) AS net_te",
        """CASE WHEN te_xy > te_yx THEN 'count_leads_revenue'
          |WHEN te_yx > te_xy THEN 'revenue_leads_count'
          |ELSE 'symmetric' END AS verdict""".stripMargin)
  }
  val timeTransferEntropySql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |ups AS (
      |  SELECT day, yu, xu,
      |    lag(yu) OVER (ORDER BY day) AS ypu,
      |    lag(xu) OVER (ORDER BY day) AS xpu
      |  FROM (
      |    SELECT day,
      |      CASE WHEN v > lag(v) OVER (ORDER BY day) THEN 1 ELSE 0 END AS yu,
      |      CASE WHEN c > lag(c) OVER (ORDER BY day) THEN 1 ELSE 0 END AS xu,
      |      lag(v) OVER (ORDER BY day) AS vp
      |    FROM days)
      |  WHERE vp IS NOT NULL),
      |u2 AS (SELECT * FROM ups WHERE ypu IS NOT NULL),
      |t1 AS (
      |  SELECT CAST(sum(tq) AS BIGINT) AS te_xy FROM (
      |    SELECT CAST(floor(CAST(nabe AS DOUBLE) / nn
      |      * ln(CAST(nabe AS DOUBLE) * nb / (CAST(nbe AS DOUBLE) * nab))
      |      * 1e12 + 0.5) AS BIGINT) AS tq
      |    FROM (
      |      SELECT nabe,
      |        sum(nabe) OVER (PARTITION BY b, e) AS nbe,
      |        sum(nabe) OVER (PARTITION BY a, b) AS nab,
      |        sum(nabe) OVER (PARTITION BY b) AS nb,
      |        sum(nabe) OVER () AS nn
      |      FROM (
      |        SELECT yu AS a, ypu AS b, xpu AS e, CAST(count(*) AS BIGINT) AS nabe
      |        FROM u2 GROUP BY 1, 2, 3)))),
      |t2 AS (
      |  SELECT CAST(sum(tq) AS BIGINT) AS te_yx FROM (
      |    SELECT CAST(floor(CAST(nabe AS DOUBLE) / nn
      |      * ln(CAST(nabe AS DOUBLE) * nb / (CAST(nbe AS DOUBLE) * nab))
      |      * 1e12 + 0.5) AS BIGINT) AS tq
      |    FROM (
      |      SELECT nabe,
      |        sum(nabe) OVER (PARTITION BY b, e) AS nbe,
      |        sum(nabe) OVER (PARTITION BY a, b) AS nab,
      |        sum(nabe) OVER (PARTITION BY b) AS nb,
      |        sum(nabe) OVER () AS nn
      |      FROM (
      |        SELECT xu AS a, xpu AS b, ypu AS e, CAST(count(*) AS BIGINT) AS nabe
      |        FROM u2 GROUP BY 1, 2, 3)))),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM u2)
      |SELECT n_days,
      |  round(CAST(te_xy AS DOUBLE) / 1e12, 6) AS te_count_to_rev,
      |  round(CAST(te_yx AS DOUBLE) / 1e12, 6) AS te_rev_to_count,
      |  round((CAST(te_xy AS DOUBLE) - te_yx) / 1e12, 6) AS net_te,
      |  CASE WHEN te_xy > te_yx THEN 'count_leads_revenue'
      |  WHEN te_yx > te_xy THEN 'revenue_leads_count'
      |  ELSE 'symmetric' END AS verdict
      |FROM t1, t2, nd""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_iv_wald" -> (statIvWald _),
    "stat_regression_discontinuity" -> (statRegressionDiscontinuity _),
    "stat_diff_in_diff" -> (statDiffInDiff _),
    "time_transfer_entropy" -> (timeTransferEntropy _),
  )

  val oracle: Map[String, String] = Map(
    "stat_iv_wald" -> statIvWaldSql,
    "stat_regression_discontinuity" -> statRegressionDiscontinuitySql,
    "stat_diff_in_diff" -> statDiffInDiffSql,
    "time_transfer_entropy" -> timeTransferEntropySql,
  )
}
