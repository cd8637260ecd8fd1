package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 63 (C656–C659): log-rank test, Anderson–Darling
  * exponentiality, Sortino ratio, Taylor's power law.
  */
object Extras163 {

  /** C656 stat_logrank_test — the two-group log-rank survival test
    * (do high-discount items ship on a different clock?): event times
    * are lead-time days (BOUNDED ≤~130 distinct — complete data, no
    * censoring, documented), at-risk counts come from suffix sums over
    * the bounded distinct-time frame (aggregate-below windows), each
    * time's hypergeometric E and V apply their rational denominators
    * as micro-quantized integer divisions (exact sums — the
    * Krippendorff discipline), χ² = (O−E)²/V.
    */
  def statLogrankTest(s: SparkSession, d: String): DataFrame = {
    val ev = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"),
        expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END").as("g"))
      .filter(col("t") >= 1)
    val byT = ev.groupBy("t")
      .agg(count(lit(1)).cast("long").as("dt"),
        sum(col("g")).cast("long").as("d1t"))
    val wSuf = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = byT
      .withColumn("nt", sum(col("dt")).over(wSuf))
      .withColumn("n1t", sum(col("d1t")).over(wSuf))
    risk
      .withColumn("e6", expr("(CAST(dt AS DECIMAL(38,0)) * n1t * 1000000) div nt"))
      .withColumn("v6", expr(
        """CASE WHEN nt > 1 THEN
          |  (CAST(dt AS DECIMAL(38,0)) * n1t * (nt - n1t) * (nt - dt) * 1000000)
          |    div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))
          |ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
      .agg(count(lit(1)).cast("long").as("n_times"),
        sum(col("d1t")).cast("long").as("o1"),
        sum(col("e6")).cast("decimal(38,0)").as("se6"),
        sum(col("v6")).cast("decimal(38,0)").as("sv6"))
      .selectExpr("n_times", "o1",
        "round(CAST(se6 AS DOUBLE) / 1e6, 4) AS e1",
        """round(pow(o1 - CAST(se6 AS DOUBLE) / 1e6, 2)
          |  / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS logrank_chi2""".stripMargin,
        """pow(o1 - CAST(se6 AS DOUBLE) / 1e6, 2)
          |  / (CAST(sv6 AS DOUBLE) / 1e6) > 3.841 AS reject_equal_survival""".stripMargin)
  }
  val statLogrankTestSql: String =
    """WITH ev AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t,
      |    CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS g
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS dt, CAST(sum(g) AS BIGINT) AS d1t
      |  FROM ev GROUP BY 1),
      |risk AS (
      |  SELECT t, dt, d1t,
      |    sum(dt) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt,
      |    sum(d1t) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1t
      |  FROM byt),
      |q AS (
      |  SELECT dt, d1t,
      |    CAST(CAST(dt AS HUGEINT) * n1t * 1000000 AS HUGEINT) // nt AS e6,
      |    CASE WHEN nt > 1 THEN
      |      CAST(CAST(dt AS HUGEINT) * n1t * (nt - n1t) * (nt - dt) * 1000000 AS HUGEINT)
      |        // (CAST(nt AS HUGEINT) * nt * (nt - 1))
      |    ELSE CAST(0 AS HUGEINT) END AS v6
      |  FROM risk),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_times,
      |    CAST(sum(d1t) AS BIGINT) AS o1,
      |    CAST(sum(e6) AS DECIMAL(38,0)) AS se6,
      |    CAST(sum(v6) AS DECIMAL(38,0)) AS sv6
      |  FROM q)
      |SELECT n_times, o1,
      |  round(CAST(se6 AS DOUBLE) / 1e6, 4) AS e1,
      |  round(pow(o1 - CAST(se6 AS DOUBLE) / 1e6, 2)
      |    / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS logrank_chi2,
      |  pow(o1 - CAST(se6 AS DOUBLE) / 1e6, 2)
      |    / (CAST(sv6 AS DOUBLE) / 1e6) > 3.841 AS reject_equal_survival
      |FROM m""".stripMargin

  /** C657 stat_anderson_darling_exp — the Anderson–Darling goodness-
    * of-fit test for exponentiality of lead times: with only ~130
    * distinct day values, the rank-weighted sum collapses to the
    * distinct-value frame — Σ_{i∈[a,b]}(2i−1) = b²−(a−1)² from the
    * EXACT prefix counts, each value's ln F and ln(1−F) nano-quantized
    * so both weighted sums are exact DECIMAL, A² = −n − (T₁+T₂)/n.
    * λ̂ = n/S is the MLE; F(x) = 1 − exp(−x·n/S).
    */
  def statAndersonDarlingExp(s: SparkSession, d: String): DataFrame = {
    val ev = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"))
      .filter(col("t") >= 1)
    val byT = ev.groupBy("t").agg(count(lit(1)).cast("long").as("w"))
    val tot = byT.agg(sum(col("w")).cast("long").as("n"),
      sum(expr("t * w")).cast("long").as("st"))
    val wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("cl", sum(col("w")).over(wp))
      .crossJoin(broadcast(tot))
      .withColumn("f", expr("1 - exp(-CAST(t AS DOUBLE) * n / st)"))
      .withColumn("lf_q", expr("CAST(floor(ln(f) * 1e9 + 0.5) AS BIGINT)"))
      // ln(1-F) = -x*n/S exactly (no 1-f subtraction) - same text both engines
      .withColumn("l1f_q", expr(
        "CAST(floor((-CAST(t AS DOUBLE) * n / st) * 1e9 + 0.5) AS BIGINT)"))
      // sum over rows i in [cl-w+1, cl] of (2i-1) = cl^2 - (cl-w)^2
      .withColumn("w1", expr(
        "CAST(cl AS DECIMAL(38,0)) * cl - CAST(cl - w AS DECIMAL(38,0)) * (cl - w)"))
      // for the reversed term: sum over those rows of (2(n+1-i)-1)
      //   = (n-cl+w)^2 - (n-cl)^2
      .withColumn("w2", expr(
        "CAST(n - cl + w AS DECIMAL(38,0)) * (n - cl + w) - CAST(n - cl AS DECIMAL(38,0)) * (n - cl)"))
      .agg(max(col("n")).as("n"),
        sum(expr("w1 * lf_q")).as("t1"),
        sum(expr("w2 * l1f_q")).as("t2"))
      .selectExpr("n",
        """round(-CAST(n AS DOUBLE)
          |  - (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)) / 1e9 / n, 4)
          |  AS ad_a2""".stripMargin)
      .selectExpr("n", "ad_a2", "ad_a2 > 1.341 AS reject_exponential")
  }
  val statAndersonDarlingExpSql: String =
    """WITH ev AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS w FROM ev GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(w) AS BIGINT) AS n, CAST(sum(t * w) AS BIGINT) AS st
      |  FROM byt),
      |pre AS (
      |  SELECT t, w,
      |    CAST(sum(w) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM byt),
      |q AS (
      |  SELECT w, cl, n,
      |    CAST(floor(ln(1 - exp(-CAST(t AS DOUBLE) * n / st)) * 1e9 + 0.5) AS BIGINT) AS lf_q,
      |    CAST(floor((-CAST(t AS DOUBLE) * n / st) * 1e9 + 0.5) AS BIGINT) AS l1f_q,
      |    CAST(cl AS DECIMAL(38,0)) * cl - CAST(cl - w AS DECIMAL(38,0)) * (cl - w) AS w1,
      |    CAST(n - cl + w AS DECIMAL(38,0)) * (n - cl + w)
      |      - CAST(n - cl AS DECIMAL(38,0)) * (n - cl) AS w2
      |  FROM pre, tot),
      |m AS (
      |  SELECT max(n) AS n, sum(w1 * lf_q) AS t1, sum(w2 * l1f_q) AS t2
      |  FROM q)
      |SELECT n,
      |  round(-CAST(n AS DOUBLE)
      |    - (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)) / 1e9 / n, 4) AS ad_a2,
      |  -CAST(n AS DOUBLE)
      |    - (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)) / 1e9 / n > 1.341
      |    AS reject_exponential
      |FROM m""".stripMargin

  /** C658 win_sortino_ratio — downside-risk-adjusted daily return
    * (the Sortino companion to the drawdown/ulcer rows): daily log
    * returns nano-quantized ONCE (exact ints thereafter), mean return
    * and downside semideviation from exact sums over the bounded daily
    * frame, Sortino = mean/downside — two final divisions.
    */
  def winSortinoRatio(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    bars
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("pc").isNotNull)
      .withColumn("rq", expr(
        "CAST(floor(ln(CAST(c AS DOUBLE) / pc) * 1e9 + 0.5) AS BIGINT)"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("rq")).cast("long").as("sr"),
        sum(expr("CASE WHEN rq < 0 THEN CAST(rq AS DECIMAL(38,0)) * rq ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("sd2"),
        sum(expr("CASE WHEN rq < 0 THEN 1L ELSE 0L END")).cast("long").as("n_down"))
      .selectExpr("n_days", "n_down",
        "CAST(sr AS DOUBLE) / n_days / 1e9 AS mean_ret",
        "sqrt(CAST(sd2 AS DOUBLE) / n_days) / 1e9 AS downside")
      .selectExpr("n_days", "n_down",
        "round(mean_ret, 8) AS mean_log_return",
        "round(downside, 8) AS downside_dev",
        "round(mean_ret / downside, 6) AS sortino")
  }
  val winSortinoRatioSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT CAST(floor(ln(CAST(c AS DOUBLE) / lag(c, 1) OVER (ORDER BY day))
      |    * 1e9 + 0.5) AS BIGINT) AS rq
      |  FROM bars QUALIFY lag(c, 1) OVER (ORDER BY day) IS NOT NULL),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(rq) AS BIGINT) AS sr,
      |    CAST(sum(CASE WHEN rq < 0 THEN CAST(rq AS DECIMAL(38,0)) * rq
      |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS sd2,
      |    CAST(sum(CASE WHEN rq < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      |  FROM r),
      |p AS (
      |  SELECT n_days, n_down,
      |    CAST(sr AS DOUBLE) / n_days / 1e9 AS mean_ret,
      |    sqrt(CAST(sd2 AS DOUBLE) / n_days) / 1e9 AS downside
      |  FROM m)
      |SELECT n_days, n_down,
      |  round(mean_ret, 8) AS mean_log_return,
      |  round(downside, 8) AS downside_dev,
      |  round(mean_ret / downside, 6) AS sortino
      |FROM p""".stripMargin

  /** C659 stat_taylor_power_law — Taylor's law (variance ∝ meanᵇ)
    * across per-part quantity distributions (the overdispersion
    * exponent actuaries and ecologists fit; b≈2 for Tweedie-compound
    * processes): per-part exact moments in one grouped pass (parts
    * with ≥5 items), both log coordinates nano-quantized so the OLS
    * moments over ALL parts are exact DECIMAL sums (the Weibull
    * discipline), slope/intercept/R² as final doubles.
    */
  def statTaylorPowerLaw(s: SparkSession, d: String): DataFrame = {
    val parts = lineitem(s, d).groupBy("l_partkey")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("sq"),
        sum(expr("CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)"))
          .cast("long").as("qq"))
      .filter(col("n") >= 5)
      .filter(expr("n * qq - sq * sq > 0"))
      .selectExpr(
        "CAST(floor(ln(CAST(sq AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS xq",
        """CAST(floor(ln(CAST(n * qq - sq * sq AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * n)) * 1e9 + 0.5) AS BIGINT) AS yq""".stripMargin)
    parts.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
        sum(col("xq")).cast("decimal(38,0)").as("sx"),
        sum(col("yq")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(xq AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(yq AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as("syy"))
      .selectExpr("CAST(m AS BIGINT) AS n_parts",
        "CAST(m * sxy - sx * sy AS DOUBLE) AS cxy",
        "CAST(m * sxx - sx * sx AS DOUBLE) AS cxx",
        "CAST(m * syy - sy * sy AS DOUBLE) AS cyy",
        "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd",
        "CAST(m AS DOUBLE) AS md")
      .selectExpr("n_parts",
        "round(cxy / cxx, 6) AS taylor_b",
        "round((syd - cxy / cxx * sxd) / md / 1e9, 6) AS intercept_ln",
        "round(cxy * cxy / (cxx * cyy), 6) AS r2")
  }
  val statTaylorPowerLawSql: String =
    """WITH parts AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS qq
      |  FROM lineitem GROUP BY 1
      |  HAVING count(*) >= 5 AND count(*) * sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
      |    - sum(CAST(l_quantity AS BIGINT)) * sum(CAST(l_quantity AS BIGINT)) > 0),
      |q AS (
      |  SELECT
      |    CAST(floor(ln(CAST(sq AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS xq,
      |    CAST(floor(ln(CAST(n * qq - sq * sq AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n)) * 1e9 + 0.5) AS BIGINT) AS yq
      |  FROM parts),
      |m AS (
      |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS m,
      |    CAST(sum(xq) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(yq) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(xq AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(xq AS DECIMAL(38,0)) * xq) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(yq AS DECIMAL(38,0)) * yq) AS DECIMAL(38,0)) AS syy
      |  FROM q),
      |c AS (
      |  SELECT CAST(m AS BIGINT) AS n_parts,
      |    CAST(m * sxy - sx * sy AS DOUBLE) AS cxy,
      |    CAST(m * sxx - sx * sx AS DOUBLE) AS cxx,
      |    CAST(m * syy - sy * sy AS DOUBLE) AS cyy,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(m AS DOUBLE) AS md
      |  FROM m)
      |SELECT n_parts,
      |  round(cxy / cxx, 6) AS taylor_b,
      |  round((syd - cxy / cxx * sxd) / md / 1e9, 6) AS intercept_ln,
      |  round(cxy * cxy / (cxx * cyy), 6) AS r2
      |FROM c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_logrank_test" -> (statLogrankTest _),
    "stat_anderson_darling_exp" -> (statAndersonDarlingExp _),
    "win_sortino_ratio" -> (winSortinoRatio _),
    "stat_taylor_power_law" -> (statTaylorPowerLaw _),
  )

  val oracle: Map[String, String] = Map(
    "stat_logrank_test" -> statLogrankTestSql,
    "stat_anderson_darling_exp" -> statAndersonDarlingExpSql,
    "win_sortino_ratio" -> winSortinoRatioSql,
    "stat_taylor_power_law" -> statTaylorPowerLawSql,
  )
}
