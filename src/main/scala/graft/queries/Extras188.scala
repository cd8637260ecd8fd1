package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 88 (C756–C759): stability diagnostics — CUSUM-of-squares
  * variance changepoints, year-over-year rank stability (Spearman
  * footrule), Blomqvist's median-quadrant β, and split-half
  * reliability with the Spearman–Brown step-up.
  *
  * Shared discipline: prefix statistics ride exact DECIMAL cumulative
  * sums over aggregate-bounded frames; ranks come from exact
  * row_numbers over per-year aggregates joined by key (one shuffle,
  * never a collect); medians are exact histogram order statistics;
  * correlations use the n·Σxy − ΣxΣy exact-moment form.
  */
object Extras188 {

  /** C756 stat_cusum_squares — the CUSUM-of-SQUARES variance-change
    * screen on daily revenue: D_t = Σ_{≤t}c² / Σc² − t/n from exact
    * DECIMAL prefix sums (cross-multiplied to integers before the
    * max), sup|D| plus its argmax day. Locates where VOLATILITY
    * shifted — the second-moment sibling of the mean-CUSUM row.
    */
  def statCusumSquares(s: SparkSession, d: String): DataFrame = {
    val f = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
      .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("c2", expr("c * c"))
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c2")).cast("decimal(38,0)").as("q"))
    val wp = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    f.withColumn("cq", sum(col("c2")).over(wp))
      .crossJoin(broadcast(tot))
      // D_t·(n·q) = cq·n − t·q exactly; sign and argmax from the integers
      .withColumn("dx", expr("cq * n - rn * q"))
      .withColumn("absdx", expr("abs(cq * n - rn * q)"))
      .withColumn("rk", row_number().over(Window.orderBy(col("absdx").desc, col("day").asc)))
      .filter(col("rk") === 1)
      .selectExpr("n", "CAST(CAST(day AS DATE) AS STRING) AS argmax_day",
        """round(CAST(absdx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)), 6)
          |AS sup_d""".stripMargin,
        "CASE WHEN dx > 0 THEN 'early_volatility' ELSE 'late_volatility' END AS regime")
  }
  val statCusumSquaresSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |f AS (
      |  SELECT day, c * c AS c2,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c2) AS DECIMAL(38,0)) AS q FROM f),
      |pre AS (
      |  SELECT day, rn,
      |    CAST(sum(c2) OVER (ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cq
      |  FROM f),
      |dx AS (
      |  SELECT p.day, t.n, t.q, p.cq * t.n - p.rn * t.q AS dx,
      |    abs(p.cq * t.n - p.rn * t.q) AS absdx
      |  FROM pre p, tot t),
      |top AS (
      |  SELECT *, row_number() OVER (ORDER BY absdx DESC, day) AS rk FROM dx)
      |SELECT n, CAST(CAST(day AS DATE) AS VARCHAR) AS argmax_day,
      |  round(CAST(absdx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)), 6) AS sup_d,
      |  CASE WHEN dx > 0 THEN 'early_volatility' ELSE 'late_volatility' END AS regime
      |FROM top WHERE rk = 1""".stripMargin

  /** C757 stat_spearman_footrule — year-over-year supplier rank
    * stability: suppliers ranked by exact revenue cents within each of
    * the two most recent full years (row_number over per-year
    * aggregates, R1 tie-break), footrule F = Σ|r₁−r₂| over suppliers
    * present both years, normalized by the max ⌊m²/2⌋ ⇒ [0,1]. The
    * O(n) rank-distance (Kendall needs pairs; Diaconis–Graham bounds
    * footrule within 2× of it).
    */
  def statSpearmanFootrule(s: SparkSession, d: String): DataFrame = {
    val byYear = lineitem(s, d)
      .withColumn("yr", year(col("l_shipdate")))
      .groupBy("yr", "l_suppkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    // bounded driver-side scalar (same idiom as the graph rows' n)
    val y2 = byYear.agg(max(col("yr"))).head().getInt(0)
    val y1 = y2 - 1
    // suppliers grow with the corpus: rank on GlobalRank's two-pass
    // range-partitioned row number, never a single-task global window
    def ranked(y: Int, rcol: String) =
      graft.plans.GlobalRank.withGlobalRowNumber(
          byYear.filter(col("yr") === y), rcol,
          Seq(col("c").desc, col("l_suppkey").asc))
        .select(col("l_suppkey"), col(rcol))
    val j = ranked(y1, "r1").join(ranked(y2, "r2"), Seq("l_suppkey"))
    j.agg(count(lit(1)).cast("long").as("m"),
        sum(expr("abs(r1 - r2)")).cast("decimal(38,0)").as("f"))
      .selectExpr("m", "CAST(f AS BIGINT) AS footrule",
        s"CAST($y1 AS INT) AS year_a", s"CAST($y2 AS INT) AS year_b",
        "round(CAST(f AS DOUBLE) / CAST((m * m) div 2 AS DOUBLE), 6) AS footrule_norm")
  }
  def statSpearmanFootruleSqlFor(): String =
    """WITH byyear AS (
      |  SELECT CAST(year(l_shipdate) AS INT) AS yr, l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |y2 AS (SELECT max(yr) AS y2 FROM byyear),
      |r1 AS (
      |  SELECT l_suppkey,
      |    CAST(row_number() OVER (ORDER BY c DESC, l_suppkey) AS BIGINT) AS r1
      |  FROM byyear, y2 WHERE yr = y2 - 1),
      |r2 AS (
      |  SELECT l_suppkey,
      |    CAST(row_number() OVER (ORDER BY c DESC, l_suppkey) AS BIGINT) AS r2
      |  FROM byyear, y2 WHERE yr = y2),
      |j AS (SELECT r1.r1, r2.r2 FROM r1 JOIN r2 ON r1.l_suppkey = r2.l_suppkey),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(abs(r1 - r2)) AS BIGINT) AS f
      |  FROM j)
      |SELECT m, f AS footrule,
      |  CAST((SELECT y2 FROM y2) - 1 AS INT) AS year_a,
      |  CAST((SELECT y2 FROM y2) AS INT) AS year_b,
      |  round(CAST(f AS DOUBLE) / CAST((m * m) // 2 AS DOUBLE), 6) AS footrule_norm
      |FROM agg""".stripMargin

  /** C758 stat_blomqvist_beta — the median-quadrant correlation
    * between an order's total and its line count: both medians as
    * exact histogram order statistics, β = (n_agree − n_disagree)/
    * (n_agree + n_disagree) over off-median points. The robust
    * "do big orders have many lines" sign test — immune to every
    * monotone transform of either margin.
    */
  def statBlomqvistBeta(s: SparkSession, d: String): DataFrame = {
    val per = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("long").as("k"))
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c")),
        Seq("l_orderkey"))
      // r14: pin the joined per-order frame — the two median broadcast
      // subqueries and the final agg otherwise each recompute the
      // lineitem aggregate + orders join (3 heavy passes → 1)
      .localCheckpoint(false)
    // the c-margin histogram is keyed by near-unique order-total cents
    // (corpus-scale): its cumulative runs on GlobalRank's two-pass
    // prefix sum, never a single-task global window (inclusive cum =
    // exclusive prefix + own weight, exact longs)
    def medianOf(colName: String): DataFrame = {
      val hist = per.groupBy(colName).agg(count(lit(1)).cast("long").as("w"))
      graft.plans.GlobalRank
        .withExclusivePrefixSum(hist, "cl0", col("w"), Seq(col(colName).asc))
        .withColumn("cl", col("cl0") + col("w"))
        .crossJoin(broadcast(hist.agg(sum(col("w")).cast("long").as("n"))))
        .agg(min(expr(s"CASE WHEN 2 * cl >= n THEN $colName END")).as(s"med_$colName"))
    }
    per.crossJoin(broadcast(medianOf("k"))).crossJoin(broadcast(medianOf("c")))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr(
          """CASE WHEN (k > med_k AND c > med_c) OR (k < med_k AND c < med_c)
            |THEN 1L ELSE 0L END""".stripMargin)).cast("long").as("agree"),
        sum(expr(
          """CASE WHEN (k > med_k AND c < med_c) OR (k < med_k AND c > med_c)
            |THEN 1L ELSE 0L END""".stripMargin)).cast("long").as("disagree"))
      .selectExpr("n", "agree", "disagree",
        "round(CAST(agree - disagree AS DOUBLE) / (agree + disagree), 6) AS blomqvist_beta")
  }
  val statBlomqvistBetaSql: String =
    """WITH per AS (
      |  SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS k,
      |    max(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS c
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |mk AS (
      |  SELECT min(CASE WHEN 2 * cl >= n THEN k END) AS med_k FROM (
      |    SELECT k, CAST(sum(w) OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |    FROM (SELECT k, CAST(count(*) AS BIGINT) AS w FROM per GROUP BY 1)) h,
      |    (SELECT CAST(count(*) AS BIGINT) AS n FROM per) t),
      |mc AS (
      |  SELECT min(CASE WHEN 2 * cl >= n THEN c END) AS med_c FROM (
      |    SELECT c, CAST(sum(w) OVER (ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |    FROM (SELECT c, CAST(count(*) AS BIGINT) AS w FROM per GROUP BY 1)) h,
      |    (SELECT CAST(count(*) AS BIGINT) AS n FROM per) t)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN (k > med_k AND c > med_c) OR (k < med_k AND c < med_c)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS agree,
      |  CAST(sum(CASE WHEN (k > med_k AND c < med_c) OR (k < med_k AND c > med_c)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS disagree,
      |  round(CAST(sum(CASE WHEN (k > med_k AND c > med_c) OR (k < med_k AND c < med_c)
      |      THEN 1 ELSE 0 END)
      |    - sum(CASE WHEN (k > med_k AND c < med_c) OR (k < med_k AND c > med_c)
      |      THEN 1 ELSE 0 END) AS DOUBLE)
      |  / (sum(CASE WHEN (k > med_k AND c > med_c) OR (k < med_k AND c < med_c)
      |      THEN 1 ELSE 0 END)
      |    + sum(CASE WHEN (k > med_k AND c < med_c) OR (k < med_k AND c > med_c)
      |      THEN 1 ELSE 0 END)), 6) AS blomqvist_beta
      |FROM per, mk, mc""".stripMargin

  /** C759 stat_split_half_reliability — split-half reliability of
    * customer spend: halves = Q1+Q3 vs Q2+Q4 quarter spend per
    * customer (exact cents from one scan), Pearson r between halves
    * from exact DECIMAL moments, stepped up by Spearman–Brown
    * r_sb = 2r/(1+r). The quick-and-dirty cousin of C712's Cronbach α
    * — the spec cross-checks they land in the same neighborhood.
    */
  def statSplitHalfReliability(s: SparkSession, d: String): DataFrame = {
    val per = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        sum(expr("CASE WHEN quarter(o_orderdate) IN (1, 3) THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("h1"),
        sum(expr("CASE WHEN quarter(o_orderdate) IN (2, 4) THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END")).cast("decimal(38,0)").as("h2"))
    per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("h1")).cast("decimal(38,0)").as("s1"),
        sum(col("h2")).cast("decimal(38,0)").as("s2"),
        sum(expr("h1 * h1")).cast("decimal(38,0)").as("q1"),
        sum(expr("h2 * h2")).cast("decimal(38,0)").as("q2"),
        sum(expr("h1 * h2")).cast("decimal(38,0)").as("q12"))
      .selectExpr("n",
        """CAST(CAST(n AS DECIMAL(38,0)) * q12 - s1 * s2 AS DOUBLE)
          |/ sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q1 - s1 * s1 AS DOUBLE)
          |  * CAST(CAST(n AS DECIMAL(38,0)) * q2 - s2 * s2 AS DOUBLE)) AS r""".stripMargin)
      .selectExpr("n", "round(r, 6) AS half_r",
        "round(2 * r / (1 + r), 6) AS spearman_brown")
  }
  val statSplitHalfReliabilitySql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) IN (1, 3) THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS h1,
      |    CAST(sum(CASE WHEN quarter(o_orderdate) IN (2, 4) THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS h2
      |  FROM orders GROUP BY 1),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(h1) AS DECIMAL(38,0)) AS s1, CAST(sum(h2) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(h1 * h1) AS DECIMAL(38,0)) AS q1, CAST(sum(h2 * h2) AS DECIMAL(38,0)) AS q2,
      |    CAST(sum(h1 * h2) AS DECIMAL(38,0)) AS q12
      |  FROM per),
      |m AS (
      |  SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * q12 - s1 * s2 AS DOUBLE)
      |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * q1 - s1 * s1 AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * q2 - s2 * s2 AS DOUBLE)) AS r
      |  FROM agg)
      |SELECT n, round(r, 6) AS half_r,
      |  round(2 * r / (1 + r), 6) AS spearman_brown
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cusum_squares" -> (statCusumSquares _),
    "stat_spearman_footrule" -> (statSpearmanFootrule _),
    "stat_blomqvist_beta" -> (statBlomqvistBeta _),
    "stat_split_half_reliability" -> (statSplitHalfReliability _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cusum_squares" -> statCusumSquaresSql,
    "stat_spearman_footrule" -> statSpearmanFootruleSqlFor(),
    "stat_blomqvist_beta" -> statBlomqvistBetaSql,
    "stat_split_half_reliability" -> statSplitHalfReliabilitySql,
  )
}
