package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 85 (C744–C747): dependence/dispersion diagnostics — lag-1
  * auto-mutual-information, Poincaré SD1/SD2, the delta-method CV
  * confidence interval, and the mean-excess tail function.
  *
  * Shared discipline: joint distributions are EXACT COUNT tables
  * (decile × decile, ≤100 cells) with per-cell log terms quantized
  * before the sum; second moments of lag pairs stay exact in DECIMAL;
  * tail thresholds are exact histogram order statistics resolved in
  * one pass and broadcast as a single row.
  */
object Extras185 {

  /** Exact daily revenue cents with a dense day index. */
  private def dayFrame(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    bars.withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
  }
  private val dayFrameSql: String =
    """bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |df AS (
      |  SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars)""".stripMargin

  /** C744 time_auto_mutual_info — lag-1 auto-MI of daily revenue:
    * days binned into deciles (ntile over the bounded frame, R1
    * tie-break), the (bin_t, bin_{t+1}) joint table of EXACT counts,
    * MI = Σ (n_ij/N)·ln(n_ij·N/(n_i·n_j)) with per-cell terms
    * quantized ·10⁶. Captures NONLINEAR lag dependence the
    * autocorrelation rows cannot see; MI = 0 ⇔ independent bins.
    */
  def timeAutoMutualInfo(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
      .withColumn("b", ntile(10).over(Window.orderBy(col("c").asc, col("day").asc)))
    val pairs = f.withColumn("b2", lead(col("b"), 1).over(Window.orderBy("rn")))
      .filter(col("b2").isNotNull)
      .groupBy("b", "b2").agg(count(lit(1)).cast("long").as("nij"))
    val tot = pairs.agg(sum(col("nij")).cast("long").as("nn"))
    val margI = pairs.groupBy("b").agg(sum(col("nij")).cast("long").as("ni"))
    val margJ = pairs.groupBy("b2").agg(sum(col("nij")).cast("long").as("nj"))
    pairs.join(broadcast(margI), Seq("b"))
      .join(broadcast(margJ), Seq("b2"))
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(floor(CAST(nij AS DOUBLE)
          |* ln(CAST(nij AS DOUBLE) * nn / (CAST(ni AS DOUBLE) * nj)) * 1e6 + 0.5) AS BIGINT)"""
          .stripMargin).as("tq"),
        col("nn"))
      .agg(max(col("nn")).as("n_pairs"), count(lit(1)).cast("long").as("n_cells"),
        sum(col("tq")).cast("long").as("sq"))
      .selectExpr("n_pairs", "n_cells",
        "round(CAST(sq AS DOUBLE) / 1e6 / n_pairs, 6) AS ami_nats")
  }
  val timeAutoMutualInfoSql: String =
    s"""WITH $dayFrameSql,
      |binned AS (
      |  SELECT rn, ntile(10) OVER (ORDER BY c, day) AS b FROM df),
      |pairs AS (
      |  SELECT a.b, lead(a.b, 1) OVER (ORDER BY a.rn) AS b2 FROM binned a),
      |cells AS (
      |  SELECT b, b2, CAST(count(*) AS BIGINT) AS nij
      |  FROM pairs WHERE b2 IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn FROM cells),
      |mi AS (SELECT b, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
      |mj AS (SELECT b2, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
      |terms AS (
      |  SELECT t.nn,
      |    CAST(floor(CAST(c.nij AS DOUBLE)
      |      * ln(CAST(c.nij AS DOUBLE) * t.nn / (CAST(i.ni AS DOUBLE) * j.nj)) * 1e6 + 0.5) AS BIGINT) AS tq
      |  FROM cells c JOIN mi i ON i.b = c.b JOIN mj j ON j.b2 = c.b2, tot t)
      |SELECT max(nn) AS n_pairs, CAST(count(*) AS BIGINT) AS n_cells,
      |  round(CAST(CAST(sum(tq) AS BIGINT) AS DOUBLE) / 1e6 / max(nn), 6) AS ami_nats
      |FROM terms""".stripMargin

  /** C745 time_poincare_descriptors — the Poincaré-plot dispersion
    * pair on lag-1 revenue: SD1² = Var(x_{t+1}−x_t)/2 (short-term
    * jitter), SD2² = Var(x_{t+1}+x_t)/2 (long-term swing), both from
    * exact DECIMAL lag-pair moments (n·Σ−(Σ)² cross-multiplied);
    * SD2/SD1 ≫ 1 = trend-dominated, ≈ 1 = white. Dollar-scaled at the
    * end.
    */
  def timePoincareDescriptors(s: SparkSession, d: String): DataFrame = {
    val f = dayFrame(s, d)
    f.withColumn("cn", lead(col("c"), 1).over(Window.orderBy("rn")))
      .filter(col("cn").isNotNull)
      .select(expr("CAST(cn - c AS DECIMAL(38,0))").as("dd"),
        expr("CAST(cn + c AS DECIMAL(38,0))").as("ss"))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("dd")).cast("decimal(38,0)").as("sd"),
        sum(expr("dd * dd")).cast("decimal(38,0)").as("qd"),
        sum(col("ss")).cast("decimal(38,0)").as("sss"),
        sum(expr("ss * ss")).cast("decimal(38,0)").as("qs"))
      .selectExpr("m",
        """sqrt(CAST(CAST(m AS DECIMAL(38,0)) * qd - sd * sd AS DOUBLE)
          |/ (CAST(m AS DOUBLE) * m) / 2) / 100 AS sd1""".stripMargin,
        """sqrt(CAST(CAST(m AS DECIMAL(38,0)) * qs - sss * sss AS DOUBLE)
          |/ (CAST(m AS DOUBLE) * m) / 2) / 100 AS sd2""".stripMargin)
      .selectExpr("m AS n_pairs", "round(sd1, 2) AS sd1", "round(sd2, 2) AS sd2",
        "round(sd2 / sd1, 6) AS sd_ratio")
  }
  val timePoincareDescriptorsSql: String =
    s"""WITH $dayFrameSql,
      |lagd AS (
      |  SELECT CAST(lead(c, 1) OVER (ORDER BY rn) - c AS DECIMAL(38,0)) AS dd,
      |    CAST(lead(c, 1) OVER (ORDER BY rn) + c AS DECIMAL(38,0)) AS ss
      |  FROM df),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(dd) AS DECIMAL(38,0)) AS sd, CAST(sum(dd * dd) AS DECIMAL(38,0)) AS qd,
      |    CAST(sum(ss) AS DECIMAL(38,0)) AS sss, CAST(sum(ss * ss) AS DECIMAL(38,0)) AS qs
      |  FROM lagd WHERE dd IS NOT NULL),
      |m0 AS (
      |  SELECT m,
      |    sqrt(CAST(CAST(m AS DECIMAL(38,0)) * qd - sd * sd AS DOUBLE)
      |      / (CAST(m AS DOUBLE) * m) / 2) / 100 AS sd1,
      |    sqrt(CAST(CAST(m AS DECIMAL(38,0)) * qs - sss * sss AS DOUBLE)
      |      / (CAST(m AS DOUBLE) * m) / 2) / 100 AS sd2
      |  FROM agg)
      |SELECT m AS n_pairs, round(sd1, 2) AS sd1, round(sd2, 2) AS sd2,
      |  round(sd2 / sd1, 6) AS sd_ratio
      |FROM m0""".stripMargin

  /** C746 stat_cv_delta_ci — the coefficient of variation of order
    * totals with its first-order delta-method standard error
    * se = cv·√(1/(2(n−1)) + cv²/n) and 95% CI: the dispersion number
    * reported WITH uncertainty instead of bare. Exact cent moments in;
    * three doubles out.
    */
  def statCvDeltaCi(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"))
      .selectExpr("n",
        """sqrt(CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE)
          |/ (CAST(n AS DOUBLE) * (n - 1))) / (CAST(sc AS DOUBLE) / n) AS cv""".stripMargin)
      .selectExpr("n", "cv",
        "cv * sqrt(1.0 / (2 * (n - 1)) + cv * cv / n) AS se")
      .selectExpr("n", "round(cv, 6) AS cv", "round(se, 6) AS se",
        "round(cv - 1.96 * se, 6) AS ci_lo", "round(cv + 1.96 * se, 6) AS ci_hi")
  }
  val statCvDeltaCiSql: String =
    """WITH agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS qc
      |  FROM orders),
      |m0 AS (
      |  SELECT n,
      |    sqrt(CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (n - 1))) / (CAST(sc AS DOUBLE) / n) AS cv
      |  FROM agg),
      |m1 AS (SELECT n, cv, cv * sqrt(1.0 / (2 * (n - 1)) + cv * cv / n) AS se FROM m0)
      |SELECT n, round(cv, 6) AS cv, round(se, 6) AS se,
      |  round(cv - 1.96 * se, 6) AS ci_lo, round(cv + 1.96 * se, 6) AS ci_hi
      |FROM m1""".stripMargin

  /** C747 stat_mean_excess — the mean-excess function
    * e(u) = E[X−u | X>u] at the exact p50/p75/p90/p95/p99 order
    * statistics of order totals (histogram-prefix thresholds resolved
    * in one pass, broadcast as one row; excess sums exact in DECIMAL).
    * A mean-excess that RISES with u is the operational definition of
    * a heavy tail — the diagnostic behind the Hill/Gumbel rows.
    */
  def statMeanExcess(s: SparkSession, d: String): DataFrame = {
    val v = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
    // near-unique cent-value histogram (corpus-scale keys): inclusive
    // cum via GlobalRank's two-pass prefix sum, never a single-task
    // global window (r12 plan-gate hardening)
    val hist = v.groupBy("c").agg(count(lit(1)).cast("long").as("w"))
    // r14 restructure: ONE combined two-pass machinery carries the count
    // prefix AND the value-weighted prefix, and every tail sum comes off
    // the spine algebraically — Σ_{c>u}(c−u)·w = (st − svi(u)) −
    // u·(n − cl(u)), exact integers — so the old 5×-exploded second
    // pass over orders disappears entirely. Totals roll up from the
    // pinned spine, not a second orders scan.
    val spine = graft.plans.GlobalRank.withRankAndPrefixSums(hist, None,
        Seq((col("w"), "cl0"), (expr("CAST(c AS DECIMAL(38,0)) * w"), "sv0")),
        Seq(col("c").asc))
      .withColumn("cl", col("cl0") + col("w"))
      .withColumn("svi", expr("sv0 + CAST(c AS DECIMAL(38,0)) * w"))
    val tots = spine.agg(sum(col("w")).cast("long").as("n"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * w")).cast("decimal(38,0)").as("st"))
    val withCl = spine.crossJoin(broadcast(tots))
    // min(struct(c, ...)) picks the same row as min(c): c is the
    // distinct histogram key, so the struct min is tie-free
    def pick(p: Int) = min(expr(
      s"CASE WHEN 100 * cl >= $p * n THEN struct(c, cl, svi) END")).as(s"t$p")
    val thresholds = withCl.agg(max(col("n")).as("n"), max(col("st")).as("st"),
      pick(50), pick(75), pick(90), pick(95), pick(99))
    thresholds
      .select(explode(expr(
        """array(named_struct('p', 50, 't', t50), named_struct('p', 75, 't', t75),
          |named_struct('p', 90, 't', t90), named_struct('p', 95, 't', t95),
          |named_struct('p', 99, 't', t99))""".stripMargin)).as("e"),
        col("n"), col("st"))
      .selectExpr("e.p AS pct", "e.t.c AS u",
        "n - e.t.cl AS n_exceed",
        "st - e.t.svi - CAST(n - e.t.cl AS DECIMAL(38,0)) * e.t.c AS excess")
      .selectExpr("pct", "round(CAST(u AS DOUBLE) / 100, 2) AS threshold",
        "n_exceed",
        "round(CAST(excess AS DOUBLE) / n_exceed / 100, 2) AS mean_excess")
      .orderBy("pct")
  }
  val statMeanExcessSql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c FROM orders),
      |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS w FROM v GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM hist),
      |wcl AS (
      |  SELECT c, CAST(sum(w) OVER (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM hist),
      |thr AS (
      |  SELECT
      |    min(CASE WHEN 100 * cl >= 50 * n THEN c END) AS u50,
      |    min(CASE WHEN 100 * cl >= 75 * n THEN c END) AS u75,
      |    min(CASE WHEN 100 * cl >= 90 * n THEN c END) AS u90,
      |    min(CASE WHEN 100 * cl >= 95 * n THEN c END) AS u95,
      |    min(CASE WHEN 100 * cl >= 99 * n THEN c END) AS u99
      |  FROM wcl, tot),
      |lev AS (
      |  SELECT 50 AS pct, u50 AS u FROM thr UNION ALL SELECT 75, u75 FROM thr
      |  UNION ALL SELECT 90, u90 FROM thr UNION ALL SELECT 95, u95 FROM thr
      |  UNION ALL SELECT 99, u99 FROM thr),
      |g AS (
      |  SELECT l.pct, l.u,
      |    CAST(sum(CASE WHEN v.c > l.u THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
      |    CAST(sum(CASE WHEN v.c > l.u THEN CAST(v.c - l.u AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS excess
      |  FROM v, lev l GROUP BY 1, 2)
      |SELECT pct, round(CAST(u AS DOUBLE) / 100, 2) AS threshold, n_exceed,
      |  round(CAST(excess AS DOUBLE) / n_exceed / 100, 2) AS mean_excess
      |FROM g ORDER BY pct""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_auto_mutual_info" -> (timeAutoMutualInfo _),
    "time_poincare_descriptors" -> (timePoincareDescriptors _),
    "stat_cv_delta_ci" -> (statCvDeltaCi _),
    "stat_mean_excess" -> (statMeanExcess _),
  )

  val oracle: Map[String, String] = Map(
    "time_auto_mutual_info" -> timeAutoMutualInfoSql,
    "time_poincare_descriptors" -> timePoincareDescriptorsSql,
    "stat_cv_delta_ci" -> statCvDeltaCiSql,
    "stat_mean_excess" -> statMeanExcessSql,
  )
}
