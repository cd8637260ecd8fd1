package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 91 (C768–C771): experiment-analysis + dependence geometry —
  * CUPED variance reduction, partial correlation, Hoeffding's D, and
  * the Jammalamadaka–SenGupta circular correlation.
  *
  * Shared discipline: user/nation-level covariate moments are exact
  * cent-integer DECIMAL sums (one double conversion at the end);
  * Hoeffding's D is pure integer algebra over the 25-nation frame;
  * circular terms are quantized ·10⁹ per row before any distributed
  * sum, so sin/cos/atan2 evaluate on identical doubles in both
  * engines.
  */
object Extras191 {

  /** C768 stat_ab_cuped — CUPED-adjusted A/B readout on events: users
    * split by user_id parity, pre-period covariate X = a user's value
    * total before the global time midpoint, post metric Y = the total
    * after it. θ = cov(X,Y)/var(X) is estimated POOLED (the standard
    * CUPED estimator), the adjusted lift is
    * (Ȳ₁−θX̄₁) − (Ȳ₀−θX̄₀), and the variance reduction is ρ²_{XY}.
    * All moments are exact cent-integer sums; the midpoint is integer
    * epoch-microsecond arithmetic — no FP in any branch decision.
    */
  def statAbCuped(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(expr("CASE WHEN us <= mid THEN cv ELSE 0L END")).cast("long").as("x"),
        sum(expr("CASE WHEN us > mid THEN cv ELSE 0L END")).cast("long").as("y"))
      .withColumn("v", expr("CAST(user_id % 2 AS INT)"))
    val pooled = users.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"))
      .selectExpr("n",
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS covn",
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS varxn",
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS varyn")
      .selectExpr("n", "covn / varxn AS theta",
        "covn * covn / (varxn * varyn) AS var_reduction")
    val byV = users.groupBy("v")
      .agg(count(lit(1)).cast("long").as("nv"),
        sum(col("x")).cast("decimal(38,0)").as("sxv"),
        sum(col("y")).cast("decimal(38,0)").as("syv"))
      .selectExpr("v", "nv",
        "CAST(sxv AS DOUBLE) / nv / 100 AS mx", "CAST(syv AS DOUBLE) / nv / 100 AS my")
    val wide = byV.groupBy()
      .agg(sum(when(col("v") === 1, col("my"))).as("my1"),
        sum(when(col("v") === 0, col("my"))).as("my0"),
        sum(when(col("v") === 1, col("mx"))).as("mx1"),
        sum(when(col("v") === 0, col("mx"))).as("mx0"))
    wide.crossJoin(broadcast(pooled))
      .selectExpr("n AS n_users", "round(theta, 6) AS theta",
        "round(my1 - my0, 6) AS diff_raw",
        "round((my1 - theta * mx1) - (my0 - theta * mx0), 6) AS diff_cuped",
        "round(var_reduction, 6) AS var_reduction")
  }
  val statAbCupedSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv
      |  FROM events),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      |users AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN us <= (SELECT mid FROM mid) THEN cv ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN us > (SELECT mid FROM mid) THEN cv ELSE 0 END) AS BIGINT) AS y,
      |    CAST(user_id % 2 AS INT) AS v
      |  FROM ev GROUP BY user_id),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |  FROM users),
      |th AS (
      |  SELECT n,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS var_reduction
      |  FROM pooled),
      |byv AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS nv,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sxv, CAST(sum(y) AS DECIMAL(38,0)) AS syv
      |  FROM users GROUP BY v),
      |mv AS (
      |  SELECT v, CAST(sxv AS DOUBLE) / nv / 100 AS mx, CAST(syv AS DOUBLE) / nv / 100 AS my
      |  FROM byv),
      |wide AS (
      |  SELECT sum(CASE WHEN v = 1 THEN my END) AS my1,
      |    sum(CASE WHEN v = 0 THEN my END) AS my0,
      |    sum(CASE WHEN v = 1 THEN mx END) AS mx1,
      |    sum(CASE WHEN v = 0 THEN mx END) AS mx0
      |  FROM mv)
      |SELECT n AS n_users, round(theta, 6) AS theta,
      |  round(my1 - my0, 6) AS diff_raw,
      |  round((my1 - theta * mx1) - (my0 - theta * mx0), 6) AS diff_cuped,
      |  round(var_reduction, 6) AS var_reduction
      |FROM wide, th""".stripMargin

  /** C769 stat_partial_corr — first-order partial correlation of
    * quantity and extended price given discount,
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), with all
    * three Pearson r's from ONE lineitem scan's nine exact
    * integer-moment sums. What the marginal corr-matrix row (C-line
    * stat_corr_matrix) cannot answer: how much of the price–quantity
    * association survives holding the discount fixed.
    */
  def statPartialCorr(s: SparkSession, d: String): DataFrame = {
    val m = lineitem(s, d)
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("z"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("z")).cast("decimal(38,0)").as("sz"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("syy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).cast("decimal(38,0)").as("szz"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * z")).cast("decimal(38,0)").as("sxz"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * z")).cast("decimal(38,0)").as("syz"))
    m.selectExpr("n",
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy""".stripMargin,
        """(CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
          |/ sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |  * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz""".stripMargin,
        """(CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
          |/ sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
          |  * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz""".stripMargin)
      .selectExpr("n", "round(rxy, 6) AS r_xy", "round(rxz, 6) AS r_xz", "round(ryz, 6) AS r_yz",
        "round((rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) AS r_partial")
  }
  val statPartialCorrSql: String =
    """WITH m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(z) AS DECIMAL(38,0)) AS sz,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
      |    CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS szz,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(x AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS sxz,
      |    CAST(sum(CAST(y AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS syz
      |  FROM (
      |    SELECT CAST(l_quantity AS BIGINT) AS x,
      |      CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y,
      |      CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS z
      |    FROM lineitem)),
      |r AS (
      |  SELECT n,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
      |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
      |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
      |      / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
      |  FROM m)
      |SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz, round(ryz, 6) AS r_yz,
      |  round((rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6) AS r_partial
      |FROM r""".stripMargin

  /** C770 stat_hoeffding_d — Hoeffding's D test of independence
    * between a nation's customer balance mass and its customers' order
    * revenue, over the 25-nation aggregate frame: ranks R, S and joint
    * dominance counts Q from a bounded 25×25 pairwise pass (broadcast,
    * limit-bounded), D from the classical D1/D2/D3 integer sums. D
    * detects ANY dependence, not just monotone (vs Spearman/Kendall).
    * Ranks use strict-dominance counting — deterministic under the
    * exact integer coordinates either way.
    */
  def statHoeffdingD(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)")).cast("long").as("x"))
    val rev = customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).cast("long").as("y"))
    val pts = cust.join(rev, Seq("nk")).select("nk", "x", "y")
    val other = graft.functions.BoundedDim.capped(
      pts.select(col("x").as("xj"), col("y").as("yj")),
      64, "Hoeffding-D nation frame (25 nations)")
    val ranked = pts.crossJoin(broadcast(other))
      .groupBy("nk")
      .agg(sum(expr("CASE WHEN xj < x THEN 1L ELSE 0L END")).cast("long").as("rm1"),
        sum(expr("CASE WHEN yj < y THEN 1L ELSE 0L END")).cast("long").as("sm1"),
        sum(expr("CASE WHEN xj < x AND yj < y THEN 1L ELSE 0L END")).cast("long").as("q"))
    ranked.agg(count(lit(1)).cast("long").as("n"),
        sum(expr("q * (q - 1)")).cast("long").as("d1"),
        sum(expr("rm1 * (rm1 - 1) * sm1 * (sm1 - 1)")).cast("long").as("d2"),
        sum(expr("(rm1 - 1) * (sm1 - 1) * q")).cast("long").as("d3"))
      .selectExpr("n", "d1", "d2", "d3",
        """round(30.0D * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
          |/ (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3) * (n - 4)), 6) AS hoeffding_d""".stripMargin)
  }
  val statHoeffdingDSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey AS nk,
      |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      |  FROM customer GROUP BY 1),
      |rev AS (
      |  SELECT c.c_nationkey AS nk,
      |    CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |pts AS (SELECT c.nk, c.x, r.y FROM cust c JOIN rev r ON r.nk = c.nk),
      |ranked AS (
      |  SELECT p.nk,
      |    CAST(sum(CASE WHEN o.x < p.x THEN 1 ELSE 0 END) AS BIGINT) AS rm1,
      |    CAST(sum(CASE WHEN o.y < p.y THEN 1 ELSE 0 END) AS BIGINT) AS sm1,
      |    CAST(sum(CASE WHEN o.x < p.x AND o.y < p.y THEN 1 ELSE 0 END) AS BIGINT) AS q
      |  FROM pts p, pts o GROUP BY 1),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(q * (q - 1)) AS BIGINT) AS d1,
      |    CAST(sum(rm1 * (rm1 - 1) * sm1 * (sm1 - 1)) AS BIGINT) AS d2,
      |    CAST(sum((rm1 - 1) * (sm1 - 1) * q) AS BIGINT) AS d3
      |  FROM ranked)
      |SELECT n, d1, d2, d3,
      |  round(30.0 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
      |    / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3) * (n - 4)), 6) AS hoeffding_d
      |FROM ag""".stripMargin

  /** C771 stat_circular_corr — Jammalamadaka–SenGupta circular
    * correlation between each user's mean click hour-angle and mean
    * purchase hour-angle: per-(user,type,hour) counts make the
    * within-user sin/cos sums exact integer combinations of the 24
    * hour-angle values (quantized ·10⁹), the global mean directions
    * come from ·10⁹-quantized per-user components, and the final
    * r = Σsin(α−ᾱ)sin(β−β̄)/√(Σsin²·Σsin²) sums ·10⁹-quantized
    * per-user products. The association measure that respects
    * midnight wraparound — a Pearson r on raw hours would not.
    */
  def statCircularCorr(s: SparkSession, d: String): DataFrame = {
    val hr = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"), col("event_type").as("et"), expr("hour(ts)").as("h"))
      .agg(count(lit(1)).cast("long").as("m"))
      .select(col("user_id"), col("et"),
        expr("m * CAST(floor(sin(h * pi() / 12) * 1e9 + 0.5) AS BIGINT)").as("sq"),
        expr("m * CAST(floor(cos(h * pi() / 12) * 1e9 + 0.5) AS BIGINT)").as("cq"))
    val ang = hr.groupBy("user_id", "et")
      .agg(sum(col("sq")).cast("long").as("ss"), sum(col("cq")).cast("long").as("sc"))
      .select(col("user_id"), col("et"),
        expr("atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))").as("a"))
    val paired = ang.groupBy("user_id")
      .agg(sum(when(col("et") === "click", col("a"))).as("alpha"),
        sum(when(col("et") === "purchase", col("a"))).as("beta"),
        count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") === 2)
    val means = paired.agg(
      sum(expr("CAST(floor(sin(alpha) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sa"),
      sum(expr("CAST(floor(cos(alpha) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("ca"),
      sum(expr("CAST(floor(sin(beta) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("sb"),
      sum(expr("CAST(floor(cos(beta) * 1e9 + 0.5) AS BIGINT)")).cast("long").as("cb"))
      .selectExpr("atan2(CAST(sa AS DOUBLE), CAST(ca AS DOUBLE)) AS abar",
        "atan2(CAST(sb AS DOUBLE), CAST(cb AS DOUBLE)) AS bbar")
    paired.crossJoin(broadcast(means))
      .select(
        expr("CAST(floor(sin(alpha - abar) * sin(beta - bbar) * 1e9 + 0.5) AS BIGINT)").as("pq"),
        expr("CAST(floor(sin(alpha - abar) * sin(alpha - abar) * 1e9 + 0.5) AS BIGINT)").as("aq"),
        expr("CAST(floor(sin(beta - bbar) * sin(beta - bbar) * 1e9 + 0.5) AS BIGINT)").as("bq"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("pq")).cast("long").as("sp"),
        sum(col("aq")).cast("long").as("sa2"), sum(col("bq")).cast("long").as("sb2"))
      .selectExpr("n_users",
        "round(CAST(sp AS DOUBLE) / sqrt(CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE)), 6) AS r_circular")
  }
  val statCircularCorrSql: String =
    """WITH hr AS (
      |  SELECT user_id, event_type AS et, hour(ts) AS h, CAST(count(*) AS BIGINT) AS m
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2, 3),
      |hq AS (
      |  SELECT user_id, et,
      |    m * CAST(floor(sin(h * pi() / 12) * 1e9 + 0.5) AS BIGINT) AS sq,
      |    m * CAST(floor(cos(h * pi() / 12) * 1e9 + 0.5) AS BIGINT) AS cq
      |  FROM hr),
      |ang AS (
      |  SELECT user_id, et,
      |    atan2(CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE), CAST(CAST(sum(cq) AS BIGINT) AS DOUBLE)) AS a
      |  FROM hq GROUP BY 1, 2),
      |paired AS (
      |  SELECT user_id,
      |    sum(CASE WHEN et = 'click' THEN a END) AS alpha,
      |    sum(CASE WHEN et = 'purchase' THEN a END) AS beta,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM ang GROUP BY 1),
      |pp AS (SELECT * FROM paired WHERE cnt = 2),
      |means AS (
      |  SELECT
      |    atan2(CAST(CAST(sum(CAST(floor(sin(alpha) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE),
      |      CAST(CAST(sum(CAST(floor(cos(alpha) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)) AS abar,
      |    atan2(CAST(CAST(sum(CAST(floor(sin(beta) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE),
      |      CAST(CAST(sum(CAST(floor(cos(beta) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)) AS bbar
      |  FROM pp),
      |terms AS (
      |  SELECT
      |    CAST(floor(sin(p.alpha - m.abar) * sin(p.beta - m.bbar) * 1e9 + 0.5) AS BIGINT) AS pq,
      |    CAST(floor(sin(p.alpha - m.abar) * sin(p.alpha - m.abar) * 1e9 + 0.5) AS BIGINT) AS aq,
      |    CAST(floor(sin(p.beta - m.bbar) * sin(p.beta - m.bbar) * 1e9 + 0.5) AS BIGINT) AS bq
      |  FROM pp p, means m)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  round(CAST(CAST(sum(pq) AS BIGINT) AS DOUBLE)
      |    / sqrt(CAST(CAST(sum(aq) AS BIGINT) AS DOUBLE) * CAST(CAST(sum(bq) AS BIGINT) AS DOUBLE)), 6) AS r_circular
      |FROM terms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ab_cuped" -> (statAbCuped _),
    "stat_partial_corr" -> (statPartialCorr _),
    "stat_hoeffding_d" -> (statHoeffdingD _),
    "stat_circular_corr" -> (statCircularCorr _),
  )

  val oracle: Map[String, String] = Map(
    "stat_ab_cuped" -> statAbCupedSql,
    "stat_partial_corr" -> statPartialCorrSql,
    "stat_hoeffding_d" -> statHoeffdingDSql,
    "stat_circular_corr" -> statCircularCorrSql,
  )
}
