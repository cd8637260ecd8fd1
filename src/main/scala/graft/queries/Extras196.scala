package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 96 (C788–C791): dependence beyond monotone + EDF normality +
  * graph inequality — exact distance correlation, the two-sample
  * energy test, Filliben's probability-plot correlation (with an
  * Acklam inverse-normal evaluated as identical rational polynomials
  * in both engines), and the degree-distribution Gini.
  *
  * Shared discipline: distance/energy sums are EXACT integer algebra
  * over bounded pair frames (×n² centering); the PPCC quantizes the
  * plotting-position normal quantile once per row and keeps every sum
  * in exact DECIMAL products; degree Gini is pure integer block
  * arithmetic over the degree histogram.
  */
object Extras196 {

  /** C788 stat_distance_corr — Székely's distance correlation between
    * a nation's customer balance mass and its order revenue (the
    * 25-point frame C770 ranks): pairwise |Δ| matrices doubly centered
    * EXACTLY via the ×n² trick (A' = n²a − n·r_i − n·r_j + s, all
    * BIGINT/DECIMAL), dCor² = ΣA'B'/√(ΣA'²ΣB'²) with the n⁶ scale
    * cancelling. Detects ANY dependence with a 0-iff-independent
    * population target — the modern complement to C770's Hoeffding D.
    */
  def statDistanceCorr(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)")).cast("long").as("x"))
    val rev = customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).cast("long").as("y"))
    val pts = cust.join(rev, Seq("nk"))
    val other = graft.functions.BoundedDim.capped(
      pts.select(col("nk").as("nk2"), col("x").as("x2"), col("y").as("y2")),
      64, "distance-corr nation frame (25 nations)")
    val pairs = pts.crossJoin(broadcast(other))
      .select(col("nk"), col("nk2"),
        expr("abs(x - x2)").as("a"), expr("abs(y - y2)").as("b"))
    val rows = pairs.groupBy("nk")
      .agg(sum(col("a")).cast("decimal(38,0)").as("ra"),
        sum(col("b")).cast("decimal(38,0)").as("rb"))
    val tot = pairs.agg(count(lit(1)).cast("long").as("n2"),
      sum(col("a")).cast("decimal(38,0)").as("sa"),
      sum(col("b")).cast("decimal(38,0)").as("sb"))
    val n = pts.agg(count(lit(1)).cast("long").as("n"))
    val centered = pairs
      .join(broadcast(rows), Seq("nk"))
      .join(broadcast(rows.select(col("nk").as("nk2"), col("ra").as("ca"), col("rb").as("cb"))), Seq("nk2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n))
      .select(
        expr("CAST(n AS DECIMAL(38,0)) * n * a - CAST(n AS DECIMAL(38,0)) * ra - CAST(n AS DECIMAL(38,0)) * ca + sa").as("ap"),
        expr("CAST(n AS DECIMAL(38,0)) * n * b - CAST(n AS DECIMAL(38,0)) * rb - CAST(n AS DECIMAL(38,0)) * cb + sb").as("bp"),
        col("n"))
    centered.groupBy("n")
      .agg(sum(expr("ap * bp")).cast("decimal(38,0)").as("sab"),
        sum(expr("ap * ap")).cast("decimal(38,0)").as("saa"),
        sum(expr("bp * bp")).cast("decimal(38,0)").as("sbb"))
      .selectExpr("n",
        """CASE WHEN CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE) = 0 THEN 0.0D
          |ELSE round(CAST(sab AS DOUBLE)
          |  / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)), 6) END AS dcor2""".stripMargin,
        """CASE WHEN CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE) = 0 OR CAST(sab AS DOUBLE) < 0 THEN 0.0D
          |ELSE round(sqrt(CAST(sab AS DOUBLE)
          |  / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))), 6) END AS dcor""".stripMargin)
  }
  val statDistanceCorrSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey AS nk,
      |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS x
      |  FROM customer GROUP BY 1),
      |rev AS (
      |  SELECT c.c_nationkey AS nk,
      |    CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY 1),
      |pts AS (SELECT c.nk, c.x, r.y FROM cust c JOIN rev r ON r.nk = c.nk),
      |pairs AS (
      |  SELECT p.nk, o.nk AS nk2, abs(p.x - o.x) AS a, abs(p.y - o.y) AS b
      |  FROM pts p, pts o),
      |rws AS (
      |  SELECT nk, CAST(sum(a) AS DECIMAL(38,0)) AS ra, CAST(sum(b) AS DECIMAL(38,0)) AS rb
      |  FROM pairs GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(a) AS DECIMAL(38,0)) AS sa, CAST(sum(b) AS DECIMAL(38,0)) AS sb
      |  FROM pairs),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
      |cent AS (
      |  SELECT
      |    CAST(t.n AS DECIMAL(38,0)) * t.n * p.a - CAST(t.n AS DECIMAL(38,0)) * r1.ra - CAST(t.n AS DECIMAL(38,0)) * r2.ra + s.sa AS ap,
      |    CAST(t.n AS DECIMAL(38,0)) * t.n * p.b - CAST(t.n AS DECIMAL(38,0)) * r1.rb - CAST(t.n AS DECIMAL(38,0)) * r2.rb + s.sb AS bp,
      |    t.n
      |  FROM pairs p
      |  JOIN rws r1 ON r1.nk = p.nk
      |  JOIN rws r2 ON r2.nk = p.nk2, tot s, nn t),
      |ag AS (
      |  SELECT n, CAST(sum(ap * bp) AS DECIMAL(38,0)) AS sab,
      |    CAST(sum(ap * ap) AS DECIMAL(38,0)) AS saa,
      |    CAST(sum(bp * bp) AS DECIMAL(38,0)) AS sbb
      |  FROM cent GROUP BY 1)
      |SELECT n,
      |  CASE WHEN CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE) = 0 THEN 0.0
      |    ELSE round(CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)), 6) END AS dcor2,
      |  CASE WHEN CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE) = 0 OR CAST(sab AS DOUBLE) < 0 THEN 0.0
      |    ELSE round(sqrt(CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))), 6) END AS dcor
      |FROM ag""".stripMargin

  /** C789 stat_energy_test — the Székely–Rizzo two-sample energy test
    * between the A and R quantity populations from the ≤50-bucket
    * histogram: E|X−Y|, E|X−X'|, E|Y−Y'| as EXACT integer pair sums
    * Σ l_u·l_v·|u−v| over the bounded 50×50 value grid, distance
    * D = 2E_xy − E_xx − E_yy ≥ 0, and T = n1n2/(n1+n2)·D. The
    * metric-space two-sample test — rotation/shape-free, vs the
    * rank-based alternatives (C781, C787).
    */
  def statEnergyTest(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("l1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("l2"))
    val other = graft.functions.BoundedDim.capped(
      hist.select(col("qv").as("qv2"), col("l1").as("m1"), col("l2").as("m2")),
      64, "energy-test quantity histogram (50 integer quantities)")
    val pairs = hist.crossJoin(broadcast(other))
      .agg(
        sum(expr("CAST(l1 AS DECIMAL(38,0)) * m2 * abs(qv - qv2)")).cast("decimal(38,0)").as("sxy"),
        sum(expr("CAST(l1 AS DECIMAL(38,0)) * m1 * abs(qv - qv2)")).cast("decimal(38,0)").as("sxx"),
        sum(expr("CAST(l2 AS DECIMAL(38,0)) * m2 * abs(qv - qv2)")).cast("decimal(38,0)").as("syy"))
    val tot = hist.agg(sum(col("l1")).cast("long").as("n1"), sum(col("l2")).cast("long").as("n2"))
    pairs.crossJoin(broadcast(tot))
      .selectExpr("n1", "n2",
        "round(CAST(sxy AS DOUBLE) / n1 / n2, 6) AS e_xy",
        """round(2 * CAST(sxy AS DOUBLE) / n1 / n2
          |- CAST(sxx AS DOUBLE) / n1 / n1
          |- CAST(syy AS DOUBLE) / n2 / n2, 6) AS energy_dist""".stripMargin,
        """round(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
          |* (2 * CAST(sxy AS DOUBLE) / n1 / n2
          |   - CAST(sxx AS DOUBLE) / n1 / n1
          |   - CAST(syy AS DOUBLE) / n2 / n2), 6) AS t_energy""".stripMargin)
  }
  val statEnergyTestSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |pairs AS (
      |  SELECT
      |    CAST(sum(CAST(h.l1 AS DECIMAL(38,0)) * o.l2 * abs(h.qv - o.qv)) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(h.l1 AS DECIMAL(38,0)) * o.l1 * abs(h.qv - o.qv)) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(h.l2 AS DECIMAL(38,0)) * o.l2 * abs(h.qv - o.qv)) AS DECIMAL(38,0)) AS syy
      |  FROM hist h, hist o),
      |tot AS (
      |  SELECT CAST(sum(l1) AS BIGINT) AS n1, CAST(sum(l2) AS BIGINT) AS n2 FROM hist)
      |SELECT n1, n2,
      |  round(CAST(sxy AS DOUBLE) / n1 / n2, 6) AS e_xy,
      |  round(2 * CAST(sxy AS DOUBLE) / n1 / n2
      |    - CAST(sxx AS DOUBLE) / n1 / n1
      |    - CAST(syy AS DOUBLE) / n2 / n2, 6) AS energy_dist,
      |  round(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
      |    * (2 * CAST(sxy AS DOUBLE) / n1 / n2
      |       - CAST(sxx AS DOUBLE) / n1 / n1
      |       - CAST(syy AS DOUBLE) / n2 / n2), 6) AS t_energy
      |FROM pairs, tot""".stripMargin

  /** Acklam inverse normal CDF (shared fragment — see [[QNorm]]):
    * identical arithmetic text in Spark SQL and DuckDB SQL, so both
    * engines evaluate bit-identical doubles.
    */
  private def qnorm(p: String): String = QNorm.sql(p)

  /** C790 stat_filliben_ppcc — Filliben's probability-plot
    * correlation coefficient of order totals against the normal:
    * global ranks from the two-pass prefix sum (deterministic
    * (price, orderkey) order), Filliben plotting positions
    * (1−0.5^{1/n}, (i−0.3175)/(n+0.365), 0.5^{1/n}), normal quantiles
    * via the Acklam rational polynomial above quantized ·10⁶ ONCE,
    * then r from exact DECIMAL products of (mq, x). The
    * Shapiro-adjacent normality screen that scales to any n — no
    * coefficient tables.
    */
  def statFillibenPpcc(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withExclusivePrefixSum(base.withColumn("one", lit(1L)), "i0", col("one"),
        Seq(col("cv").asc, col("okey").asc))
      .withColumn("i", expr("i0 + 1"))
    val tot = base.agg(count(lit(1)).cast("long").as("n"))
    val u = s"""CASE WHEN i = 1 THEN 1 - pow(0.5D, 1.0D / n)
      |WHEN i = n THEN pow(0.5D, 1.0D / n)
      |ELSE (i - 0.3175D) / (n + 0.365D) END""".stripMargin
    val withM = ranked.crossJoin(broadcast(tot))
      .withColumn("mq", expr(s"CAST(floor((${qnorm(s"($u)")}) * 1e6 + 0.5) AS BIGINT)"))
    withM.groupBy("n")
      .agg(sum(expr("CAST(mq AS DECIMAL(38,0))")).cast("decimal(38,0)").as("sm"),
        sum(expr("CAST(mq AS DECIMAL(38,0)) * mq")).cast("decimal(38,0)").as("smm"),
        sum(expr("CAST(mq AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("smx"),
        sum(expr("CAST(cv AS DECIMAL(38,0))")).cast("decimal(38,0)").as("sx"),
        sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("sxx"))
      .selectExpr("n",
        """round((CAST(n AS DOUBLE) * CAST(smx AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sx AS DOUBLE))
          |/ sqrt((CAST(n AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
          |  * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) AS ppcc""".stripMargin)
  }
  val statFillibenPpccSql: String = {
    val u = """CASE WHEN r.i = 1 THEN 1 - pow(0.5, 1.0 / t.n)
      |WHEN r.i = t.n THEN pow(0.5, 1.0 / t.n)
      |ELSE (r.i - 0.3175) / (t.n + 0.365) END""".stripMargin
    s"""WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS i FROM base),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      |withm AS (
      |  SELECT r.cv, t.n,
      |    CAST(floor((${qnorm(s"($u)")}) * 1e6 + 0.5) AS BIGINT) AS mq
      |  FROM ranked r, tot t),
      |ag AS (
      |  SELECT n,
      |    CAST(sum(CAST(mq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm,
      |    CAST(sum(CAST(mq AS DECIMAL(38,0)) * mq) AS DECIMAL(38,0)) AS smm,
      |    CAST(sum(CAST(mq AS DECIMAL(38,0)) * cv) AS DECIMAL(38,0)) AS smx,
      |    CAST(sum(CAST(cv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(cv AS DECIMAL(38,0)) * cv) AS DECIMAL(38,0)) AS sxx
      |  FROM withm GROUP BY 1)
      |SELECT n,
      |  round((CAST(n AS DOUBLE) * CAST(smx AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sx AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) AS ppcc
      |FROM ag""".stripMargin
  }

  /** C791 graph_degree_gini — the Gini coefficient of the degree
    * distribution of the C612 synthetic event graph (connectivity
    * inequality — the hub-concentration number the heavy-tail and
    * centralization rows bracket): degree histogram + exclusive
    * prefix sums, per-block EXACT arithmetic-series rank sums,
    * G = Σ(2i−n−1)d_(i) / (n·Σd) with everything integer until one
    * division.
    */
  def graphDegreeGini(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val arcs = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val edges = arcs.unionAll(arcs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val hist = edges.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      .groupBy("deg").agg(count(lit(1)).cast("long").as("m"))
    // tiny degree histogram (agg-bounded): single-task exclusive window
    val withC = hist.withColumn("c", coalesce(sum(col("m")).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("deg").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
    val tot = hist.agg(sum(col("m")).cast("long").as("nn"),
      sum(expr("deg * m")).cast("decimal(38,0)").as("sd"))
    // Σ_{i=c+1}^{c+m} (2i − n − 1) = m·(2c + m − n)  (arithmetic series)
    withC.crossJoin(broadcast(tot))
      .agg(max(col("nn")).as("n_nodes"), max(col("sd")).as("sd"),
        sum(expr("CAST(deg AS DECIMAL(38,0)) * m * (2*c + m - nn)")).cast("decimal(38,0)").as("gnum"))
      .selectExpr("n_nodes",
        "round(CAST(sd AS DOUBLE) / n_nodes, 4) AS mean_degree",
        "round(CAST(gnum AS DOUBLE) / (CAST(n_nodes AS DOUBLE) * CAST(sd AS DOUBLE)), 6) AS degree_gini")
  }
  val graphDegreeGiniSql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |nn0 AS (SELECT count(*) AS n FROM users),
      |arcs AS (
      |  SELECT src, dst FROM (
      |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn0
      |    UNION ALL
      |    SELECT user_id, (user_id + 2) % n FROM users, nn0
      |    UNION ALL
      |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn0)
      |  WHERE src <> dst),
      |edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM arcs UNION ALL SELECT dst, src FROM arcs)),
      |hist AS (
      |  SELECT deg, CAST(count(*) AS BIGINT) AS m FROM (
      |    SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1)
      |  GROUP BY 1),
      |blocks AS (
      |  SELECT deg, m,
      |    COALESCE(sum(m) OVER (ORDER BY deg
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c
      |  FROM hist),
      |tot AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS nn,
      |    CAST(sum(deg * m) AS DECIMAL(38,0)) AS sd
      |  FROM hist)
      |SELECT max(t.nn) AS n_nodes,
      |  round(CAST(max(t.sd) AS DOUBLE) / max(t.nn), 4) AS mean_degree,
      |  round(CAST(CAST(sum(CAST(b.deg AS DECIMAL(38,0)) * b.m * (2*b.c + b.m - t.nn)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / (CAST(max(t.nn) AS DOUBLE) * CAST(max(t.sd) AS DOUBLE)), 6) AS degree_gini
      |FROM blocks b, tot t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_distance_corr" -> (statDistanceCorr _),
    "stat_energy_test" -> (statEnergyTest _),
    "stat_filliben_ppcc" -> (statFillibenPpcc _),
    "graph_degree_gini" -> (graphDegreeGini _),
  )

  val oracle: Map[String, String] = Map(
    "stat_distance_corr" -> statDistanceCorrSql,
    "stat_energy_test" -> statEnergyTestSql,
    "stat_filliben_ppcc" -> statFillibenPpccSql,
    "graph_degree_gini" -> graphDegreeGiniSql,
  )
}
