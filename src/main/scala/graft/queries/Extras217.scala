package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 117 (C872–C875): causal inference + distribution-free
  * uncertainty + kernel two-sample testing + bounded-radius centrality
  * — IPTW with a nonparametric binned propensity, split-conformal
  * prediction intervals, the linear-time MMD estimator, and
  * multi-source BFS closeness.
  *
  * Shared discipline: propensities and conformal quantiles are exact
  * integer/rank algebra (clamp-bounded bins, GlobalRank order
  * statistics); kernel terms are ·10¹²-quantized before the corpus
  * reduction; frontier expansion materializes per round
  * (localCheckpoint) exactly like the audited C370 family.
  */
object Extras217 {

  /** C872 stat_propensity_iptw — the inverse-probability-of-treatment
    * estimate of the BUILDING-segment effect on per-customer revenue,
    * with a NONPARAMETRIC propensity: 50 clamp-bounded account-balance
    * bins, p̂_b = n_treated/n_b exact. The Hájek normalizer is exact by
    * construction (Σ_treated 1/p̂ = Σ_b n_b = N), so each arm's mean is
    * Σ_b⌊Σy·n_b/n_arm,b⌉/N with per-bin quantized terms — positivity
    * violations (single-arm bins) are dropped from BOTH numerator and
    * N. The covariate-adjusted contrast a naive group-mean difference
    * confounds with balance.
    */
  def statPropensityIptw(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
      .select(col("c_custkey").as("ck"),
        (col("c_mktsegment") === "BUILDING").as("t"),
        expr("""least(greatest((CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)
                |  + 100000) div 22000, 0L), 49L)""".stripMargin).as("b"))
    val rev = orders(s, d)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"))
    val per = cust.join(rev, Seq("ck"), "left")
      .select(col("t"), col("b"), coalesce(col("y"), lit(0L)).as("y"))
      .groupBy("b")
      .agg(count(lit(1)).cast("long").as("nb"),
        sum(when(col("t"), 1L).otherwise(0L)).cast("long").as("ntb"),
        sum(when(col("t"), col("y")).otherwise(0L)).cast("decimal(38,0)").as("syt"),
        sum(when(!col("t"), col("y")).otherwise(0L)).cast("decimal(38,0)").as("syc"))
      .filter(col("ntb") > 0 && col("ntb") < col("nb"))
      .select(col("nb"),
        expr("CAST(floor(CAST(syt AS DOUBLE) * nb / ntb + 0.5) AS DECIMAL(38,0))").as("t1"),
        expr("CAST(floor(CAST(syc AS DOUBLE) * nb / (nb - ntb) + 0.5) AS DECIMAL(38,0))").as("t0"))
    per.agg(count(lit(1)).cast("long").as("n_bins_used"),
        sum(col("nb")).cast("long").as("n_used"),
        sum(col("t1")).cast("decimal(38,0)").as("st1"),
        sum(col("t0")).cast("decimal(38,0)").as("st0"))
      .selectExpr("n_bins_used", "n_used",
        "round(CAST(st1 AS DOUBLE) / n_used / 100, 4) AS mu_treated",
        "round(CAST(st0 AS DOUBLE) / n_used / 100, 4) AS mu_control",
        """round((CAST(st1 AS DOUBLE) - CAST(st0 AS DOUBLE))
          |/ n_used / 100, 4) AS ate_dollars""".stripMargin)
  }
  val statPropensityIptwSql: String =
    """WITH cust AS (
      |  SELECT c_custkey AS ck, c_mktsegment = 'BUILDING' AS t,
      |    least(greatest((CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      + 100000) // 22000, 0), 49) AS b
      |  FROM customer),
      |rev AS (
      |  SELECT o_custkey AS ck,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |bins AS (
      |  SELECT b, CAST(count(*) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ntb,
      |    CAST(sum(CASE WHEN t THEN coalesce(y, 0) ELSE 0 END) AS DECIMAL(38,0)) AS syt,
      |    CAST(sum(CASE WHEN t THEN 0 ELSE coalesce(y, 0) END) AS DECIMAL(38,0)) AS syc
      |  FROM cust LEFT JOIN rev USING (ck)
      |  GROUP BY 1),
      |per AS (
      |  SELECT nb,
      |    CAST(floor(CAST(syt AS DOUBLE) * nb / ntb + 0.5) AS DECIMAL(38,0)) AS t1,
      |    CAST(floor(CAST(syc AS DOUBLE) * nb / (nb - ntb) + 0.5) AS DECIMAL(38,0)) AS t0
      |  FROM bins WHERE ntb > 0 AND ntb < nb),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
      |    CAST(sum(nb) AS BIGINT) AS n_used,
      |    CAST(sum(t1) AS DECIMAL(38,0)) AS st1,
      |    CAST(sum(t0) AS DECIMAL(38,0)) AS st0
      |  FROM per)
      |SELECT n_bins_used, n_used,
      |  round(CAST(st1 AS DOUBLE) / n_used / 100, 4) AS mu_treated,
      |  round(CAST(st0 AS DOUBLE) / n_used / 100, 4) AS mu_control,
      |  round((CAST(st1 AS DOUBLE) - CAST(st0 AS DOUBLE)) / n_used / 100, 4) AS ate_dollars
      |FROM ag""".stripMargin

  /** C873 stat_conformal_interval — split-conformal prediction
    * intervals with a per-priority mean model: odd orderkeys calibrate
    * (group means from exact sums, nonconformity = |y−ŷ|), the
    * conformal quantile is the EXACT ⌈(n+1)·0.9⌉-th order statistic
    * off GlobalRank, and the even half reports empirical coverage —
    * which the distribution-free guarantee pins ≥ 90% in expectation
    * regardless of the revenue distribution. The uncertainty
    * attachment for any point-prediction row: no normality, no
    * variance model, one rank lookup.
    */
  def statConformalInterval(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority").as("g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("y"),
        (col("o_orderkey") % 2 === 1).as("cal"))
    val fit = base.filter(col("cal"))
      .groupBy("g")
      .agg(sum(col("y")).cast("decimal(38,0)").as("sy"),
        count(lit(1)).cast("long").as("ng"))
    val scored = base.join(broadcast(fit), "g")
      .withColumn("score", expr("abs(y - CAST(sy AS DOUBLE) / ng)"))
    val calScores = scored.filter(col("cal")).select(col("score"), col("okey"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      calScores, "rn", "nc", Seq(col("score").asc, col("okey").asc))
    // the global agg makes the broadcast side PROVABLY scalar for the
    // plan gate (the rank filter already guarantees one row)
    val qhat = ranked
      .filter(expr("rn = least(CAST(ceil(0.9 * (nc + 1)) AS BIGINT), nc)"))
      .agg(max(col("score")).as("qhat"), max(col("nc")).as("nc"))
    scored.filter(!col("cal"))
      .crossJoin(broadcast(qhat))
      .agg(max(col("nc")).as("n_cal"),
        count(lit(1)).cast("long").as("n_test"),
        max(col("qhat")).as("q0"),
        sum(when(col("score") <= col("qhat"), 1L).otherwise(0L))
          .cast("long").as("cov"))
      .selectExpr("n_cal", "n_test",
        "round(q0 / 100, 6) AS qhat_dollars",
        "round(CAST(cov AS DOUBLE) / n_test, 6) AS coverage")
  }
  val statConformalIntervalSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS okey, o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y,
      |    o_orderkey % 2 = 1 AS cal
      |  FROM orders),
      |fit AS (
      |  SELECT g, CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(count(*) AS BIGINT) AS ng
      |  FROM base WHERE cal GROUP BY 1),
      |scored AS (
      |  SELECT b.okey, b.cal, abs(b.y - CAST(f.sy AS DOUBLE) / f.ng) AS score
      |  FROM base b JOIN fit f ON b.g = f.g),
      |ranked AS (
      |  SELECT score, row_number() OVER (ORDER BY score, okey) AS rn,
      |    count(*) OVER () AS nc
      |  FROM scored WHERE cal),
      |qh AS (
      |  SELECT score AS qhat, CAST(nc AS BIGINT) AS nc FROM ranked
      |  WHERE rn = least(CAST(ceil(0.9 * (nc + 1)) AS BIGINT), nc))
      |SELECT qh.nc AS n_cal, CAST(count(*) AS BIGINT) AS n_test,
      |  round(max(qh.qhat) / 100, 6) AS qhat_dollars,
      |  round(CAST(sum(CASE WHEN s.score <= qh.qhat THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS coverage
      |FROM scored s, qh WHERE NOT s.cal
      |GROUP BY qh.nc""".stripMargin

  /** C874 stat_mmd_linear — Gretton's LINEAR-TIME maximum mean
    * discrepancy between the BUILDING and MACHINERY order-total
    * samples: md5-deterministic sample order, GlobalRank pair indices,
    * one h-statistic per disjoint quadruple
    * h = k(x₁,x₂)+k(y₁,y₂)−k(x₁,y₂)−k(x₂,y₁) with an RBF kernel whose
    * bandwidth is the exact pooled variance; every h is ·10¹²-quantized
    * before the exact corpus sum. O(n) kernel evaluations TOTAL — the
    * estimator that makes kernel two-sample testing feasible at 100 TB
    * where the O(n²) U-statistic cannot run; the metric complement of
    * the moment (Welch) and CDF (KS/W₁) families.
    */
  def statMmdLinear(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .select((col("c_mktsegment") === "BUILDING").as("ga"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        expr("md5(CAST(o_orderkey AS STRING))").as("h"), col("o_orderkey").as("okey"))
    val sig = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("cv")).cast("decimal(38,0)").as("s1"),
      sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("s2"))
      .selectExpr("""(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |/ (CAST(n AS DOUBLE) * (n - 1)) AS v2""".stripMargin)
    def pairs(flag: Boolean, x1: String, x2: String): DataFrame = {
      val part = base.filter(col("ga") === flag)
      val rn = graft.plans.GlobalRank
        .withGlobalRowNumber(part, "rn", Seq(col("h").asc, col("okey").asc))
      rn.groupBy(expr("(rn + 1) div 2").as("p"))
        .agg(max(when(col("rn") % 2 === 1, col("cv"))).as(x1),
          max(when(col("rn") % 2 === 0, col("cv"))).as(x2))
        .filter(col(x1).isNotNull && col(x2).isNotNull)
    }
    def k(a: String, b: String): String =
      s"exp(-(CAST($a AS DOUBLE) - $b) * (CAST($a AS DOUBLE) - $b) / (2 * v2))"
    pairs(flag = true, "x1", "x2").join(pairs(flag = false, "y1", "y2"), "p")
      .crossJoin(broadcast(sig))
      .select(col("v2"), expr(
        s"""CAST(floor((${k("x1", "x2")} + ${k("y1", "y2")}
           | - ${k("x1", "y2")} - ${k("x2", "y1")}) * 1e12 + 0.5) AS BIGINT)""".stripMargin)
        .as("hq"))
      .groupBy("v2")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("hq")).cast("decimal(38,0)").as("sh"))
      .selectExpr("n_pairs",
        "round(sqrt(v2) / 100, 4) AS sigma_dollars",
        "round(CAST(sh AS DOUBLE) / 1e12 / n_pairs, 9) AS mmd2")
  }
  val statMmdLinearSql: String = {
    def k(a: String, b: String): String =
      s"exp(-(CAST($a AS DOUBLE) - $b) * (CAST($a AS DOUBLE) - $b) / (2 * v2))"
    s"""WITH base AS (
      |  SELECT c_mktsegment = 'BUILDING' AS ga,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    md5(CAST(o_orderkey AS VARCHAR)) AS h, o_orderkey AS okey
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |sig AS (
      |  SELECT (CAST(count(*) AS DOUBLE) * CAST(sum(CAST(cv AS HUGEINT) * cv) AS DOUBLE)
      |      - CAST(CAST(sum(cv) AS HUGEINT) AS DOUBLE) * CAST(CAST(sum(cv) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1)) AS v2
      |  FROM base),
      |xr AS (
      |  SELECT cv, row_number() OVER (ORDER BY h, okey) AS rn
      |  FROM base WHERE ga),
      |xp AS (
      |  SELECT (rn + 1) // 2 AS p,
      |    max(CASE WHEN rn % 2 = 1 THEN cv END) AS x1,
      |    max(CASE WHEN rn % 2 = 0 THEN cv END) AS x2
      |  FROM xr GROUP BY 1),
      |yr AS (
      |  SELECT cv, row_number() OVER (ORDER BY h, okey) AS rn
      |  FROM base WHERE NOT ga),
      |yp AS (
      |  SELECT (rn + 1) // 2 AS p,
      |    max(CASE WHEN rn % 2 = 1 THEN cv END) AS y1,
      |    max(CASE WHEN rn % 2 = 0 THEN cv END) AS y2
      |  FROM yr GROUP BY 1),
      |hs AS (
      |  SELECT CAST(floor((${k("x1", "x2")} + ${k("y1", "y2")}
      |    - ${k("x1", "y2")} - ${k("x2", "y1")}) * 1e12 + 0.5) AS HUGEINT) AS hq, v2
      |  FROM xp JOIN yp USING (p), sig
      |  WHERE x1 IS NOT NULL AND x2 IS NOT NULL
      |    AND y1 IS NOT NULL AND y2 IS NOT NULL)
      |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |  round(sqrt(max(v2)) / 100, 4) AS sigma_dollars,
      |  round(CAST(sum(hq) AS DOUBLE) / 1e12 / count(*), 9) AS mmd2
      |FROM hs""".stripMargin
  }

  /** C875 graph_closeness_centrality — bounded-radius (8-hop)
    * closeness for 4 probe sources over the C370 deterministic graph:
    * ONE multi-source labeled BFS (frontier rows are (src,v) pairs, so
    * the 4 searches share every round's join), per-round eager
    * materialization exactly like `graph_bfs_levels`, then
    * closeness = (reached−1)/Σd with the 8-hop eccentricity — the
    * bounded-radius convention large-graph practice uses where true
    * closeness would need all-pairs. Complements harmonic centrality
    * (which this library already bounds the same way).
    */
  def graphClosenessCentrality(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
    val n = users.count()
    val edges = users.select(col("user_id").as("src"),
        explode(array(
          (col("user_id") + 1) % n,
          (col("user_id") + 2) % n,
          (col("user_id") * 7 + 3) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    val spark0 = users.sparkSession
    import spark0.implicits._
    var visited = Seq(0L, 1L, 2L, 3L).map(v => (v, v, 0L))
      .toDF("s", "v", "lvl").localCheckpoint(true)
    var frontier = visited.select("s", "v")
    for (kk <- 1 to 8) {
      frontier = frontier.join(edges, frontier("v") === edges("src"))
        .select(col("s"), col("dst").as("v")).distinct()
        .join(visited.select("s", "v"), Seq("s", "v"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionAll(frontier.select(col("s"), col("v"), lit(kk.toLong).as("lvl")))
        .localCheckpoint(true)
    }
    visited.groupBy("s")
      .agg(count(lit(1)).cast("long").as("n_reached"),
        max(col("lvl")).cast("long").as("ecc8"),
        sum(col("lvl")).cast("long").as("sd"))
      .selectExpr("s AS source", "n_reached", "ecc8",
        "round((CAST(n_reached AS DOUBLE) - 1) / sd, 9) AS closeness")
      .orderBy("source")
  }
  val graphClosenessCentralitySql: String = {
    val base =
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM users),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT user_id AS src, (user_id + 1) % n AS dst FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id + 2) % n FROM users, nn
        |    UNION ALL
        |    SELECT user_id, (user_id * 7 + 3) % n FROM users, nn)
        |  WHERE src <> dst),
        |v0 AS MATERIALIZED (
        |  SELECT s, s AS v, 0 AS lvl
        |  FROM (SELECT unnest([0, 1, 2, 3]) AS s))""".stripMargin
    val rounds = (1 to 8).map { kk =>
      s"""f$kk AS MATERIALIZED (
         |  SELECT DISTINCT p.s, e.dst AS v
         |  FROM v${kk - 1} p JOIN edges e ON e.src = p.v
         |  WHERE p.lvl = ${kk - 1}
         |    AND NOT EXISTS (SELECT 1 FROM v${kk - 1} q
         |                    WHERE q.s = p.s AND q.v = e.dst)),
         |v$kk AS MATERIALIZED (
         |  SELECT s, v, lvl FROM v${kk - 1}
         |  UNION ALL SELECT s, v, $kk AS lvl FROM f$kk)""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds +
      """
        |SELECT CAST(s AS BIGINT) AS source,
        |  CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(max(lvl) AS BIGINT) AS ecc8,
        |  round((CAST(count(*) AS DOUBLE) - 1) / sum(lvl), 9) AS closeness
        |FROM v8 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_propensity_iptw" -> (statPropensityIptw _),
    "stat_conformal_interval" -> (statConformalInterval _),
    "stat_mmd_linear" -> (statMmdLinear _),
    "graph_closeness_centrality" -> (graphClosenessCentrality _),
  )

  val oracle: Map[String, String] = Map(
    "stat_propensity_iptw" -> statPropensityIptwSql,
    "stat_conformal_interval" -> statConformalIntervalSql,
    "stat_mmd_linear" -> statMmdLinearSql,
    "graph_closeness_centrality" -> graphClosenessCentralitySql,
  )
}
