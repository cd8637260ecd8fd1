package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 143 (C976–C979): distribution-shape and process-control
  * completions — Lilliefors' normality KS (estimated-parameter
  * critical values, the test C706 Shapiro–Francia reads against at
  * corpus scale), Theil's uncertainty coefficient for categorical
  * association, the EWMA control chart (the memory-bearing companion
  * of C894's Western Electric rules), and Cochran's C variance-
  * homogeneity screen.
  *
  * Shared discipline: Lilliefors evaluates the Zelen–Severo Φ per
  * DISTINCT value off the GlobalRank spine and quantizes each ECDF gap
  * ·10⁹ before the integer max; uncertainty entropies quantize c·ln c
  * ·10⁶ per cell; the EWMA recursion carries z on a 0.001-cent grid
  * and the variance-inflation product on a 1e-15 grid (driver walk +
  * recursive-CTE oracle, the C968 pattern); Cochran's C normalizes
  * per-group variances by the pooled variance before ·10⁹ integer
  * max/sum.
  */
object Extras243 {

  private val phiSqlE: String => String = z =>
    s"exp(-(($z) * ($z)) / 2) / sqrt(2 * pi())"
  private val polySqlE: String => String = t =>
    s"""(($t) * (CAST(0.319381530 AS DOUBLE) + ($t) * (CAST(-0.356563782 AS DOUBLE)
       |  + ($t) * (CAST(1.781477937 AS DOUBLE) + ($t) * (CAST(-1.821255978 AS DOUBLE)
       |  + ($t) * CAST(1.330274429 AS DOUBLE))))))""".stripMargin
  private val bigPhiSqlE: String => String = z =>
    s"""CASE WHEN ($z) >= 0
       |  THEN 1 - ${phiSqlE(z)} * ${polySqlE(s"1 / (1 + CAST(0.2316419 AS DOUBLE) * ($z))")}
       |  ELSE ${phiSqlE(z)} * ${polySqlE(s"1 / (1 - CAST(0.2316419 AS DOUBLE) * ($z))")} END""".stripMargin

  /** C976 stat_lilliefors — the Lilliefors normality test of the order-
    * total distribution: D = max over the value histogram of the two
    * one-sided ECDF−Φ gaps with μ̂, σ̂ from exact moments and Φ the
    * Zelen–Severo rational (the C971 fragment), each gap quantized
    * ·10⁹ before the exact integer max. Critical 0.886/√n — the
    * estimated-parameter correction plain KS (C-line) ignores, which
    * is why naive KS-vs-fitted-normal over-accepts.
    */
  def statLilliefors(s: SparkSession, d: String): DataFrame = {
    val vals = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("v"))
    val pv = vals.groupBy("v").agg(count(lit(1)).cast("long").as("cntv"))
    val spine = graft.plans.GlobalRank.withExclusivePrefixSum(
      pv, "cb", col("cntv"), Seq(col("v").asc))
    val mom = pv.agg(sum(col("cntv")).cast("long").as("n"),
      sum(expr("CAST(cntv AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(cntv AS DECIMAL(38,0)) * v * v")).cast("decimal(38,0)").as("svv"))
      .selectExpr("n", "CAST(sv AS DOUBLE) / n AS mu",
        """sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
          |  - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          |  / (CAST(n AS DOUBLE) * (n - 1))) AS sig""".stripMargin)
    val zStr = "((v - mu) / sig)"
    spine.crossJoin(broadcast(mom))
      .selectExpr("n",
        s"""CAST(floor(greatest(
           |  abs(CAST(cb + cntv AS DOUBLE) / n - (${bigPhiSqlE(zStr)})),
           |  abs((${bigPhiSqlE(zStr)}) - CAST(cb AS DOUBLE) / n)) * 1e9 + 0.5)
           |AS BIGINT) AS dq""".stripMargin)
      .groupBy().agg(max(col("n")).as("n"), max(col("dq")).cast("long").as("dmax"))
      .selectExpr("n AS n_obs", "round(CAST(dmax AS DOUBLE) / 1e9, 6) AS d_stat",
        "round(CAST(0.886 AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 6) AS critical_05",
        "CAST(dmax AS DOUBLE) / 1e9 > CAST(0.886 AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS reject_normality")
  }
  val statLillieforsSql: String = {
    val z = "((v - mu) / sig)"
    s"""WITH pv AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS cntv
       |  FROM orders GROUP BY 1),
       |spine AS (
       |  SELECT v, cntv,
       |    CAST(coalesce(sum(cntv) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
       |  FROM pv),
       |mom AS (
       |  SELECT n, CAST(sv AS DOUBLE) / n AS mu,
       |    sqrt((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
       |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
       |      / (CAST(n AS DOUBLE) * (n - 1))) AS sig
       |  FROM (
       |    SELECT CAST(sum(cntv) AS BIGINT) AS n,
       |      CAST(sum(CAST(cntv AS HUGEINT) * v) AS DECIMAL(38,0)) AS sv,
       |      CAST(sum(CAST(cntv AS HUGEINT) * v * v) AS DECIMAL(38,0)) AS svv
       |    FROM pv)),
       |gaps AS (
       |  SELECT n,
       |    CAST(floor(greatest(
       |      abs(CAST(cb + cntv AS DOUBLE) / n - (${bigPhiSqlE(z)})),
       |      abs((${bigPhiSqlE(z)}) - CAST(cb AS DOUBLE) / n)) * 1e9 + 0.5)
       |    AS BIGINT) AS dq
       |  FROM spine, mom)
       |SELECT max(n) AS n_obs,
       |  round(CAST(max(dq) AS DOUBLE) / 1e9, 6) AS d_stat,
       |  round(CAST(0.886 AS DOUBLE) / sqrt(CAST(max(n) AS DOUBLE)), 6) AS critical_05,
       |  CAST(max(dq) AS DOUBLE) / 1e9 > CAST(0.886 AS DOUBLE) / sqrt(CAST(max(n) AS DOUBLE)) AS reject_normality
       |FROM gaps""".stripMargin
  }

  /** C977 stat_uncertainty_coeff — Theil's uncertainty coefficient for
    * the returnflag × priority contingency table: U(row|col) =
    * (H(row)+H(col)−H(row,col))/H(row), both directions plus the
    * symmetric form — the entropy-based PRE association that, unlike
    * Cramér's V, says WHICH variable predicts which. Every entropy
    * from exact counts with c·ln c quantized ·10⁶ (the C970 pattern).
    */
  def statUncertaintyCoeff(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .join(orders(s, d).selectExpr("o_orderkey AS l_orderkey", "o_orderpriority"), "l_orderkey")
      .groupBy(col("l_returnflag").as("r"), col("o_orderpriority").as("c"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .localCheckpoint(true) // bounded 3x5 table, consumed 3x
    def ent(df: DataFrame): DataFrame = df
      .agg(sum(col("k")).cast("long").as("n"),
        sum(expr("CASE WHEN k > 1 THEN CAST(floor(k * ln(CAST(k AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) ELSE 0L END"))
          .cast("decimal(38,0)").as("klnk"))
      .selectExpr("n", "ln(CAST(n AS DOUBLE)) - CAST(klnk AS DOUBLE) / 1e6 / n AS h")
    val hr = ent(cells.groupBy("r").agg(sum(col("cnt")).cast("long").as("k")))
      .selectExpr("n", "h AS hrow")
    val hc = ent(cells.groupBy("c").agg(sum(col("cnt")).cast("long").as("k")))
      .selectExpr("h AS hcol")
    val hrc = ent(cells.selectExpr("cnt AS k")).selectExpr("h AS hjoint")
    hr.crossJoin(broadcast(hc)).crossJoin(broadcast(hrc))
      .selectExpr("n AS n_items",
        "round((hrow + hcol - hjoint) / hrow, 6) AS u_row_given_col",
        "round((hrow + hcol - hjoint) / hcol, 6) AS u_col_given_row",
        "round(2 * (hrow + hcol - hjoint) / (hrow + hcol), 6) AS u_symmetric")
  }
  val statUncertaintyCoeffSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS r, o_orderpriority AS c, CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |hr AS (
      |  SELECT CAST(sum(k) AS BIGINT) AS n,
      |    ln(CAST(sum(k) AS DOUBLE)) - CAST(CAST(sum(CASE WHEN k > 1
      |      THEN CAST(floor(k * ln(CAST(k AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS DECIMAL(38,0)) AS DOUBLE) / 1e6 / sum(k) AS hrow
      |  FROM (SELECT CAST(sum(cnt) AS BIGINT) AS k FROM cells GROUP BY r)),
      |hc AS (
      |  SELECT ln(CAST(sum(k) AS DOUBLE)) - CAST(CAST(sum(CASE WHEN k > 1
      |      THEN CAST(floor(k * ln(CAST(k AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS DECIMAL(38,0)) AS DOUBLE) / 1e6 / sum(k) AS hcol
      |  FROM (SELECT CAST(sum(cnt) AS BIGINT) AS k FROM cells GROUP BY c)),
      |hrc AS (
      |  SELECT ln(CAST(sum(k) AS DOUBLE)) - CAST(CAST(sum(CASE WHEN k > 1
      |      THEN CAST(floor(k * ln(CAST(k AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS DECIMAL(38,0)) AS DOUBLE) / 1e6 / sum(k) AS hjoint
      |  FROM (SELECT cnt AS k FROM cells))
      |SELECT n AS n_items,
      |  round((hrow + hcol - hjoint) / hrow, 6) AS u_row_given_col,
      |  round((hrow + hcol - hjoint) / hcol, 6) AS u_col_given_row,
      |  round(2 * (hrow + hcol - hjoint) / (hrow + hcol), 6) AS u_symmetric
      |FROM hr, hc, hrc""".stripMargin

  /** C978 time_ewma_chart — the EWMA control chart (λ=0.2, L=3) on
    * monthly revenue: z on a 0.001-cent grid and the variance-
    * inflation factor 1−(1−λ)^{2t} on a 1e-15 grid between steps (the
    * exact-carry recursion of C968), time-varying limits μ₀ ±
    * 3σ√(λ/(2−λ)·(1−(1−λ)^{2t})). The small-persistent-shift detector
    * C894's Western Electric rules (memoryless Shewhart) structurally
    * miss. Driver walk on the bounded calendar; recursive-CTE oracle.
    */
  def timeEwmaChart(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m").collect().map(_.getLong(1))
    val n = ms.length
    val mu = ms.map(BigInt(_)).sum.toDouble / n
    val svv = ms.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val sv = ms.map(BigInt(_)).sum.toDouble
    val sig = math.sqrt((n * svv - sv * sv) / (n.toDouble * (n - 1)))
    var zq = math.floor(mu * 1e3 + 0.5).toLong
    var pq = 1000000000000000L // (1-lambda)^(2t) on the 1e15 grid
    var nsig = 0L; var first = 0L; var maxrq = 0L
    for (t <- 1 to n) {
      zq = math.floor((0.2 * ms(t - 1) + 0.8 * (zq / 1e3)) * 1e3 + 0.5).toLong
      pq = math.floor(pq / 1e15 * 0.64 * 1e15 + 0.5).toLong
      val lim = 3 * sig * math.sqrt(0.2 / 1.8 * (1 - pq / 1e15))
      val rq = math.floor(math.abs(zq / 1e3 - mu) / lim * 1e6 + 0.5).toLong
      if (rq > maxrq) maxrq = rq
      if (rq > 1000000L) { nsig += 1; if (first == 0L) first = t.toLong }
    }
    import s.implicits._
    Seq((n.toLong, nsig, first, maxrq / 1e6)).toDF("n0", "ns", "fs", "mr")
      .selectExpr("n0 AS n_months", "ns AS n_signals", "fs AS first_signal_t",
        "round(mr, 4) AS max_limit_ratio")
  }
  val timeEwmaChartSql: String =
    """WITH RECURSIVE seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS t, v FROM (
      |    SELECT date_trunc('month', o_orderdate) AS m,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |    FROM orders GROUP BY 1)),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS mu,
      |    sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS DOUBLE)
      |      - CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE)
      |        * CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE))
      |      / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) AS sig
      |  FROM seq),
      |it(t, zq, pq, nsig, firstsig, maxrq) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(floor(mu * 1e3 + 0.5) AS BIGINT),
      |    CAST(1000000000000000 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(0 AS BIGINT)
      |  FROM mom
      |  UNION ALL
      |  SELECT s2.t,
      |    CAST(floor((0.2 * s2.v + 0.8 * (it.zq / 1e3)) * 1e3 + 0.5) AS BIGINT),
      |    CAST(floor(it.pq / 1e15 * 0.64 * 1e15 + 0.5) AS BIGINT),
      |    it.nsig + CASE WHEN
      |      floor(abs(CAST(floor((0.2 * s2.v + 0.8 * (it.zq / 1e3)) * 1e3 + 0.5) AS BIGINT) / 1e3 - mu)
      |        / (3 * sig * sqrt(0.2 / 1.8 * (1 - CAST(floor(it.pq / 1e15 * 0.64 * 1e15 + 0.5) AS BIGINT) / 1e15)))
      |        * 1e6 + 0.5) > 1000000 THEN 1 ELSE 0 END,
      |    CASE WHEN it.firstsig = 0 AND
      |      floor(abs(CAST(floor((0.2 * s2.v + 0.8 * (it.zq / 1e3)) * 1e3 + 0.5) AS BIGINT) / 1e3 - mu)
      |        / (3 * sig * sqrt(0.2 / 1.8 * (1 - CAST(floor(it.pq / 1e15 * 0.64 * 1e15 + 0.5) AS BIGINT) / 1e15)))
      |        * 1e6 + 0.5) > 1000000 THEN s2.t ELSE it.firstsig END,
      |    greatest(it.maxrq,
      |      CAST(floor(abs(CAST(floor((0.2 * s2.v + 0.8 * (it.zq / 1e3)) * 1e3 + 0.5) AS BIGINT) / 1e3 - mu)
      |        / (3 * sig * sqrt(0.2 / 1.8 * (1 - CAST(floor(it.pq / 1e15 * 0.64 * 1e15 + 0.5) AS BIGINT) / 1e15)))
      |        * 1e6 + 0.5) AS BIGINT))
      |  FROM it JOIN seq s2 ON s2.t = it.t + 1 CROSS JOIN mom),
      |fin AS (SELECT * FROM it ORDER BY t DESC LIMIT 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM seq)
      |SELECT n0 AS n_months, nsig AS n_signals, firstsig AS first_signal_t,
      |  round(maxrq / 1e6, 4) AS max_limit_ratio
      |FROM fin, nn""".stripMargin

  /** C979 stat_cochran_c — Cochran's C variance-homogeneity screen
    * across the five priority groups: per-group sample variances from
    * exact moments, normalized by the pooled variance and quantized
    * ·10⁹ so max/Σ is an exact integer ratio. The "is ONE group's
    * variance dominating" screen — Bartlett (C-line) asks "are they
    * equal", C asks "is the largest an outlier", which is what breaks
    * pooled-variance models in practice.
    */
  def statCochranC(s: SparkSession, d: String): DataFrame = {
    val g = orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("sv"),
        sum(expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("svv"))
      .withColumn("s2", expr(
        """(CAST(ng AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(ng AS DOUBLE) * (ng - 1))""".stripMargin))
    val pool = orders(s, d).agg(
      count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("sv"),
      sum(expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("svv"))
      .selectExpr(
        """(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1)) AS s2p""".stripMargin)
    g.crossJoin(broadcast(pool))
      .select(col("grp"), expr("CAST(floor(s2 / s2p * 1e9 + 0.5) AS BIGINT)").as("rq"))
      .groupBy()
      .agg(count(lit(1)).cast("long").as("k"),
        max(col("rq")).as("mx"), sum(col("rq")).cast("long").as("sm"),
        max(expr("struct(rq, grp)")).as("top"))
      .selectExpr("k AS n_groups",
        "round(CAST(mx AS DOUBLE) / sm, 6) AS cochran_c",
        "top.grp AS max_var_group",
        "round(CAST(mx AS DOUBLE) / sm * k, 4) AS ratio_to_even_share")
  }
  val statCochranCSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sv,
      |    CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |      * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS svv
      |  FROM orders GROUP BY 1),
      |gs AS (
      |  SELECT grp,
      |    (CAST(ng AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      |    / (CAST(ng AS DOUBLE) * (ng - 1)) AS s2
      |  FROM g),
      |pool AS (
      |  SELECT (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (n - 1)) AS s2p
      |  FROM (
      |    SELECT CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sv,
      |      CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |        * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS svv
      |    FROM orders)),
      |rq AS (
      |  SELECT grp, CAST(floor(s2 / s2p * 1e9 + 0.5) AS BIGINT) AS rq FROM gs, pool)
      |SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |  round(CAST(max(rq) AS DOUBLE) / sum(rq), 6) AS cochran_c,
      |  (SELECT grp FROM rq ORDER BY rq DESC, grp DESC LIMIT 1) AS max_var_group,
      |  round(CAST(max(rq) AS DOUBLE) / sum(rq) * count(*), 4) AS ratio_to_even_share
      |FROM rq""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_lilliefors" -> (statLilliefors _),
    "stat_uncertainty_coeff" -> (statUncertaintyCoeff _),
    "time_ewma_chart" -> (timeEwmaChart _),
    "stat_cochran_c" -> (statCochranC _),
  )

  val oracle: Map[String, String] = Map(
    "stat_lilliefors" -> statLillieforsSql,
    "stat_uncertainty_coeff" -> statUncertaintyCoeffSql,
    "time_ewma_chart" -> timeEwmaChartSql,
    "stat_cochran_c" -> statCochranCSql,
  )
}
