package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 140 (C964–C967): stratified epidemiology + ordinal analysis +
  * GLM + inequality — Woolf's homogeneity-of-odds-ratios χ² (the
  * companion check the C646 Mantel–Haenszel pooled OR assumes), ridit
  * analysis of the priority mix by market segment, a grouped Poisson
  * regression via six fixed Newton steps, and the Palma top-10%/
  * bottom-40% inequality ratio over customer spend.
  *
  * Shared discipline: Woolf weights and log-ORs quantize ·10⁶/·10¹²
  * before the cross-stratum sums; ridits ride exact cumulative counts
  * quantized ·10¹²; the Poisson Newton carries β on the 1e-12 grid and
  * μ on the 1e-9 grid between iterations (grouped sufficient stats —
  * 11 discount strata — so no per-row exp ever sums across a
  * partition); Palma shares come off one GlobalRank row-number pass.
  */
object Extras240 {

  /** C964 stat_woolf_test — Woolf's test for homogeneity of the odds
    * ratio across order-year strata (2×2 = returned × high-quantity,
    * Haldane +0.5 correction): X² = Σw(lnORₛ − lnOR̄)² with w the
    * inverse-variance weights, both quantized before the stratum sums.
    * The check that licenses quoting ONE pooled OR — heterogeneous
    * strata make the MH summary a fiction.
    */
  def statWoolfTest(s: SparkSession, d: String): DataFrame = {
    val strata = lineitem(s, d)
      .join(orders(s, d).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"), "l_orderkey")
      .groupBy(expr("year(o_orderdate)").as("yr"))
      .agg(
        sum(expr("CASE WHEN l_returnflag = 'R' AND l_quantity > 25 THEN 1L ELSE 0L END")).cast("long").as("a"),
        sum(expr("CASE WHEN l_returnflag = 'R' AND NOT l_quantity > 25 THEN 1L ELSE 0L END")).cast("long").as("b"),
        sum(expr("CASE WHEN l_returnflag <> 'R' AND l_quantity > 25 THEN 1L ELSE 0L END")).cast("long").as("c"),
        sum(expr("CASE WHEN l_returnflag <> 'R' AND NOT l_quantity > 25 THEN 1L ELSE 0L END")).cast("long").as("dd"))
      .selectExpr("yr",
        """CAST(floor(1 / (1 / (a + CAST(0.5 AS DOUBLE)) + 1 / (b + CAST(0.5 AS DOUBLE))
          |  + 1 / (c + CAST(0.5 AS DOUBLE)) + 1 / (dd + CAST(0.5 AS DOUBLE))) * 1e6 + 0.5)
          |  AS BIGINT) AS wq""".stripMargin,
        """CAST(floor(ln((a + CAST(0.5 AS DOUBLE)) * (dd + CAST(0.5 AS DOUBLE))
          |  / ((b + CAST(0.5 AS DOUBLE)) * (c + CAST(0.5 AS DOUBLE)))) * 1e12 + 0.5)
          |  AS BIGINT) AS lq""".stripMargin)
      .localCheckpoint(true) // bounded year strata, consumed twice
    val pooled = strata.agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("wq")).cast("long").as("s1"),
      sum(expr("CAST(wq AS DECIMAL(38,0)) * lq")).cast("decimal(38,0)").as("s2"))
      .withColumn("pool", expr("CAST(s2 AS DOUBLE) / s1 / 1e12"))
    strata.crossJoin(broadcast(pooled))
      .select(col("k"), col("pool"),
        expr("""CAST(floor(wq * (CAST(lq AS DOUBLE) / 1e12 - pool)
          |* (CAST(lq AS DOUBLE) / 1e12 - pool) + 0.5) AS BIGINT)""".stripMargin).as("tq"))
      .groupBy()
      .agg(max(col("k")).as("k"), max(col("pool")).as("pool"),
        sum(col("tq")).cast("long").as("sq"))
      .selectExpr("k AS n_strata", "k - 1 AS dof",
        "round(pool, 6) AS pooled_log_or",
        "round(CAST(sq AS DOUBLE) / 1e6, 4) AS woolf_chi2")
  }
  val statWoolfTestSql: String =
    """WITH strata AS (
      |  SELECT year(o_orderdate) AS yr,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' AND l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' AND NOT l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN l_returnflag <> 'R' AND NOT l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS dd
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |qs AS (
      |  SELECT yr,
      |    CAST(floor(1 / (1 / (a + CAST(0.5 AS DOUBLE)) + 1 / (b + CAST(0.5 AS DOUBLE))
      |      + 1 / (c + CAST(0.5 AS DOUBLE)) + 1 / (dd + CAST(0.5 AS DOUBLE))) * 1e6 + 0.5)
      |      AS BIGINT) AS wq,
      |    CAST(floor(ln((a + CAST(0.5 AS DOUBLE)) * (dd + CAST(0.5 AS DOUBLE))
      |      / ((b + CAST(0.5 AS DOUBLE)) * (c + CAST(0.5 AS DOUBLE)))) * 1e12 + 0.5)
      |      AS BIGINT) AS lq
      |  FROM strata),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(wq) AS BIGINT) AS s1,
      |    CAST(sum(CAST(wq AS HUGEINT) * lq) AS DECIMAL(38,0)) AS s2
      |  FROM qs),
      |pl AS (SELECT k, CAST(s2 AS DOUBLE) / s1 / 1e12 AS pool FROM pooled),
      |terms AS (
      |  SELECT k, pool,
      |    CAST(floor(wq * (CAST(lq AS DOUBLE) / 1e12 - pool)
      |      * (CAST(lq AS DOUBLE) / 1e12 - pool) + 0.5) AS BIGINT) AS tq
      |  FROM qs, pl)
      |SELECT max(k) AS n_strata, max(k) - 1 AS dof,
      |  round(max(pool), 6) AS pooled_log_or,
      |  round(CAST(CAST(sum(tq) AS BIGINT) AS DOUBLE) / 1e6, 4) AS woolf_chi2
      |FROM terms""".stripMargin

  /** C965 stat_ridit_analysis — ridit analysis of the order-priority
    * mix by market segment: ridits from the exact cumulative reference
    * distribution (r_j = (C_{<j} + ½c_j)/N, quantized ·10¹²), mean
    * ridit per segment from exact segment×priority cell counts, z vs
    * the null ½ with SE = 1/√(12n). The ordinal "who gets the urgent
    * orders" answer a χ² of the same table throws away order to give.
    */
  def statRiditAnalysis(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .join(customer(s, d).selectExpr("c_custkey AS o_custkey", "c_mktsegment"), "o_custkey")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("j"),
        col("c_mktsegment").as("seg"))
    // r14: ONE orders⋈customer pass — the 5×5 (seg, j) cell counts are
    // pinned and the reference margin rolls up from them exactly (long
    // sums), instead of the old two full join passes (ref + cells);
    // the 5-row ridit spine is a single-task window (whitelisted: the
    // pin severs the substring(o_orderpriority) proof)
    val sj = o.groupBy("seg", "j").agg(count(lit(1)).cast("long").as("nsj"))
      .localCheckpoint(false)
    val ref = sj.groupBy("j").agg(sum(col("nsj")).cast("long").as("cj"))
    val tot = ref.agg(sum(col("cj")).cast("long").as("nn"))
    val rid = graft.plans.BoundedPrefix.prefixSum(
      ref, "cb", col("cj"), Seq(col("j").asc))
      .crossJoin(broadcast(tot))
      .selectExpr("j",
        """CAST(floor((CAST(cb AS DOUBLE) + CAST(cj AS DOUBLE) / 2) / nn * 1e12 + 0.5)
          |AS BIGINT) AS rq""".stripMargin)
    sj
      .join(broadcast(rid), "j")
      .groupBy("seg")
      .agg(sum(col("nsj")).cast("long").as("n_seg"),
        sum(expr("CAST(nsj AS DECIMAL(38,0)) * rq")).cast("decimal(38,0)").as("sr"))
      .selectExpr("seg AS segment", "n_seg",
        "CAST(sr AS DOUBLE) / n_seg / 1e12 AS mr")
      .selectExpr("segment", "n_seg", "round(mr, 6) AS mean_ridit",
        "round((mr - CAST(0.5 AS DOUBLE)) * sqrt(12 * CAST(n_seg AS DOUBLE)), 4) AS z_stat")
      .orderBy("segment")
  }
  val statRiditAnalysisSql: String =
    """WITH o AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
      |    c_mktsegment AS seg
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |ref AS (SELECT j, CAST(count(*) AS BIGINT) AS cj FROM o GROUP BY 1),
      |tot AS (SELECT CAST(sum(cj) AS BIGINT) AS nn FROM ref),
      |rid AS (
      |  SELECT j,
      |    CAST(floor((CAST(coalesce(sum(cj) OVER (ORDER BY j
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
      |      + CAST(cj AS DOUBLE) / 2) / nn * 1e12 + 0.5) AS BIGINT) AS rq
      |  FROM ref, tot),
      |seg AS (
      |  SELECT seg, j, CAST(count(*) AS BIGINT) AS nsj FROM o GROUP BY 1, 2),
      |agg AS (
      |  SELECT seg AS segment, CAST(sum(nsj) AS BIGINT) AS n_seg,
      |    CAST(CAST(sum(CAST(nsj AS HUGEINT) * rq) AS DECIMAL(38,0)) AS DOUBLE)
      |      / sum(nsj) / 1e12 AS mr
      |  FROM seg JOIN rid USING (j) GROUP BY 1)
      |SELECT segment, n_seg, round(mr, 6) AS mean_ridit,
      |  round((mr - CAST(0.5 AS DOUBLE)) * sqrt(12 * CAST(n_seg AS DOUBLE)), 4) AS z_stat
      |FROM agg ORDER BY segment""".stripMargin

  /** C966 stat_poisson_regression — Poisson GLM of line quantity on
    * discount via six fixed Newton–Raphson steps on GROUPED sufficient
    * statistics (11 discount strata — the per-row exp never crosses a
    * partition): μ on the 1e-9 grid, β on the 1e-12 grid between
    * steps, gradient/Fisher sums exact DECIMAL over xq = 100·discount
    * integers, closed-form 2×2 solve. Reports the rate ratio per 1%
    * discount — the "does discounting move volume" coefficient with a
    * proper count likelihood instead of OLS on a skewed count.
    */
  def statPoissonRegression(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("xq"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("sy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = g.map(_._2).sum
    val sy = g.map(_._3).sum
    def q12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    var b0 = q12(math.log(sy.toDouble / n)); var b1 = 0.0
    for (_ <- 1 to 6) {
      var gg1 = BigInt(0); var gg2 = BigInt(0)
      var f11 = BigInt(0); var f12 = BigInt(0); var f22 = BigInt(0)
      g.foreach { case (xq, ng, syg) =>
        val mq = BigInt(math.floor(math.exp(b0 + b1 * (xq / 100.0)) * 1e9 + 0.5).toLong)
        val r = BigInt(syg) * BigInt(1000000000L) - BigInt(ng) * mq
        gg1 += r; gg2 += r * BigInt(xq)
        val nm = BigInt(ng) * mq
        f11 += nm; f12 += nm * BigInt(xq); f22 += nm * BigInt(xq) * BigInt(xq)
      }
      val g1 = gg1.toDouble / 1e9
      val g2 = gg2.toDouble / 1e9 / 100
      val a11 = f11.toDouble / 1e9
      val a12 = f12.toDouble / 1e9 / 100
      val a22 = f22.toDouble / 1e9 / 1e4
      val det = a11 * a22 - a12 * a12
      b0 = q12(b0 + (a22 * g1 - a12 * g2) / det)
      b1 = q12(b1 + (-a12 * g1 + a11 * g2) / det)
    }
    import s.implicits._
    Seq((n, b0, b1)).toDF("n0", "b0", "b1")
      .selectExpr("n0 AS n_items", "round(b0, 6) AS beta0",
        "round(b1, 6) AS beta1",
        "round(exp(b1 / 100), 6) AS rate_ratio_per_pct")
  }
  val statPoissonRegressionSql: String = {
    // one Newton step: from bk(b0,b1) to bk+1 via the grouped stats
    def step(prev: String, next: String): String =
      s"""s$next AS (
         |  SELECT
         |    CAST(sum(sy * CAST(1000000000 AS HUGEINT)
         |      - ng * CAST(floor(exp(b0 + b1 * (xq / CAST(100 AS DOUBLE))) * 1e9 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS gg1,
         |    CAST(sum((sy * CAST(1000000000 AS HUGEINT)
         |      - ng * CAST(floor(exp(b0 + b1 * (xq / CAST(100 AS DOUBLE))) * 1e9 + 0.5) AS HUGEINT)) * xq) AS DECIMAL(38,0)) AS gg2,
         |    CAST(sum(ng * CAST(floor(exp(b0 + b1 * (xq / CAST(100 AS DOUBLE))) * 1e9 + 0.5) AS HUGEINT)) AS DECIMAL(38,0)) AS f11,
         |    CAST(sum(ng * CAST(floor(exp(b0 + b1 * (xq / CAST(100 AS DOUBLE))) * 1e9 + 0.5) AS HUGEINT) * xq) AS DECIMAL(38,0)) AS f12,
         |    CAST(sum(ng * CAST(floor(exp(b0 + b1 * (xq / CAST(100 AS DOUBLE))) * 1e9 + 0.5) AS HUGEINT) * xq * xq) AS DECIMAL(38,0)) AS f22
         |  FROM g, b$prev),
         |b$next AS (
         |  SELECT
         |    floor((b0 + ((CAST(f22 AS DOUBLE) / 1e9 / 1e4) * (CAST(gg1 AS DOUBLE) / 1e9)
         |      - (CAST(f12 AS DOUBLE) / 1e9 / 100) * (CAST(gg2 AS DOUBLE) / 1e9 / 100))
         |      / ((CAST(f11 AS DOUBLE) / 1e9) * (CAST(f22 AS DOUBLE) / 1e9 / 1e4)
         |        - (CAST(f12 AS DOUBLE) / 1e9 / 100) * (CAST(f12 AS DOUBLE) / 1e9 / 100))) * 1e12 + 0.5) / 1e12 AS b0,
         |    floor((b1 + (-(CAST(f12 AS DOUBLE) / 1e9 / 100) * (CAST(gg1 AS DOUBLE) / 1e9)
         |      + (CAST(f11 AS DOUBLE) / 1e9) * (CAST(gg2 AS DOUBLE) / 1e9 / 100))
         |      / ((CAST(f11 AS DOUBLE) / 1e9) * (CAST(f22 AS DOUBLE) / 1e9 / 1e4)
         |        - (CAST(f12 AS DOUBLE) / 1e9 / 100) * (CAST(f12 AS DOUBLE) / 1e9 / 100))) * 1e12 + 0.5) / 1e12 AS b1
         |  FROM b$prev, s$next)""".stripMargin
    s"""WITH g AS (
       |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS xq,
       |    CAST(count(*) AS BIGINT) AS ng,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy
       |  FROM lineitem GROUP BY 1),
       |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS syt FROM g),
       |b0 AS (
       |  SELECT floor(ln(CAST(syt AS DOUBLE) / n) * 1e12 + 0.5) / 1e12 AS b0,
       |    CAST(0 AS DOUBLE) AS b1 FROM tot),
       |${step("0", "1")},
       |${step("1", "2")},
       |${step("2", "3")},
       |${step("3", "4")},
       |${step("4", "5")},
       |${step("5", "6")}
       |SELECT n AS n_items, round(b0, 6) AS beta0, round(b1, 6) AS beta1,
       |  round(exp(b1 / 100), 6) AS rate_ratio_per_pct
       |FROM b6, tot""".stripMargin
  }

  /** C967 analytics_palma_ratio — the Palma inequality ratio of
    * customer lifetime spend: top-10% share over bottom-40% share,
    * customer ranks from ONE GlobalRank row-number pass in the
    * (spend, custkey) total order, exact integer spend sums on both
    * sides. The inequality summary that tracks the tails Gini blurs —
    * and the distributed-rank shape (no single-task window) that
    * survives a 100 TB customer table.
    */
  def analyticsPalmaRatio(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      spend, "rn", "nt", Seq(col("v").asc, col("ck").asc))
    ranked.groupBy()
      .agg(max(col("nt")).cast("long").as("n_cust"),
        sum(col("v")).cast("decimal(38,0)").as("tot"),
        sum(expr("CASE WHEN rn > nt - CAST(floor(nt / CAST(10 AS DOUBLE)) AS BIGINT) THEN CAST(v AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("top"),
        sum(expr("CASE WHEN rn <= CAST(floor(nt * 4 / CAST(10 AS DOUBLE)) AS BIGINT) THEN CAST(v AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("bot"))
      .selectExpr("n_cust",
        "round(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top10_share",
        "round(CAST(bot AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS bottom40_share",
        "round(CAST(top AS DOUBLE) / CAST(bot AS DOUBLE), 4) AS palma_ratio")
  }
  val analyticsPalmaRatioSql: String =
    """WITH spend AS (
      |  SELECT o_custkey AS ck,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT v, CAST(row_number() OVER (ORDER BY v, ck) AS BIGINT) AS rn,
      |    CAST(count(*) OVER () AS BIGINT) AS nt
      |  FROM spend)
      |SELECT max(nt) AS n_cust,
      |  round(CAST(CAST(sum(CASE WHEN rn > nt - CAST(floor(nt / CAST(10 AS DOUBLE)) AS BIGINT)
      |      THEN CAST(v AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE), 6) AS top10_share,
      |  round(CAST(CAST(sum(CASE WHEN rn <= CAST(floor(nt * 4 / CAST(10 AS DOUBLE)) AS BIGINT)
      |      THEN CAST(v AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(CAST(v AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE), 6) AS bottom40_share,
      |  round(CAST(CAST(sum(CASE WHEN rn > nt - CAST(floor(nt / CAST(10 AS DOUBLE)) AS BIGINT)
      |      THEN CAST(v AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(sum(CASE WHEN rn <= CAST(floor(nt * 4 / CAST(10 AS DOUBLE)) AS BIGINT)
      |      THEN CAST(v AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS DECIMAL(38,0)) AS DOUBLE), 4) AS palma_ratio
      |FROM ranked""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_woolf_test" -> (statWoolfTest _),
    "stat_ridit_analysis" -> (statRiditAnalysis _),
    "stat_poisson_regression" -> (statPoissonRegression _),
    "analytics_palma_ratio" -> (analyticsPalmaRatio _),
  )

  val oracle: Map[String, String] = Map(
    "stat_woolf_test" -> statWoolfTestSql,
    "stat_ridit_analysis" -> statRiditAnalysisSql,
    "stat_poisson_regression" -> statPoissonRegressionSql,
    "analytics_palma_ratio" -> analyticsPalmaRatioSql,
  )
}
