package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 118 (C876–C879): queueing + empirical Bayes + count-data fit +
  * moment-corrected risk — Erlang-C staffing via the stable Erlang-B
  * recursion, James–Stein shrinkage of the nation means, the
  * negative-binomial method-of-moments fit with a zero-mass audit, and
  * Cornish–Fisher VaR against the exact empirical quantile.
  *
  * Shared discipline: corpus passes produce exact integer moments
  * ONCE; scalar recursions (Erlang) run O(c) with O(1) state in both
  * engines; bounded per-group terms are quantized before their exact
  * sums; empirical quantiles ride GlobalRank.
  */
object Extras218 {

  /** C876 analytics_erlang_c — call-center staffing from the event
    * stream: arrivals = purchase events over the observed span,
    * service = the purchase `value` read as minutes, offered load
    * a = λ·E[S]. Erlang B via the overflow-stable recursion
    * B_k = a·B_{k−1}/(k + a·B_{k−1}) (never a^k/k! overflow), then
    * C = B/(1−ρ(1−B)) and ASA = C/(cμ−λ) for agents c = ⌈a⌉+1..⌈a⌉+3.
    * The recursion is O(c) SCALAR steps with O(1) state — corpus scale
    * only raises c, never a corpus-length recursion; the two corpus
    * reductions (count, Σvalue) are exact integers.
    */
  def analyticsErlangC(s: SparkSession, d: String): DataFrame = {
    val agg = events(s, d).filter(col("event_type") === "purchase")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("decimal(38,0)").as("sv"),
        min(expr("unix_micros(CAST(ts AS TIMESTAMP))")).as("t0"),
        max(expr("unix_micros(CAST(ts AS TIMESTAMP))")).as("t1"))
      .collect().head
    val n = agg.getLong(0)
    val esMin = new java.math.BigDecimal(agg.getDecimal(1).toBigInteger).doubleValue / 100 / n
    val spanMin = (agg.getLong(3) - agg.getLong(2)).toDouble / 6e7
    val lam = n / spanMin
    val a = lam * esMin
    val c0 = math.ceil(a).toLong
    import s.implicits._
    (1 to 3).map { j =>
      val c = c0 + j
      var b = 1.0
      var k = 1L
      while (k <= c) { b = a * b / (k + a * b); k += 1 }
      val rho = a / c
      val pc = b / (1 - rho * (1 - b))
      val asa = pc / (c / esMin - lam)
      (c, a, pc, asa)
    }.toDF("c0", "al", "p0", "a0")
      .selectExpr("c0 AS agents",
        "round(al, 6) AS offered_load",
        "round(p0, 6) AS p_wait",
        "round(a0, 6) AS asa_minutes")
      .orderBy("agents")
  }
  val analyticsErlangCSql: String =
    """WITH RECURSIVE agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sv,
      |    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
      |  FROM events WHERE event_type = 'purchase'),
      |par AS (
      |  SELECT n, CAST(sv AS DOUBLE) / 100 / n AS es,
      |    n / ((t1 - t0) / 6e7) AS lam,
      |    (n / ((t1 - t0) / 6e7)) * (CAST(sv AS DOUBLE) / 100 / n) AS a,
      |    CAST(ceil((n / ((t1 - t0) / 6e7)) * (CAST(sv AS DOUBLE) / 100 / n)) AS BIGINT) AS c0
      |  FROM agg),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS k, CAST(1 AS DOUBLE) AS b FROM par
      |  UNION ALL
      |  SELECT r.k + 1, p.a * r.b / ((r.k + 1) + p.a * r.b)
      |  FROM rec r, par p WHERE r.k < p.c0 + 3),
      |grid AS (
      |  SELECT r.k AS c, r.b, p.a, p.es, p.lam
      |  FROM rec r, par p WHERE r.k > p.c0 AND r.k <= p.c0 + 3),
      |ec AS (
      |  SELECT c, a, es, lam,
      |    b / (1 - (a / c) * (1 - b)) AS pc
      |  FROM grid)
      |SELECT c AS agents, round(a, 6) AS offered_load,
      |  round(pc, 6) AS p_wait,
      |  round(pc / (c / es - lam), 6) AS asa_minutes
      |FROM ec ORDER BY agents""".stripMargin

  /** C877 stat_james_stein — Efron–Morris shrinkage of the 25 nation
    * mean balances toward the grand mean: pooled within-nation variance
    * from exact cent moments, per-nation sampling variance v̂ᵢ = σ̂²/nᵢ,
    * common positive-part factor λ = max(0, 1−(k−3)·mean(v̂)/Σ(x̄ᵢ−x̄)²)
    * with every 25-way sum quantized-then-exact. The estimator that
    * DOMINATES the raw means in total squared error for k ≥ 4 — what a
    * per-nation dashboard should publish instead of noisy raw means.
    */
  def statJamesStein(s: SparkSession, d: String): DataFrame = {
    val gm = customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nat"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
      .groupBy("nat")
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("cv")).cast("decimal(38,0)").as("sg"),
        sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("qg"))
    val tot = gm.agg(count(lit(1)).cast("long").as("k"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("sg")).cast("decimal(38,0)").as("st"),
        sum(expr("""CAST(floor((CAST(qg AS DOUBLE)
          | - CAST(sg AS DOUBLE) / ng * CAST(sg AS DOUBLE)) / 1e3 + 0.5) AS BIGINT)"""
          .stripMargin)).cast("long").as("sswq"))
      .withColumn("grand", expr("CAST(st AS DOUBLE) / n"))
      .withColumn("s2", expr("CAST(sswq AS DOUBLE) * 1e3 / (n - k)"))
    val dev = gm.crossJoin(broadcast(tot))
      .select(col("k"), col("grand"), col("s2"),
        expr("""CAST(floor((CAST(sg AS DOUBLE) / ng - grand)
          |  * (CAST(sg AS DOUBLE) / ng - grand) / 1e3 + 0.5) AS BIGINT)""".stripMargin)
          .as("d2q"),
        expr("CAST(floor(s2 / ng * 1e6 + 0.5) AS BIGINT)").as("vq"))
      .groupBy("k", "grand", "s2")
      .agg(sum(col("d2q")).cast("long").as("sd2"), sum(col("vq")).cast("long").as("svq"))
      .withColumn("lam", expr(
        """greatest(CAST(0 AS DOUBLE), 1 - (CAST(k AS DOUBLE) - 3)
          |  * (CAST(svq AS DOUBLE) / 1e6 / k) / (CAST(sd2 AS DOUBLE) * 1e3))"""
          .stripMargin))
      .select("grand", "lam")
    gm.crossJoin(broadcast(dev))
      .selectExpr("nat AS nation",
        "ng AS n_cust",
        "round(CAST(sg AS DOUBLE) / ng / 100, 4) AS raw_mean",
        """round((grand + lam * (CAST(sg AS DOUBLE) / ng - grand)) / 100, 4)
          |AS shrunk_mean""".stripMargin,
        "round(lam, 6) AS lambda")
      .orderBy("nation")
  }
  val statJamesSteinSql: String =
    """WITH gm AS (
      |  SELECT n_name AS nat, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
      |      * CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS qg
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(sg) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(CAST(floor((CAST(qg AS DOUBLE)
      |      - CAST(sg AS DOUBLE) / ng * CAST(sg AS DOUBLE)) / 1e3 + 0.5) AS BIGINT)) AS BIGINT) AS sswq
      |  FROM gm),
      |tg AS (
      |  SELECT k, n, CAST(st AS DOUBLE) / n AS grand,
      |    CAST(sswq AS DOUBLE) * 1e3 / (n - k) AS s2
      |  FROM tot),
      |dev AS (
      |  SELECT t.k, t.grand, t.s2,
      |    CAST(sum(CAST(floor((CAST(g.sg AS DOUBLE) / g.ng - t.grand)
      |      * (CAST(g.sg AS DOUBLE) / g.ng - t.grand) / 1e3 + 0.5) AS BIGINT)) AS BIGINT) AS sd2,
      |    CAST(sum(CAST(floor(t.s2 / g.ng * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS svq
      |  FROM gm g, tg t GROUP BY 1, 2, 3),
      |lm AS (
      |  SELECT grand,
      |    greatest(CAST(0 AS DOUBLE), 1 - (CAST(k AS DOUBLE) - 3)
      |      * (CAST(svq AS DOUBLE) / 1e6 / k) / (CAST(sd2 AS DOUBLE) * 1e3)) AS lam
      |  FROM dev)
      |SELECT g.nat AS nation, g.ng AS n_cust,
      |  round(CAST(g.sg AS DOUBLE) / g.ng / 100, 4) AS raw_mean,
      |  round((l.grand + l.lam * (CAST(g.sg AS DOUBLE) / g.ng - l.grand)) / 100, 4)
      |    AS shrunk_mean,
      |  round(l.lam, 6) AS lambda
      |FROM gm g, lm l ORDER BY nation""".stripMargin

  /** C878 stat_negbin_fit_mom — the negative-binomial
    * method-of-moments fit to per-customer order counts (zeros
    * included via the left join): m and v from exact integer sums,
    * r = m²/(v−m), p = m/v, and the ZERO-MASS AUDIT — fitted
    * P(X=0) = (r/(r+m))^r vs the exact empirical zero fraction, the
    * one-number check that catches a Poisson-like fit forced onto
    * overdispersed counts.
    */
  def statNegbinFitMom(s: SparkSession, d: String): DataFrame = {
    val cnt = customer(s, d).select(col("c_custkey").as("ck"))
      .join(orders(s, d).groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).cast("long").as("c")), Seq("ck"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
    cnt.agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("s1"),
        sum(expr("c * c")).cast("long").as("s2"),
        sum(when(col("c") === 0L, 1L).otherwise(0L)).cast("long").as("z"))
      .selectExpr("n", "z",
        "CAST(s1 AS DOUBLE) / n AS m",
        """(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
          |/ (CAST(n AS DOUBLE) * (n - 1)) AS v""".stripMargin)
      .selectExpr("n", "round(m, 6) AS mean_orders", "round(v, 6) AS var_orders",
        "round(m * m / (v - m), 6) AS r_size",
        "round(m / v, 6) AS p_prob",
        "round(pow((m * m / (v - m)) / ((m * m / (v - m)) + m), m * m / (v - m)), 6) AS p0_fitted",
        "round(CAST(z AS DOUBLE) / n, 6) AS p0_empirical")
  }
  val statNegbinFitMomSql: String =
    """WITH cnt AS (
      |  SELECT coalesce(o.c, 0) AS c
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS c
      |    FROM orders GROUP BY 1) o ON customer.c_custkey = o.ck),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s1,
      |    CAST(sum(c * c) AS BIGINT) AS s2,
      |    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
      |  FROM cnt),
      |mm AS (
      |  SELECT n, z, CAST(s1 AS DOUBLE) / n AS m,
      |    (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
      |      / (CAST(n AS DOUBLE) * (n - 1)) AS v
      |  FROM ag)
      |SELECT n, round(m, 6) AS mean_orders, round(v, 6) AS var_orders,
      |  round(m * m / (v - m), 6) AS r_size,
      |  round(m / v, 6) AS p_prob,
      |  round(pow((m * m / (v - m)) / ((m * m / (v - m)) + m), m * m / (v - m)), 6) AS p0_fitted,
      |  round(CAST(z AS DOUBLE) / n, 6) AS p0_empirical
      |FROM mm""".stripMargin

  /** C879 stat_cornish_fisher_var — moment-corrected 95%/99% revenue
    * quantiles: exact Σx/Σx²/Σx³/Σx⁴ DECIMAL cent moments → skewness
    * and excess kurtosis, the Cornish–Fisher expansion
    * z_cf = z + (z²−1)s/6 + (z³−3z)κ/24 − (2z³−5z)s²/36, VaR = μ+σ·z_cf
    * — side by side with the EXACT empirical order statistic off
    * GlobalRank at the same tail. The audit says how far a
    * moment-based risk engine diverges from the true tail on this
    * corpus. Skew/kurtosis come from STANDARDIZED per-row z-powers
    * (z³, z⁴ are O(1), ·10⁹-quantized, exact BIGINT sums) — the
    * magnitude-safe discipline: raw fourth moments of cent values
    * would overflow DECIMAL(38,0) past sf10.
    */
  def statCornishFisherVar(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"),
        col("o_orderkey").as("okey"))
    val mom1 = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("cv")).cast("decimal(38,0)").as("s1"),
      sum(expr("CAST(cv AS DECIMAL(38,0)) * cv")).cast("decimal(38,0)").as("s2"))
      .selectExpr("n", "CAST(s1 AS DOUBLE) / n AS mu",
        """sqrt(CAST(s2 AS DOUBLE) / n
          |- (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd""".stripMargin)
    val mom = base.crossJoin(broadcast(mom1))
      .select(col("n"), col("mu"), col("sd"),
        expr("CAST(floor(((cv - mu) / sd) * ((cv - mu) / sd) * ((cv - mu) / sd) * 1e9 + 0.5) AS BIGINT)").as("z3q"),
        expr("CAST(floor(((cv - mu) / sd) * ((cv - mu) / sd) * ((cv - mu) / sd) * ((cv - mu) / sd) * 1e9 + 0.5) AS BIGINT)").as("z4q"))
      .groupBy("n", "mu", "sd")
      .agg(sum(col("z3q")).cast("decimal(38,0)").as("sz3"),
        sum(col("z4q")).cast("decimal(38,0)").as("sz4"))
      .selectExpr("n", "mu", "sd",
        "CAST(sz3 AS DOUBLE) / 1e9 / n AS skew",
        "CAST(sz4 AS DOUBLE) / 1e9 / n - 3 AS exkurt")
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "rn", "nn", Seq(col("cv").asc, col("okey").asc))
    val emp = ranked.filter(expr(
      """rn = CAST(ceil(0.95 * nn) AS BIGINT)
        | OR rn = CAST(ceil(0.99 * nn) AS BIGINT)""".stripMargin))
      .agg(min(expr("CASE WHEN rn = CAST(ceil(0.95 * nn) AS BIGINT) THEN cv END")).as("e95"),
        min(expr("CASE WHEN rn = CAST(ceil(0.99 * nn) AS BIGINT) THEN cv END")).as("e99"))
    def zcf(z: String): String =
      s"""($z + (($z) * ($z) - 1) * skew / 6
         | + (($z) * ($z) * ($z) - 3 * ($z)) * exkurt / 24
         | - (2 * ($z) * ($z) * ($z) - 5 * ($z)) * skew * skew / 36)""".stripMargin
    mom.crossJoin(broadcast(emp))
      .selectExpr("n", "round(skew, 6) AS skew", "round(exkurt, 6) AS exkurt",
        s"round((mu + sd * ${zcf("CAST(1.6448536269514722 AS DOUBLE)")}) / 100, 2) AS cf_var95",
        "round(CAST(e95 AS DOUBLE) / 100, 2) AS emp_var95",
        s"round((mu + sd * ${zcf("CAST(2.3263478740408408 AS DOUBLE)")}) / 100, 2) AS cf_var99",
        "round(CAST(e99 AS DOUBLE) / 100, 2) AS emp_var99")
  }
  val statCornishFisherVarSql: String = {
    def zcf(z: String): String =
      s"""($z + (($z) * ($z) - 1) * skew / 6
         | + (($z) * ($z) * ($z) - 3 * ($z)) * exkurt / 24
         | - (2 * ($z) * ($z) * ($z) - 5 * ($z)) * skew * skew / 36)""".stripMargin
    s"""WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv,
      |    o_orderkey AS okey
      |  FROM orders),
      |mom1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(cv) AS DECIMAL(38,0)) AS DOUBLE) / count(*) AS mu,
      |    sqrt(CAST(CAST(sum(CAST(cv AS HUGEINT) * cv) AS DECIMAL(38,0)) AS DOUBLE) / count(*)
      |      - (CAST(CAST(sum(cv) AS DECIMAL(38,0)) AS DOUBLE) / count(*))
      |        * (CAST(CAST(sum(cv) AS DECIMAL(38,0)) AS DOUBLE) / count(*))) AS sd
      |  FROM base),
      |zq AS (
      |  SELECT m.n, m.mu, m.sd,
      |    CAST(floor(((b.cv - m.mu) / m.sd) * ((b.cv - m.mu) / m.sd)
      |      * ((b.cv - m.mu) / m.sd) * 1e9 + 0.5) AS HUGEINT) AS z3q,
      |    CAST(floor(((b.cv - m.mu) / m.sd) * ((b.cv - m.mu) / m.sd)
      |      * ((b.cv - m.mu) / m.sd) * ((b.cv - m.mu) / m.sd) * 1e9 + 0.5) AS HUGEINT) AS z4q
      |  FROM base b, mom1 m),
      |sk AS (
      |  SELECT n, mu, sd,
      |    CAST(CAST(sum(z3q) AS DECIMAL(38,0)) AS DOUBLE) / 1e9 / n AS skew,
      |    CAST(CAST(sum(z4q) AS DECIMAL(38,0)) AS DOUBLE) / 1e9 / n - 3 AS exkurt
      |  FROM zq GROUP BY n, mu, sd),
      |ranked AS (
      |  SELECT cv, row_number() OVER (ORDER BY cv, okey) AS rn,
      |    count(*) OVER () AS nn
      |  FROM base),
      |emp AS (
      |  SELECT min(CASE WHEN rn = CAST(ceil(0.95 * nn) AS BIGINT) THEN cv END) AS e95,
      |    min(CASE WHEN rn = CAST(ceil(0.99 * nn) AS BIGINT) THEN cv END) AS e99
      |  FROM ranked
      |  WHERE rn = CAST(ceil(0.95 * nn) AS BIGINT)
      |     OR rn = CAST(ceil(0.99 * nn) AS BIGINT))
      |SELECT n, round(skew, 6) AS skew, round(exkurt, 6) AS exkurt,
      |  round((mu + sd * ${zcf("CAST(1.6448536269514722 AS DOUBLE)")}) / 100, 2) AS cf_var95,
      |  round(CAST(e95 AS DOUBLE) / 100, 2) AS emp_var95,
      |  round((mu + sd * ${zcf("CAST(2.3263478740408408 AS DOUBLE)")}) / 100, 2) AS cf_var99,
      |  round(CAST(e99 AS DOUBLE) / 100, 2) AS emp_var99
      |FROM sk, emp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_erlang_c" -> (analyticsErlangC _),
    "stat_james_stein" -> (statJamesStein _),
    "stat_negbin_fit_mom" -> (statNegbinFitMom _),
    "stat_cornish_fisher_var" -> (statCornishFisherVar _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_erlang_c" -> analyticsErlangCSql,
    "stat_james_stein" -> statJamesSteinSql,
    "stat_negbin_fit_mom" -> statNegbinFitMomSql,
    "stat_cornish_fisher_var" -> statCornishFisherVarSql,
  )
}
