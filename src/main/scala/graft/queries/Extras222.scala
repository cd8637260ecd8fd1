package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 122 (C892–C895): covariance shrinkage + control-chart rules +
  * importance-weight diagnostics + damped-trend forecasting —
  * Ledoit–Wolf shrinkage intensity from one Gram pass, the Western
  * Electric run-rules census, the PSIS k̂ tail diagnostic, and damped
  * Holt smoothing.
  *
  * Shared discipline: the Gram matrix is the C644-style map-side
  * bucketed pair-product pass; Frobenius reductions quantize per
  * ENTRY so the 4096-term sums are exact; run rules compare exact cent
  * values against moment-derived limits inside calendar-bounded
  * windows; the GPD tail fit rides GlobalRank rank algebra.
  */
object Extras222 {

  /** C892 embed_ledoit_wolf — the Ledoit–Wolf shrinkage intensity for
    * the embedding second-moment matrix S = (1/n)Σxx′ toward the
    * spherical target μI: ONE map-side Gram pass (exact ·10¹²-scaled
    * integer pair products, bucketed LONG partials), per-entry
    * ·10⁹-quantized Frobenius terms so ‖S‖²_F and δ² = ‖S−μI‖²_F are
    * exact 4096-term sums, β̃² = (Σ‖x‖⁴/n² − ‖S‖²_F/n) from the exact
    * per-row quartic, λ* = clip(β̃²/δ²). The estimator every
    * whitening / Mahalanobis / LDA step should use instead of the raw
    * sample covariance when d is not ≪ n.
    */
  def embedLedoitWolf(s: SparkSession, d: String): DataFrame = {
    val nv = embeddings(s, d).count()
    val buckets = math.max(32L, nv / 1000000L + 1L)
    val arr = embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))")
        .as("fa"))
    val pairs = arr
      .select(pmod(col("vec_id"), lit(buckets)).as("b"),
        col("fa"), posexplode(col("fa")).as(Seq("i0", "fi")))
      .select(col("b"), (col("i0") + 1).as("i"),
        posexplode(expr("transform(fa, y -> fi * y)")).as(Seq("j0", "p")))
      .select(col("b"), col("i"), (col("j0") + 1).as("j"), col("p"))
    val g = pairs.groupBy("i", "j", "b").agg(sum(col("p")).as("ps"))
      .groupBy("i", "j")
      .agg(sum(col("ps").cast("decimal(38,0)")).as("sxy"))
      .select(col("i"), col("j"),
        expr(s"CAST(sxy AS DOUBLE) / $nv / 1e12").as("sij"))
    val frob = g.select(
        expr("CAST(floor(sij * sij * 1e9 + 0.5) AS BIGINT)").as("f2q"),
        expr("CASE WHEN i = j THEN CAST(floor(sij * 1e9 + 0.5) AS BIGINT) ELSE 0L END").as("trq"))
      .agg(sum(col("f2q")).cast("decimal(38,0)").as("sf2"),
        sum(col("trq")).cast("long").as("str"))
      .selectExpr("CAST(sf2 AS DOUBLE) / 1e9 AS frob2",
        "CAST(str AS DOUBLE) / 1e9 / 64 AS mu")
    val quart = arr.select(expr(
        "aggregate(fa, 0L, (acc, x) -> acc + x * x)").as("nq"))
      .select(expr("CAST(nq AS DECIMAL(38,0)) * nq").as("q4"))
      .agg(sum(col("q4")).cast("decimal(38,0)").as("sq4"))
    frob.crossJoin(broadcast(quart))
      .selectExpr(s"CAST($nv AS BIGINT) AS n", "CAST(64 AS BIGINT) AS d",
        "round(mu, 8) AS mu",
        "round(frob2, 8) AS frob2_s",
        "round(frob2 - 64 * mu * mu, 8) AS delta2",
        s"""round(least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
           |  (CAST(sq4 AS DOUBLE) / 1e24 / CAST($nv AS DOUBLE) / $nv
           |   - frob2 / $nv)
           |  / (frob2 - 64 * mu * mu))), 6) AS lambda_star""".stripMargin)
  }
  val embedLedoitWolfSql: String =
    """WITH arr AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS fa
      |  FROM embeddings),
      |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM arr),
      |px AS (
      |  SELECT i.i, unnest(fa) AS fj,
      |    unnest(generate_series(1, len(fa))) AS j, fa[i.i] AS fi
      |  FROM arr, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |g AS (
      |  SELECT i, j,
      |    CAST(CAST(sum(CAST(fi AS HUGEINT) * fj) AS HUGEINT) AS DOUBLE)
      |      / (SELECT n FROM nv) / 1e12 AS sij
      |  FROM px GROUP BY 1, 2),
      |frob AS (
      |  SELECT
      |    CAST(CAST(sum(CAST(floor(sij * sij * 1e9 + 0.5) AS HUGEINT)) AS HUGEINT) AS DOUBLE) / 1e9 AS frob2,
      |    CAST(CAST(sum(CASE WHEN i = j THEN CAST(floor(sij * 1e9 + 0.5) AS HUGEINT) ELSE 0 END) AS HUGEINT) AS DOUBLE) / 1e9 / 64 AS mu
      |  FROM g),
      |quart AS (
      |  SELECT CAST(sum(nq * nq) AS DECIMAL(38,0)) AS sq4 FROM (
      |    SELECT CAST(list_sum(list_transform(fa,
      |      x -> CAST(x AS HUGEINT) * x)) AS HUGEINT) AS nq
      |    FROM arr))
      |SELECT nv.n, CAST(64 AS BIGINT) AS d,
      |  round(f.mu, 8) AS mu,
      |  round(f.frob2, 8) AS frob2_s,
      |  round(f.frob2 - 64 * f.mu * f.mu, 8) AS delta2,
      |  round(least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
      |    (CAST(q.sq4 AS DOUBLE) / 1e24 / CAST(nv.n AS DOUBLE) / nv.n
      |     - f.frob2 / nv.n)
      |    / (f.frob2 - 64 * f.mu * f.mu))), 6) AS lambda_star
      |FROM frob f, quart q, nv""".stripMargin

  /** C893 time_control_rules — the Western Electric run-rules census
    * on the daily-revenue Shewhart chart: center/σ from exact cent
    * moments, then per day (calendar-bounded frame) rule 1 = beyond
    * 3σ, rule 2 = ≥2 of 3 beyond 2σ same side, rule 3 = ≥4 of 5 beyond
    * 1σ same side, rule 4 = 8 consecutive same side — each a bounded
    * ROWS window over the daily aggregate. The alarm census an SPC
    * dashboard publishes, not just the chart.
    */
  def timeControlRules(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
    val mom = days.agg(count(lit(1)).cast("long").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("s1"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).cast("decimal(38,0)").as("s2"))
      .selectExpr("n", "CAST(s1 AS DOUBLE) / n AS c",
        """sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
          | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |/ (CAST(n AS DOUBLE) * (n - 1))) AS sd""".stripMargin)
    val flagged = days.crossJoin(broadcast(mom))
      .select(col("day"), col("n"),
        when(col("v") > expr("c + 3 * sd"), 1L)
          .when(col("v") < expr("c - 3 * sd"), 1L).otherwise(0L).as("r1"),
        when(col("v") > expr("c + 2 * sd"), 1L).otherwise(0L).as("hi2"),
        when(col("v") < expr("c - 2 * sd"), 1L).otherwise(0L).as("lo2"),
        when(col("v") > expr("c + 1 * sd"), 1L).otherwise(0L).as("hi1"),
        when(col("v") < expr("c - 1 * sd"), 1L).otherwise(0L).as("lo1"),
        when(col("v") > col("c"), 1L).otherwise(0L).as("hi0"),
        when(col("v") < col("c"), 1L).otherwise(0L).as("lo0"))
    def wLast(k: Int) = Window.orderBy("day").rowsBetween(-(k - 1), 0)
    val rules = flagged
      .withColumn("r2", when(
        sum(col("hi2")).over(wLast(3)) >= 2 || sum(col("lo2")).over(wLast(3)) >= 2, 1L)
        .otherwise(0L))
      .withColumn("r3", when(
        sum(col("hi1")).over(wLast(5)) >= 4 || sum(col("lo1")).over(wLast(5)) >= 4, 1L)
        .otherwise(0L))
      .withColumn("r4", when(
        sum(col("hi0")).over(wLast(8)) >= 8 || sum(col("lo0")).over(wLast(8)) >= 8, 1L)
        .otherwise(0L))
    rules.groupBy("n")
      .agg(sum(col("r1")).cast("long").as("rule1_beyond3"),
        sum(col("r2")).cast("long").as("rule2_2of3"),
        sum(col("r3")).cast("long").as("rule3_4of5"),
        sum(col("r4")).cast("long").as("rule4_run8"),
        sum(when(col("r1") + col("r2") + col("r3") + col("r4") > 0, 1L).otherwise(0L))
          .cast("long").as("any_alarm"))
      .selectExpr("n AS n_days", "rule1_beyond3", "rule2_2of3", "rule3_4of5",
        "rule4_run8", "any_alarm")
  }
  val timeControlRulesSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(v) AS HUGEINT) AS DOUBLE) / count(*) AS c,
      |    sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS DOUBLE)
      |      - CAST(CAST(sum(v) AS HUGEINT) AS DOUBLE) * CAST(CAST(sum(v) AS HUGEINT) AS DOUBLE))
      |    / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) AS sd
      |  FROM days),
      |fl AS (
      |  SELECT day, n,
      |    CASE WHEN v > c + 3 * sd OR v < c - 3 * sd THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN v > c + 2 * sd THEN 1 ELSE 0 END AS hi2,
      |    CASE WHEN v < c - 2 * sd THEN 1 ELSE 0 END AS lo2,
      |    CASE WHEN v > c + 1 * sd THEN 1 ELSE 0 END AS hi1,
      |    CASE WHEN v < c - 1 * sd THEN 1 ELSE 0 END AS lo1,
      |    CASE WHEN v > c THEN 1 ELSE 0 END AS hi0,
      |    CASE WHEN v < c THEN 1 ELSE 0 END AS lo0
      |  FROM days, mom),
      |rl AS (
      |  SELECT n, r1,
      |    CASE WHEN sum(hi2) OVER w3 >= 2 OR sum(lo2) OVER w3 >= 2 THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN sum(hi1) OVER w5 >= 4 OR sum(lo1) OVER w5 >= 4 THEN 1 ELSE 0 END AS r3,
      |    CASE WHEN sum(hi0) OVER w8 >= 8 OR sum(lo0) OVER w8 >= 8 THEN 1 ELSE 0 END AS r4
      |  FROM fl
      |  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |    w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |    w8 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      |SELECT n AS n_days,
      |  CAST(sum(r1) AS BIGINT) AS rule1_beyond3,
      |  CAST(sum(r2) AS BIGINT) AS rule2_2of3,
      |  CAST(sum(r3) AS BIGINT) AS rule3_4of5,
      |  CAST(sum(r4) AS BIGINT) AS rule4_run8,
      |  CAST(sum(CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS any_alarm
      |FROM rl GROUP BY n""".stripMargin

  /** C894 sample_psis_khat — the Pareto-smoothed-importance-sampling
    * diagnostic: importance weights w ∝ order total (uniform proposal →
    * price-proportional target), the top-20% tail off GlobalRank, GPD
    * fitted to threshold excesses by probability-weighted moments
    * (exact rank algebra, the C822 formulas), k̂ = ξ̂ with Vehtari's
    * verdict bands (<0.5 reliable, <0.7 usable, else unreliable). The
    * one-number health check for ANY weighted estimator this library
    * emits — dedup weights, IPTW, PPS — before trusting its variance.
    */
  def samplePsisKhat(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("w"),
        col("o_orderkey").as("okey"))
    val ranked = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(base, "rn", "nn", Seq(col("w").asc, col("okey").asc))
    // tail = ranks above the 80th percentile; threshold = the 80th-pct value
    val thr = ranked.filter(expr("rn = CAST(ceil(0.8 * nn) AS BIGINT)"))
      .agg(max(col("w")).as("u"), max(col("nn")).as("nn0"))
    val tail = ranked.crossJoin(broadcast(thr))
      .filter(expr("rn > CAST(ceil(0.8 * nn0) AS BIGINT)"))
      .select(expr("w - u").as("y"), col("okey"))
    val tr = graft.plans.GlobalRank
      .withGlobalRowNumberAndTotal(tail, "i", "m", Seq(col("y").asc, col("okey").asc))
    tr.agg(max(col("m")).as("m"),
        sum(col("y")).cast("decimal(38,0)").as("b0s"),
        sum(expr("CAST(i - 1 AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").as("b1s"))
      .selectExpr("m",
        "CAST(b0s AS DOUBLE) / m AS b0",
        "CAST(b1s AS DOUBLE) / (CAST(m AS DOUBLE) * (m - 1)) AS b1")
      .selectExpr("m AS n_tail",
        "round(2 - b0 / (2 * b1 - b0), 6) AS khat",
        "round(2 * b0 * (b0 - b1) / (2 * b1 - b0) / 100, 6) AS sigma_dollars",
        """CASE WHEN 2 - b0 / (2 * b1 - b0) < 0.5 THEN 'reliable'
          |     WHEN 2 - b0 / (2 * b1 - b0) < 0.7 THEN 'usable'
          |     ELSE 'unreliable' END AS verdict""".stripMargin)
  }
  val samplePsisKhatSql: String =
    """WITH base AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS w,
      |    o_orderkey AS okey
      |  FROM orders),
      |ranked AS (
      |  SELECT w, okey, row_number() OVER (ORDER BY w, okey) AS rn,
      |    count(*) OVER () AS nn
      |  FROM base),
      |thr AS (
      |  SELECT max(w) AS u, max(nn) AS nn0 FROM ranked
      |  WHERE rn = CAST(ceil(0.8 * nn) AS BIGINT)),
      |tail AS (
      |  SELECT r.w - t.u AS y, r.okey
      |  FROM ranked r, thr t WHERE r.rn > CAST(ceil(0.8 * t.nn0) AS BIGINT)),
      |tr AS (
      |  SELECT y, row_number() OVER (ORDER BY y, okey) AS i,
      |    count(*) OVER () AS m
      |  FROM tail),
      |pwm AS (
      |  SELECT CAST(max(m) AS BIGINT) AS m,
      |    CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) / max(m) AS b0,
      |    CAST(CAST(sum(CAST(i - 1 AS HUGEINT) * y) AS HUGEINT) AS DOUBLE)
      |      / (CAST(max(m) AS DOUBLE) * (max(m) - 1)) AS b1
      |  FROM tr)
      |SELECT m AS n_tail,
      |  round(2 - b0 / (2 * b1 - b0), 6) AS khat,
      |  round(2 * b0 * (b0 - b1) / (2 * b1 - b0) / 100, 6) AS sigma_dollars,
      |  CASE WHEN 2 - b0 / (2 * b1 - b0) < 0.5 THEN 'reliable'
      |       WHEN 2 - b0 / (2 * b1 - b0) < 0.7 THEN 'usable'
      |       ELSE 'unreliable' END AS verdict
      |FROM pwm""".stripMargin

  /** C895 time_holt_damped — damped-trend Holt smoothing
    * (α=0.3, β=0.1, φ=0.9) of monthly revenue — ETS(A,Ad,N), the
    * M-competition default that beats plain Holt by not extrapolating
    * trends forever: lₜ = αxₜ + (1−α)(l+φb), bₜ = β(lₜ−l) + (1−β)φb,
    * forecasts f_h = l + (φ+…+φʰ)b. Scala loop over the bounded month
    * dictionary vs recursive-CTE oracle, identical literals.
    */
  def timeHoltDamped(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = ms.length
    var l = ms(0).toDouble
    var b = ms(1).toDouble - ms(0)
    for (t <- 1 until n) {
      val lp = l
      l = 0.3 * ms(t) + 0.7 * (lp + 0.9 * b)
      b = 0.1 * (l - lp) + 0.9 * 0.9 * b
    }
    val f1 = l + 0.9 * b
    val f3 = l + (0.9 + 0.81 + 0.729) * b
    import s.implicits._
    Seq((n.toLong, l, b, f1, f3)).toDF("n0", "l0", "b0", "x1", "x3")
      .selectExpr("n0 AS n_months",
        "round(l0 / 100, 2) AS level_dollars",
        "round(b0 / 100, 4) AS trend_dollars",
        "round(x1 / 100, 2) AS forecast_1m",
        "round(x3 / 100, 2) AS forecast_3m")
  }
  val timeHoltDampedSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t,
      |    CAST(v AS DOUBLE) AS x
      |  FROM monthly),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |init AS (
      |  SELECT a.x AS l, b.x - a.x AS b
      |  FROM seq a, seq b WHERE a.t = 0 AND b.t = 1),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t, i.l, i.b FROM init i
      |  UNION ALL
      |  SELECT r.t + 1,
      |    0.3 * q.x + 0.7 * (r.l + 0.9 * r.b),
      |    0.1 * ((0.3 * q.x + 0.7 * (r.l + 0.9 * r.b)) - r.l) + 0.9 * 0.9 * r.b
      |  FROM rec r JOIN seq q ON q.t = r.t + 1),
      |fin AS (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1)
      |SELECT nn.n AS n_months,
      |  round(f.l / 100, 2) AS level_dollars,
      |  round(f.b / 100, 4) AS trend_dollars,
      |  round((f.l + 0.9 * f.b) / 100, 2) AS forecast_1m,
      |  round((f.l + (0.9 + 0.81 + 0.729) * f.b) / 100, 2) AS forecast_3m
      |FROM fin f, nn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_ledoit_wolf" -> (embedLedoitWolf _),
    "time_control_rules" -> (timeControlRules _),
    "sample_psis_khat" -> (samplePsisKhat _),
    "time_holt_damped" -> (timeHoltDamped _),
  )

  val oracle: Map[String, String] = Map(
    "embed_ledoit_wolf" -> embedLedoitWolfSql,
    "time_control_rules" -> timeControlRulesSql,
    "sample_psis_khat" -> samplePsisKhatSql,
    "time_holt_damped" -> timeHoltDampedSql,
  )
}
