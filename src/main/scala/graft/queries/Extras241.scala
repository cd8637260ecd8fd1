package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 141 (C968–C971): sequential decoding + absorbing chains +
  * entropy geometry + the GLM family completion — Viterbi decoding of
  * a 2-state HMM over the daily up/down sequence (exact max-product on
  * integer log-probs), expected absorption time of the event funnel's
  * Markov chain, the Rényi entropy profile of the token distribution
  * (α ∈ {0,½,1,2,∞}), and a probit regression via Fisher scoring on
  * grouped strata (logit C880 / Poisson C966 get their third sibling).
  *
  * Shared discipline: Viterbi scores are exact BIGINT sums of ·10¹²-
  * floored log-prob literals (max-product never touches a float);
  * absorption times iterate 60 fixed Jacobi steps on the 1e-9 grid;
  * Rényi sums quantize per-token √c and c·ln c before the corpus
  * aggregation; probit carries μ and φ on the 1e-9 grid and β on the
  * 1e-12 grid between its six scoring steps, with the Zelen–Severo
  * rational Φ written identically in both engines.
  */
object Extras241 {

  /** C968 time_viterbi_hmm — exact Viterbi decode of a declared
    * 2-state HMM (bear emits up-days w.p. 0.4, bull w.p. 0.6, stay
    * 0.9) over the daily revenue up/down bit sequence: the DP runs on
    * integer ·10¹²-floored log-probabilities so the max-product
    * trajectory is exact — no float drift over the ~2400-step chain.
    * Reports the terminal log-score, terminal state, and how many
    * prefixes argmax to bull — the regime-shading every drawdown
    * post-mortem wants. Driver-side walk on the bounded day calendar;
    * the oracle replays with a recursive CTE.
    */
  def timeViterbiHmm(s: SparkSession, d: String): DataFrame = {
    val days = orders(s, d)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("day").collect().map(_.getLong(1))
    val bits = days.sliding(2).map(p => p(1) > p(0)).toArray
    def lq(p: Double): Long = math.floor(math.log(p) * 1e12).toLong
    val (stay, switchL) = (lq(0.9), lq(0.1))
    val (e0up, e0dn, e1up, e1dn) = (lq(0.4), lq(0.6), lq(0.6), lq(0.4))
    val init = lq(0.5)
    var s0 = init + (if (bits(0)) e0up else e0dn)
    var s1 = init + (if (bits(0)) e1up else e1dn)
    var c1 = if (s1 > s0) 1L else 0L
    bits.drop(1).foreach { b =>
      val n0 = math.max(s0 + stay, s1 + switchL) + (if (b) e0up else e0dn)
      val n1 = math.max(s0 + switchL, s1 + stay) + (if (b) e1up else e1dn)
      s0 = n0; s1 = n1
      if (s1 > s0) c1 += 1
    }
    import s.implicits._
    Seq((bits.length.toLong, math.max(s0, s1), if (s1 > s0) 1L else 0L, c1))
      .toDF("n0", "sc", "st", "c1")
      .selectExpr("n0 AS n_steps", "round(CAST(sc AS DOUBLE) / 1e12, 6) AS viterbi_logscore",
        "st AS final_state_bull", "c1 AS n_prefix_bull")
  }
  val timeViterbiHmmSql: String =
    """WITH RECURSIVE days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |bits AS (
      |  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t,
      |    v > lag(v, 1) OVER (ORDER BY day) AS b
      |  FROM days QUALIFY lag(v, 1) OVER (ORDER BY day) IS NOT NULL),
      |lp AS (
      |  SELECT CAST(floor(ln(CAST(0.9 AS DOUBLE)) * 1e12) AS BIGINT) AS stay,
      |    CAST(floor(ln(CAST(0.1 AS DOUBLE)) * 1e12) AS BIGINT) AS sw,
      |    CAST(floor(ln(CAST(0.4 AS DOUBLE)) * 1e12) AS BIGINT) AS e0up,
      |    CAST(floor(ln(CAST(0.6 AS DOUBLE)) * 1e12) AS BIGINT) AS e0dn,
      |    CAST(floor(ln(CAST(0.6 AS DOUBLE)) * 1e12) AS BIGINT) AS e1up,
      |    CAST(floor(ln(CAST(0.4 AS DOUBLE)) * 1e12) AS BIGINT) AS e1dn,
      |    CAST(floor(ln(CAST(0.5 AS DOUBLE)) * 1e12) AS BIGINT) AS ini),
      |v AS (
      |  SELECT t,
      |    ini + CASE WHEN b THEN e0up ELSE e0dn END AS s0,
      |    ini + CASE WHEN b THEN e1up ELSE e1dn END AS s1,
      |    CASE WHEN ini + CASE WHEN b THEN e1up ELSE e1dn END
      |       > ini + CASE WHEN b THEN e0up ELSE e0dn END THEN 1 ELSE 0 END AS c1
      |  FROM bits, lp WHERE t = 1
      |  UNION ALL
      |  SELECT b.t,
      |    greatest(v.s0 + stay, v.s1 + sw) + CASE WHEN b.b THEN e0up ELSE e0dn END,
      |    greatest(v.s0 + sw, v.s1 + stay) + CASE WHEN b.b THEN e1up ELSE e1dn END,
      |    v.c1 + CASE WHEN
      |      greatest(v.s0 + sw, v.s1 + stay) + CASE WHEN b.b THEN e1up ELSE e1dn END
      |      > greatest(v.s0 + stay, v.s1 + sw) + CASE WHEN b.b THEN e0up ELSE e0dn END
      |      THEN 1 ELSE 0 END
      |  FROM v JOIN bits b ON b.t = v.t + 1 CROSS JOIN lp),
      |fin AS (SELECT * FROM v ORDER BY t DESC LIMIT 1),
      |nsteps AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM bits)
      |SELECT n0 AS n_steps,
      |  round(CAST(greatest(s0, s1) AS DOUBLE) / 1e12, 6) AS viterbi_logscore,
      |  CAST(CASE WHEN s1 > s0 THEN 1 ELSE 0 END AS BIGINT) AS final_state_bull,
      |  CAST(c1 AS BIGINT) AS n_prefix_bull
      |FROM fin, nsteps""".stripMargin

  /** C969 analytics_absorbing_time — expected steps to purchase in the
    * empirical per-user event-transition chain (purchase absorbing,
    * the other four event types transient): t = 1 + Q·t iterated 60
    * fixed Jacobi steps on the 1e-9 grid (Q substochastic — every
    * state leaks to purchase, so the iteration contracts). The "how
    * many more events until conversion, starting from an error?"
    * number a funnel conversion-rate can't give.
    */
  def analyticsAbsorbingTime(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull && col("cur") =!= "purchase")
      .groupBy("cur", "nxt").agg(count(lit(1)).cast("long").as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val states = Seq("click", "error", "signup", "view")
    val outRow = states.map { c =>
      c -> (states.map(n => trans.getOrElse((c, n), 0L)).sum +
        trans.getOrElse((c, "purchase"), 0L))
    }.toMap
    val q = states.map(c => states.map(n =>
      trans.getOrElse((c, n), 0L).toDouble / math.max(outRow(c), 1L))).map(_.toArray).toArray
    var t = Array.fill(4)(0L) // 1e-9-grid expected steps
    for (_ <- 1 to 60) {
      val nt = (0 until 4).map { i =>
        val x = 1.0 + (0 until 4).map(j => q(i)(j) * (t(j) / 1e9)).sum
        math.floor(x * 1e9 + 0.5).toLong
      }.toArray
      t = nt
    }
    val nTrans = trans.values.sum
    import s.implicits._
    Seq((nTrans, t(0) / 1e9, t(1) / 1e9, t(2) / 1e9, t(3) / 1e9))
      .toDF("nt", "tc", "te", "ts2", "tv")
      .selectExpr("nt AS n_transitions",
        "round(tc, 4) AS steps_from_click", "round(te, 4) AS steps_from_error",
        "round(ts2, 4) AS steps_from_signup", "round(tv, 4) AS steps_from_view")
  }
  val analyticsAbsorbingTimeSql: String = {
    val upd = (i: String) =>
      s"""floor((1 + p_${i}c * (tc / 1e9) + p_${i}e * (te / 1e9)
         |  + p_${i}s * (ts2 / 1e9) + p_${i}v * (tv / 1e9)) * 1e9 + 0.5)""".stripMargin
    s"""WITH RECURSIVE trans AS (
       |  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT event_type AS cur,
       |      lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |    FROM events)
       |  WHERE nxt IS NOT NULL AND cur <> 'purchase' GROUP BY 1, 2),
       |outr AS (SELECT cur, CAST(sum(c) AS BIGINT) AS tot FROM trans GROUP BY 1),
       |probs AS (
       |  SELECT
       |    coalesce(max(CASE WHEN cur = 'click' AND nxt = 'click' THEN p END), 0) AS p_cc,
       |    coalesce(max(CASE WHEN cur = 'click' AND nxt = 'error' THEN p END), 0) AS p_ce,
       |    coalesce(max(CASE WHEN cur = 'click' AND nxt = 'signup' THEN p END), 0) AS p_cs,
       |    coalesce(max(CASE WHEN cur = 'click' AND nxt = 'view' THEN p END), 0) AS p_cv,
       |    coalesce(max(CASE WHEN cur = 'error' AND nxt = 'click' THEN p END), 0) AS p_ec,
       |    coalesce(max(CASE WHEN cur = 'error' AND nxt = 'error' THEN p END), 0) AS p_ee,
       |    coalesce(max(CASE WHEN cur = 'error' AND nxt = 'signup' THEN p END), 0) AS p_es,
       |    coalesce(max(CASE WHEN cur = 'error' AND nxt = 'view' THEN p END), 0) AS p_ev,
       |    coalesce(max(CASE WHEN cur = 'signup' AND nxt = 'click' THEN p END), 0) AS p_sc,
       |    coalesce(max(CASE WHEN cur = 'signup' AND nxt = 'error' THEN p END), 0) AS p_se,
       |    coalesce(max(CASE WHEN cur = 'signup' AND nxt = 'signup' THEN p END), 0) AS p_ss,
       |    coalesce(max(CASE WHEN cur = 'signup' AND nxt = 'view' THEN p END), 0) AS p_sv,
       |    coalesce(max(CASE WHEN cur = 'view' AND nxt = 'click' THEN p END), 0) AS p_vc,
       |    coalesce(max(CASE WHEN cur = 'view' AND nxt = 'error' THEN p END), 0) AS p_ve,
       |    coalesce(max(CASE WHEN cur = 'view' AND nxt = 'signup' THEN p END), 0) AS p_vs,
       |    coalesce(max(CASE WHEN cur = 'view' AND nxt = 'view' THEN p END), 0) AS p_vv,
       |    max(ntr) AS n_trans
       |  FROM (
       |    SELECT t.cur, t.nxt, CAST(t.c AS DOUBLE) / o.tot AS p,
       |      (SELECT CAST(sum(c) AS BIGINT) FROM trans) AS ntr
       |    FROM trans t JOIN outr o ON t.cur = o.cur
       |    WHERE t.nxt <> 'purchase')),
       |it(k, tc, te, ts2, tv) AS (
       |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  UNION ALL
       |  SELECT k + 1,
       |    CAST(${upd("c")} AS BIGINT),
       |    CAST(${upd("e")} AS BIGINT),
       |    CAST(${upd("s")} AS BIGINT),
       |    CAST(${upd("v")} AS BIGINT)
       |  FROM it, probs WHERE k < 60),
       |fin AS (SELECT * FROM it ORDER BY k DESC LIMIT 1)
       |SELECT n_trans AS n_transitions,
       |  round(tc / 1e9, 4) AS steps_from_click,
       |  round(te / 1e9, 4) AS steps_from_error,
       |  round(ts2 / 1e9, 4) AS steps_from_signup,
       |  round(tv / 1e9, 4) AS steps_from_view
       |FROM fin, probs""".stripMargin
  }

  /** C970 text_renyi_entropy — the Rényi entropy profile of the corpus
    * token distribution at α ∈ {0, ½, 1, 2, ∞}: richness (ln V),
    * √-weighted diversity, Shannon, collision entropy, min-entropy —
    * the full diversity spectrum a single Shannon number collapses.
    * Per-token √c and c·ln c quantize ·10⁶ before the exact corpus
    * sums; α=2 and α=∞ come from exact Σc² and max c.
    */
  def textRenyiEntropy(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).cast("long").as("c"))
    val agg = toks.agg(
      count(lit(1)).cast("long").as("vv"),
      sum(col("c")).cast("long").as("nn"),
      max(col("c")).cast("long").as("cmax"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("c2"),
      sum(expr("CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
        .cast("decimal(38,0)").as("sq"),
      sum(expr("CASE WHEN c > 1 THEN CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) ELSE 0L END"))
        .cast("decimal(38,0)").as("clnc"))
    agg.selectExpr(
      """stack(5,
        |  'a0_richness', round(ln(CAST(vv AS DOUBLE)), 6),
        |  'a05_sqrt', round(2 * ln(CAST(sq AS DOUBLE) / 1e6) - ln(CAST(nn AS DOUBLE)), 6),
        |  'a1_shannon', round(ln(CAST(nn AS DOUBLE)) - CAST(clnc AS DOUBLE) / 1e6 / nn, 6),
        |  'a2_collision', round(2 * ln(CAST(nn AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)), 6),
        |  'ainf_min', round(ln(CAST(nn AS DOUBLE)) - ln(CAST(cmax AS DOUBLE)), 6)) AS (alpha, entropy)""".stripMargin)
      .orderBy("alpha")
  }
  val textRenyiEntropySql: String =
    """WITH toks AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE length(w) > 0 GROUP BY 1),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS vv, CAST(sum(c) AS BIGINT) AS nn,
      |    CAST(max(c) AS BIGINT) AS cmax,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS DECIMAL(38,0)) AS c2,
      |    CAST(sum(CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(CASE WHEN c > 1 THEN CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS DECIMAL(38,0)) AS clnc
      |  FROM toks)
      |SELECT 'a0_richness' AS alpha, round(ln(CAST(vv AS DOUBLE)), 6) AS entropy FROM agg
      |UNION ALL SELECT 'a05_sqrt', round(2 * ln(CAST(sq AS DOUBLE) / 1e6) - ln(CAST(nn AS DOUBLE)), 6) FROM agg
      |UNION ALL SELECT 'a1_shannon', round(ln(CAST(nn AS DOUBLE)) - CAST(clnc AS DOUBLE) / 1e6 / nn, 6) FROM agg
      |UNION ALL SELECT 'a2_collision', round(2 * ln(CAST(nn AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)), 6) FROM agg
      |UNION ALL SELECT 'ainf_min', round(ln(CAST(nn AS DOUBLE)) - ln(CAST(cmax AS DOUBLE)), 6) FROM agg
      |ORDER BY alpha""".stripMargin

  /** C971 stat_probit_regression — probit GLM of the return flag on
    * discount via six fixed Fisher-scoring steps on the 11 grouped
    * strata, with Φ as the Zelen–Severo rational approximation (max
    * error 7.5e-8) written identically in both engines: μ and φ on the
    * 1e-9 grid (μ clamped to [1e-9, 1−1e-9] as integers), per-stratum
    * gradient/Fisher terms ·10⁶ into exact sums, β on the 1e-12 grid.
    * Completes the grouped-GLM family: logit (C880), Poisson (C966),
    * probit here — same data, three link functions.
    */
  def statProbitRegression(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("xq"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("og"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = g.map(_._2).sum
    def q12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    def phi(z: Double): Double = math.exp(-(z * z) / 2) / math.sqrt(2 * math.Pi)
    def bigPhi(z: Double): Double = {
      val p = 0.2316419
      def poly(t: Double): Double =
        t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      if (z >= 0) 1 - phi(z) * poly(1 / (1 + p * z))
      else phi(z) * poly(1 / (1 - p * z))
    }
    var b0 = 0.0; var b1 = 0.0
    for (_ <- 1 to 6) {
      var g1 = BigInt(0); var g2 = BigInt(0)
      var f11 = BigInt(0); var f12 = BigInt(0); var f22 = BigInt(0)
      g.foreach { case (xq, ng, og) =>
        val eta = b0 + b1 * (xq / 100.0)
        val muq = math.min(math.max(math.floor(bigPhi(eta) * 1e9 + 0.5).toLong, 1L), 999999999L)
        val phq = math.floor(phi(eta) * 1e9 + 0.5).toLong
        val mu = muq / 1e9; val ph = phq / 1e9
        // term association mirrors the oracle text exactly (left-assoc)
        g1 += BigInt(math.floor((og - ng * mu) * ph / (mu * (1 - mu)) * 1e6 + 0.5).toLong)
        g2 += BigInt(math.floor((og - ng * mu) * ph / (mu * (1 - mu)) * (xq / 100.0) * 1e6 + 0.5).toLong)
        f11 += BigInt(math.floor(ng * ph * ph / (mu * (1 - mu)) * 1e6 + 0.5).toLong)
        f12 += BigInt(math.floor(ng * ph * ph / (mu * (1 - mu)) * (xq / 100.0) * 1e6 + 0.5).toLong)
        f22 += BigInt(math.floor(ng * ph * ph / (mu * (1 - mu)) * (xq / 100.0) * (xq / 100.0) * 1e6 + 0.5).toLong)
      }
      val (d1, d2) = (g1.toDouble / 1e6, g2.toDouble / 1e6)
      val (a11, a12, a22) = (f11.toDouble / 1e6, f12.toDouble / 1e6, f22.toDouble / 1e6)
      val det = a11 * a22 - a12 * a12
      b0 = q12(b0 + (a22 * d1 - a12 * d2) / det)
      b1 = q12(b1 + (-a12 * d1 + a11 * d2) / det)
    }
    import s.implicits._
    Seq((n, b0, b1)).toDF("n0", "b0", "b1")
      .selectExpr("n0 AS n_items", "round(b0, 6) AS beta0", "round(b1, 6) AS beta1",
        """round(CASE WHEN b0 >= 0
          |  THEN 1 - exp(-(b0 * b0) / 2) / sqrt(2 * pi())
          |    * ((1 / (1 + CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(0.319381530 AS DOUBLE)
          |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(-0.356563782 AS DOUBLE)
          |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(1.781477937 AS DOUBLE)
          |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(-1.821255978 AS DOUBLE)
                + (1 / (1 + CAST(0.2316419 AS DOUBLE) * b0)) * CAST(1.330274429 AS DOUBLE))))))
          |  ELSE exp(-(b0 * b0) / 2) / sqrt(2 * pi())
          |    * ((1 / (1 - CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(0.319381530 AS DOUBLE)
          |      + (1 / (1 - CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(-0.356563782 AS DOUBLE)
          |      + (1 / (1 - CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(1.781477937 AS DOUBLE)
          |      + (1 / (1 - CAST(0.2316419 AS DOUBLE) * b0)) * (CAST(-1.821255978 AS DOUBLE)
                + (1 / (1 - CAST(0.2316419 AS DOUBLE) * b0)) * CAST(1.330274429 AS DOUBLE))))))
          |  END, 6) AS p_at_zero_discount""".stripMargin)
  }
  val statProbitRegressionSql: String = {
    val phiE = (z: String) => s"exp(-(($z) * ($z)) / 2) / sqrt(2 * pi())"
    val polyE = (t: String) =>
      s"""(($t) * (CAST(0.319381530 AS DOUBLE) + ($t) * (CAST(-0.356563782 AS DOUBLE)
         |  + ($t) * (CAST(1.781477937 AS DOUBLE) + ($t) * (CAST(-1.821255978 AS DOUBLE)
         |  + ($t) * CAST(1.330274429 AS DOUBLE))))))""".stripMargin
    val bigPhiE = (z: String) =>
      s"""CASE WHEN ($z) >= 0
         |  THEN 1 - ${phiE(z)} * ${polyE(s"1 / (1 + CAST(0.2316419 AS DOUBLE) * ($z))")}
         |  ELSE ${phiE(z)} * ${polyE(s"1 / (1 - CAST(0.2316419 AS DOUBLE) * ($z))")} END""".stripMargin
    def step(prev: String, next: String): String = {
      val eta = s"(b0 + b1 * (xq / CAST(100 AS DOUBLE)))"
      s"""m$next AS (
         |  SELECT xq, ng, og,
         |    least(greatest(CAST(floor((${bigPhiE(eta)}) * 1e9 + 0.5) AS BIGINT), 1), 999999999) AS muq,
         |    CAST(floor((${phiE(eta)}) * 1e9 + 0.5) AS BIGINT) AS phq
         |  FROM g, b$prev),
         |s$next AS (
         |  SELECT
         |    CAST(sum(CAST(floor((og - ng * (muq / 1e9)) * (phq / 1e9)
         |      / ((muq / 1e9) * (1 - muq / 1e9)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS g1,
         |    CAST(sum(CAST(floor((og - ng * (muq / 1e9)) * (phq / 1e9)
         |      / ((muq / 1e9) * (1 - muq / 1e9)) * (xq / CAST(100 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS g2,
         |    CAST(sum(CAST(floor(ng * (phq / 1e9) * (phq / 1e9)
         |      / ((muq / 1e9) * (1 - muq / 1e9)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f11,
         |    CAST(sum(CAST(floor(ng * (phq / 1e9) * (phq / 1e9)
         |      / ((muq / 1e9) * (1 - muq / 1e9)) * (xq / CAST(100 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f12,
         |    CAST(sum(CAST(floor(ng * (phq / 1e9) * (phq / 1e9)
         |      / ((muq / 1e9) * (1 - muq / 1e9)) * (xq / CAST(100 AS DOUBLE)) * (xq / CAST(100 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DECIMAL(38,0)) AS f22
         |  FROM m$next),
         |b$next AS (
         |  SELECT
         |    floor((b0 + ((CAST(f22 AS DOUBLE) / 1e6) * (CAST(g1 AS DOUBLE) / 1e6)
         |      - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(g2 AS DOUBLE) / 1e6))
         |      / ((CAST(f11 AS DOUBLE) / 1e6) * (CAST(f22 AS DOUBLE) / 1e6)
         |        - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(f12 AS DOUBLE) / 1e6))) * 1e12 + 0.5) / 1e12 AS b0,
         |    floor((b1 + (-(CAST(f12 AS DOUBLE) / 1e6) * (CAST(g1 AS DOUBLE) / 1e6)
         |      + (CAST(f11 AS DOUBLE) / 1e6) * (CAST(g2 AS DOUBLE) / 1e6))
         |      / ((CAST(f11 AS DOUBLE) / 1e6) * (CAST(f22 AS DOUBLE) / 1e6)
         |        - (CAST(f12 AS DOUBLE) / 1e6) * (CAST(f12 AS DOUBLE) / 1e6))) * 1e12 + 0.5) / 1e12 AS b1
         |  FROM b$prev, s$next)""".stripMargin
    }
    s"""WITH g AS (
       |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS xq,
       |    CAST(count(*) AS BIGINT) AS ng,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS og
       |  FROM lineitem GROUP BY 1),
       |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM g),
       |b0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1),
       |${step("0", "1")},
       |${step("1", "2")},
       |${step("2", "3")},
       |${step("3", "4")},
       |${step("4", "5")},
       |${step("5", "6")}
       |SELECT n AS n_items, round(b0, 6) AS beta0, round(b1, 6) AS beta1,
       |  round(${bigPhiE("b0")}, 6) AS p_at_zero_discount
       |FROM b6, tot""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_viterbi_hmm" -> (timeViterbiHmm _),
    "analytics_absorbing_time" -> (analyticsAbsorbingTime _),
    "text_renyi_entropy" -> (textRenyiEntropy _),
    "stat_probit_regression" -> (statProbitRegression _),
  )

  val oracle: Map[String, String] = Map(
    "time_viterbi_hmm" -> timeViterbiHmmSql,
    "analytics_absorbing_time" -> analyticsAbsorbingTimeSql,
    "text_renyi_entropy" -> textRenyiEntropySql,
    "stat_probit_regression" -> statProbitRegressionSql,
  )
}
