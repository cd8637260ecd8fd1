package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Wave 130 (C924–C927): attribution + uplift evaluation + superlative
  * price index + auto-tuned smoothing — Markov removal-effect channel
  * attribution, the Qini uplift-decile curve, the chained Törnqvist
  * index, and the SES α-grid fit.
  *
  * Shared discipline: the absorbing-chain fixed point runs 60
  * iterations over the COLLECTED ≤36-cell transition matrix with
  * left-fold accumulation that matches DuckDB's list_reduce order
  * exactly (the C855 steady-state convention); Qini deciles come off
  * GlobalRank; Törnqvist per-part terms quantize ·10¹² before the
  * link sum; the SES recursion is the C895 collect-the-bounded-months
  * shape with a 19-row α grid.
  */
object Extras230 {

  /** C924 analytics_markov_attribution — removal-effect attribution
    * over the view/click/cart funnel: journeys = each user's events up
    * to the first purchase (rank by ts, event_id), absorbing Markov
    * chain {start, view, click, cart, conv, null}, conversion
    * probability by 60 fixed-point iterations, and for each channel
    * the chain with that channel's inbound mass redirected to null —
    * RE(c) = 1 − p₋c/p_full, shares normalized. The attribution model
    * that replaces last-touch (C531) when paths matter.
    * Scale: journey edges are one lag/lead window per user (hash-
    * distributed); the chain itself is a collected ≤36-cell matrix.
    */
  def analyticsMarkovAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("""CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
          |WHEN 'cart' THEN 3 WHEN 'purchase' THEN 4 ELSE 1 END""".stripMargin).as("st"))
      .withColumn("rk", row_number().over(w).cast("long"))
    val fp = ev.filter(col("st") === 4)
      .groupBy("user_id").agg(min(col("rk")).as("fpr"))
    val kept = ev.join(fp, Seq("user_id"), "left")
      .filter(col("fpr").isNull || col("rk") <= col("fpr"))
    val wk = Window.partitionBy("user_id").orderBy("rk")
    val main = kept
      .withColumn("f", coalesce(lag(col("st"), 1).over(wk), lit(0)))
      .select(col("f"), col("st").as("t"))
    val term = kept
      .withColumn("nx", lead(col("st"), 1).over(wk))
      .filter(col("nx").isNull && col("st") =!= 4)
      .select(col("st").as("f"), lit(5).as("t"))
    val counts = main.union(term).groupBy("f", "t")
      .agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    def convProb(removed: Int): Double = {
      val c = Array.ofDim[Long](6, 6)
      counts.foreach { case ((f, t0), n) =>
        val t = if (removed > 0 && t0 == removed) 5 else t0
        c(f)(t) += n
      }
      val rs = c.map(_.sum)
      val tm = Array.tabulate(6, 6)((i, j) =>
        if (rs(i) == 0) 0.0 else c(i)(j).toDouble / rs(i))
      var p = Array.tabulate(6)(i => if (i == 4) 1.0 else 0.0)
      for (_ <- 1 to 60) {
        p = Array.tabulate(6) { i =>
          if (i == 4) 1.0
          else if (i == 5) 0.0
          else {
            var acc = 0.0
            for (j <- 0 until 6) acc += tm(i)(j) * p(j)
            acc
          }
        }
      }
      p(0)
    }
    val full = convProb(0)
    val res = Seq(("cart", 3), ("click", 2), ("view", 1)).map { case (nm, k) =>
      val pk = convProb(k)
      (nm, pk, if (full <= 0) 0.0 else 1 - pk / full)
    }
    val reSum = res.map(_._3).sum
    import s.implicits._
    res.map { case (nm, pk, re) =>
      (nm, full, pk, re, if (reSum <= 0) 0.0 else re / reSum)
    }.toDF("channel", "pf", "pr", "re", "sh")
      .selectExpr("channel", "round(pf, 6) AS conv_prob_full",
        "round(pr, 6) AS conv_prob_removed",
        "round(re, 6) AS removal_effect", "round(sh, 6) AS attribution_share")
      .orderBy("channel")
  }
  val analyticsMarkovAttributionSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |    WHEN 'cart' THEN 3 WHEN 'purchase' THEN 4 ELSE 1 END AS st,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rk
      |  FROM events),
      |fp AS (SELECT user_id, min(rk) AS fpr FROM ev WHERE st = 4 GROUP BY 1),
      |kept AS (
      |  SELECT e.* FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
      |  WHERE fp.fpr IS NULL OR e.rk <= fp.fpr),
      |seq2 AS (
      |  SELECT *, lag(st) OVER (PARTITION BY user_id ORDER BY rk) AS pv,
      |    lead(st) OVER (PARTITION BY user_id ORDER BY rk) AS nx
      |  FROM kept),
      |edges AS (
      |  SELECT coalesce(pv, 0) AS f, st AS t FROM seq2
      |  UNION ALL
      |  SELECT st AS f, 5 AS t FROM seq2 WHERE nx IS NULL AND st <> 4),
      |counts AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM edges GROUP BY 1, 2),
      |scen AS (SELECT unnest([0, 1, 2, 3]) AS sc),
      |cnt2 AS (
      |  SELECT sc, f, CASE WHEN sc > 0 AND t = sc THEN 5 ELSE t END AS t,
      |    CAST(sum(n) AS BIGINT) AS n
      |  FROM counts, scen GROUP BY 1, 2, 3),
      |sts AS (SELECT unnest(generate_series(0, 5)) AS s),
      |rowsums AS (SELECT sc, f, CAST(sum(n) AS DOUBLE) AS rs FROM cnt2 GROUP BY 1, 2),
      |rows_ AS (
      |  SELECT c.sc, fr.s AS i,
      |    list(CASE WHEN r.rs IS NULL THEN 0.0
      |         ELSE CAST(coalesce(c2.n, 0) AS DOUBLE) / r.rs END ORDER BY t.s) AS rw
      |  FROM scen c
      |  CROSS JOIN sts fr
      |  CROSS JOIN sts t
      |  LEFT JOIN cnt2 c2 ON c2.sc = c.sc AND c2.f = fr.s AND c2.t = t.s
      |  LEFT JOIN rowsums r ON r.sc = c.sc AND r.f = fr.s
      |  GROUP BY 1, 2),
      |mat AS (
      |  SELECT sc, list(rw ORDER BY i) AS pm FROM rows_ GROUP BY 1),
      |rec AS (
      |  SELECT 0 AS it, sc,
      |    list_transform(generate_series(1, 6),
      |      i -> CASE WHEN i = 5 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS p,
      |    pm
      |  FROM mat
      |  UNION ALL
      |  SELECT it + 1, sc,
      |    list_transform(generate_series(1, 6), i ->
      |      CASE WHEN i = 5 THEN CAST(1 AS DOUBLE) WHEN i = 6 THEN CAST(0 AS DOUBLE)
      |      ELSE list_reduce(list_transform(generate_series(1, 6),
      |        j -> pm[i][j] * p[j]), (x, y) -> x + y) END),
      |    pm
      |  FROM rec WHERE it < 60),
      |fin AS (SELECT sc, p[1] AS pc FROM rec WHERE it = 60),
      |fullp AS (SELECT pc AS pf FROM fin WHERE sc = 0),
      |res AS (
      |  SELECT CASE sc WHEN 1 THEN 'view' WHEN 2 THEN 'click' ELSE 'cart' END AS channel,
      |    pf, pc,
      |    CASE WHEN pf <= 0 THEN 0.0 ELSE 1 - pc / pf END AS re
      |  FROM fin, fullp WHERE sc > 0),
      |tot AS (SELECT sum(re) AS sre FROM res)
      |SELECT channel, round(pf, 6) AS conv_prob_full,
      |  round(pc, 6) AS conv_prob_removed,
      |  round(re, 6) AS removal_effect,
      |  round(CASE WHEN sre <= 0 THEN 0.0 ELSE re / sre END, 6) AS attribution_share
      |FROM res, tot ORDER BY channel""".stripMargin

  /** C925 analytics_qini_uplift — the Qini uplift-decile curve:
    * customers ranked by total spend (the targeting score), treatment
    * = any ≥5%-discounted lineitem, response = any return; per decile
    * the cumulative incremental responders
    * Qini(k) = Rᵗ(k) − Rᶜ(k)·Nᵗ(k)/Nᶜ(k). The curve that tells a
    * campaign whether its targeting score actually ranks persuadables
    * first — evaluation no A/B report should skip.
    * Scale: one orders⋈lineitem pass to customer flags, GlobalRank
    * deciles, bounded 10-row cumulative windows.
    */
  def analyticsQiniUplift(s: SparkSession, d: String): DataFrame = {
    val cust = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
        col("o_totalprice")), Seq("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("spend"),
        max(expr("CASE WHEN l_discount >= 0.05 THEN 1L ELSE 0L END")).as("treat"),
        max(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).as("resp"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      cust, "rn", "nn", Seq(col("spend").desc, col("o_custkey").asc))
    val dec = ranked
      .select(expr("((rn - 1) * 10) div nn + 1").as("decile"),
        col("treat"), col("resp"))
      .groupBy("decile")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("treat")).cast("long").as("nt"),
        sum(expr("CASE WHEN treat = 1 AND resp = 1 THEN 1L ELSE 0L END")).cast("long").as("rt"),
        sum(expr("CASE WHEN treat = 0 AND resp = 1 THEN 1L ELSE 0L END")).cast("long").as("rc"))
    val wCum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    dec
      .withColumn("ntc", sum(col("nt")).over(wCum).cast("long"))
      .withColumn("ncc", (sum(col("n")).over(wCum) - sum(col("nt")).over(wCum)).cast("long"))
      .withColumn("rtc", sum(col("rt")).over(wCum).cast("long"))
      .withColumn("rcc", sum(col("rc")).over(wCum).cast("long"))
      .selectExpr("decile", "n", "ntc AS n_treat_cum", "ncc AS n_ctrl_cum",
        "rtc AS resp_treat_cum", "rcc AS resp_ctrl_cum",
        """round(CASE WHEN ncc = 0 THEN CAST(rtc AS DOUBLE)
          |ELSE rtc - CAST(rcc AS DOUBLE) * ntc / ncc END, 4) AS qini""".stripMargin)
      .orderBy("decile")
  }
  val analyticsQiniUpliftSql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT)) AS DECIMAL(38,0)) AS spend,
      |    max(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS treat,
      |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS resp
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS rn,
      |    count(*) OVER () AS nn
      |  FROM cust),
      |dec AS (
      |  SELECT ((rn - 1) * 10) // nn + 1 AS decile,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(treat) AS BIGINT) AS nt,
      |    CAST(sum(CASE WHEN treat = 1 AND resp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rt,
      |    CAST(sum(CASE WHEN treat = 0 AND resp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rc
      |  FROM ranked GROUP BY 1),
      |cum AS (
      |  SELECT decile, n,
      |    CAST(sum(nt) OVER w AS BIGINT) AS ntc,
      |    CAST(sum(n) OVER w - sum(nt) OVER w AS BIGINT) AS ncc,
      |    CAST(sum(rt) OVER w AS BIGINT) AS rtc,
      |    CAST(sum(rc) OVER w AS BIGINT) AS rcc
      |  FROM dec
      |  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT decile, n, ntc AS n_treat_cum, ncc AS n_ctrl_cum,
      |  rtc AS resp_treat_cum, rcc AS resp_ctrl_cum,
      |  round(CASE WHEN ncc = 0 THEN CAST(rtc AS DOUBLE)
      |  ELSE rtc - CAST(rcc AS DOUBLE) * ntc / ncc END, 4) AS qini
      |FROM cum ORDER BY decile""".stripMargin

  /** C926 analytics_tornqvist_index — the chained Törnqvist price
    * index over parts: monthly unit prices p = Σrev/Σqty, per-link
    * per-part terms w̄·ln((r₁q₀)/(r₀q₁)) with w̄ the mean revenue
    * share of the adjacent months (parts present in both), each term
    * ·10¹²-quantized before the link sum, the chain the exp of the
    * total. The superlative index (exact for translog preferences)
    * beside C607's Fisher — statistical agencies' preferred form.
    * Scale: one part-month aggregate, a self-join on (part, month+1),
    * two broadcast month-total joins.
    */
  def analyticsTornqvistIndex(s: SparkSession, d: String): DataFrame = {
    val pm = lineitem(s, d)
      .groupBy(col("l_partkey"), expr("CAST(date_trunc('month', l_shipdate) AS DATE)").as("m"))
      .agg(sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        | * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)""".stripMargin))
        .cast("decimal(38,0)").as("r"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("q"))
    val mt = pm.groupBy("m").agg(sum(col("r")).cast("decimal(38,0)").as("tr"))
    val a = pm.select(expr("add_months(m, 1)").as("m"), col("l_partkey"),
      col("r").as("r0"), col("q").as("q0"))
    val links = pm.join(a, Seq("m", "l_partkey"))
      .join(mt.select(expr("add_months(m, 1)").as("m"), col("tr").as("tr0")), Seq("m"))
      .join(mt, Seq("m"))
      .select(col("m"), expr(
        """CAST(floor((CAST(r0 AS DOUBLE) / CAST(tr0 AS DOUBLE)
          | + CAST(r AS DOUBLE) / CAST(tr AS DOUBLE)) / 2
          | * ln(CAST(r AS DOUBLE) * q0 / (CAST(r0 AS DOUBLE) * q)) * 1e12 + 0.5) AS BIGINT)""".stripMargin)
        .as("tq"))
    val perLink = links.groupBy("m")
      .agg(sum(col("tq")).cast("long").as("lq"), count(lit(1)).cast("long").as("np"))
    perLink.agg(count(lit(1)).cast("long").as("n_links"),
        sum(col("lq")).cast("decimal(38,0)").as("tot"),
        max(expr("abs(lq)")).as("mx"),
        sum(col("np")).cast("long").as("pairs"))
      .selectExpr("n_links", "pairs AS n_part_links",
        "round(exp(CAST(tot AS DOUBLE) / 1e12), 6) AS tornqvist_index",
        "round(CAST(mx AS DOUBLE) / 1e12, 6) AS max_monthly_abs_log")
  }
  val analyticsTornqvistIndexSql: String =
    """WITH pm AS (
      |  SELECT l_partkey, CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS HUGEINT)
      |      * CAST(100 - CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS r,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |mt AS (SELECT m, CAST(sum(CAST(r AS HUGEINT)) AS DECIMAL(38,0)) AS tr FROM pm GROUP BY 1),
      |links AS (
      |  SELECT b.m,
      |    CAST(floor((CAST(a.r AS DOUBLE) / CAST(t0.tr AS DOUBLE)
      |     + CAST(b.r AS DOUBLE) / CAST(t1.tr AS DOUBLE)) / 2
      |     * ln(CAST(b.r AS DOUBLE) * a.q / (CAST(a.r AS DOUBLE) * b.q)) * 1e12 + 0.5) AS BIGINT) AS tq
      |  FROM pm a
      |  JOIN pm b ON b.l_partkey = a.l_partkey AND b.m = CAST(a.m + INTERVAL 1 MONTH AS DATE)
      |  JOIN mt t0 ON t0.m = a.m
      |  JOIN mt t1 ON t1.m = b.m),
      |perlink AS (
      |  SELECT m, CAST(sum(tq) AS BIGINT) AS lq, CAST(count(*) AS BIGINT) AS np
      |  FROM links GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_links,
      |  CAST(sum(np) AS BIGINT) AS n_part_links,
      |  round(exp(CAST(CAST(sum(CAST(lq AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE) / 1e12), 6) AS tornqvist_index,
      |  round(CAST(max(abs(lq)) AS DOUBLE) / 1e12, 6) AS max_monthly_abs_log
      |FROM perlink""".stripMargin

  /** C927 time_ses_grid — simple exponential smoothing with the α
    * chosen on a 19-point grid (0.05..0.95) by one-step-ahead SSE on
    * monthly revenue: the C895 collect-the-bounded-months convention,
    * sequential recursion per α in the driver vs a 19-row recursive-
    * CTE race in the oracle, identical IEEE accumulation order. What
    * "just use SES" should actually ship — the α nobody hand-tunes.
    */
  def timeSesGrid(s: SparkSession, d: String): DataFrame = {
    val ms = orders(s, d)
      .groupBy(expr("date_trunc('month', o_orderdate)").as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("v"))
      .orderBy("m")
      .collect().map(_.getLong(1))
    val n = ms.length
    val fits = (1 to 19).map { k =>
      val alpha = k / 20.0 // == CAST(k*DECIMAL 0.05 AS DOUBLE): correctly-rounded k/20
      var l = ms(0).toDouble
      var sse = 0.0
      for (t <- 1 until n) {
        val e = ms(t) - l
        sse += e * e
        l = alpha * ms(t) + (1 - alpha) * l
      }
      (alpha, sse, l)
    }
    val best = fits.minBy(f => (f._2, f._1))
    import s.implicits._
    Seq((n.toLong, best._1, best._2, best._3)).toDF("n0", "a0", "s0", "l0")
      .selectExpr("n0 AS n_months", "round(a0, 2) AS best_alpha",
        "round(sqrt(s0 / (n0 - 1)) / 100, 2) AS rmse_dollars",
        "round(l0 / 100, 2) AS forecast_next_dollars")
  }
  val timeSesGridSql: String =
    """WITH RECURSIVE monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |seq AS (
      |  SELECT CAST(row_number() OVER (ORDER BY m) - 1 AS BIGINT) AS t,
      |    CAST(v AS DOUBLE) AS x
      |  FROM monthly),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seq),
      |grid AS (SELECT CAST(unnest(generate_series(1, 19)) * 0.05 AS DOUBLE) AS alpha),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS t, alpha, (SELECT x FROM seq WHERE t = 0) AS l,
      |    CAST(0 AS DOUBLE) AS sse
      |  FROM grid
      |  UNION ALL
      |  SELECT r.t + 1, r.alpha,
      |    r.alpha * q.x + (1 - r.alpha) * r.l,
      |    r.sse + (q.x - r.l) * (q.x - r.l)
      |  FROM rec r JOIN seq q ON q.t = r.t + 1),
      |fin AS (
      |  SELECT alpha, sse, l FROM rec, nn WHERE t = n - 1),
      |best AS (
      |  SELECT alpha, sse, l FROM fin ORDER BY sse, alpha LIMIT 1)
      |SELECT nn.n AS n_months, round(b.alpha, 2) AS best_alpha,
      |  round(sqrt(b.sse / (nn.n - 1)) / 100, 2) AS rmse_dollars,
      |  round(b.l / 100, 2) AS forecast_next_dollars
      |FROM best b, nn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_markov_attribution" -> (analyticsMarkovAttribution _),
    "analytics_qini_uplift" -> (analyticsQiniUplift _),
    "analytics_tornqvist_index" -> (analyticsTornqvistIndex _),
    "time_ses_grid" -> (timeSesGrid _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_markov_attribution" -> analyticsMarkovAttributionSql,
    "analytics_qini_uplift" -> analyticsQiniUpliftSql,
    "analytics_tornqvist_index" -> analyticsTornqvistIndexSql,
    "time_ses_grid" -> timeSesGridSql,
  )
}
