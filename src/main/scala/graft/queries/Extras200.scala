package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 100 (C804–C807): joint-extreme structure + parametric fit +
  * temporal coincidence + benchmark-relative performance — empirical
  * tail dependence, a lognormal fit audit, click→purchase coincidence
  * rates, and the up/down capture ratio.
  *
  * Shared discipline: tail thresholds are exact rank cuts on the
  * agg-bounded daily frame; log terms are quantized once per row;
  * coincidence is an equi-join on user with integer-µs windows;
  * capture ratios quantize monthly log-returns before the
  * conditional sums.
  */
object Extras200 {

  /** C804 stat_tail_dependence — empirical upper-tail dependence
    * between daily revenue and daily order count: both margins ranked
    * on the agg-bounded daily frame (deterministic tie-breaks), the
    * top-⌊0.05n⌋ sets intersected EXACTLY, λ̂_U = joint/⌊0.05n⌋ and
    * the lift over independence n·joint/⌊0.05n⌋². Correlation says
    * nothing about whether EXTREMES co-occur — this does.
    */
  def statTailDependence(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(expr("date_trunc('day', o_orderdate)").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("rev"),
        count(lit(1)).cast("long").as("cnt"))
    val wx = org.apache.spark.sql.expressions.Window
      .orderBy(col("rev").desc, col("day").asc)
    val wy = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("day").asc)
    val ranked = daily
      .withColumn("rx", row_number().over(wx))
      .withColumn("ry", row_number().over(wy))
    val tot = daily.agg(count(lit(1)).cast("long").as("n"))
    ranked.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(expr("CASE WHEN rx <= n div 20 AND ry <= n div 20 THEN 1L ELSE 0L END"))
          .cast("long").as("joint"))
      .selectExpr("n", "n div 20 AS k_tail", "joint",
        "round(CAST(joint AS DOUBLE) / (n div 20), 6) AS lambda_upper",
        "round(CAST(joint AS DOUBLE) * n / (CAST(n div 20 AS DOUBLE) * (n div 20)), 6) AS lift_vs_independent")
  }
  val statTailDependenceSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS rev,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT day, rev, cnt,
      |    row_number() OVER (ORDER BY rev DESC, day) AS rx,
      |    row_number() OVER (ORDER BY cnt DESC, day) AS ry
      |  FROM daily),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
      |SELECT max(t.n) AS n, max(t.n) // 20 AS k_tail,
      |  CAST(sum(CASE WHEN r.rx <= t.n // 20 AND r.ry <= t.n // 20 THEN 1 ELSE 0 END) AS BIGINT) AS joint,
      |  round(CAST(sum(CASE WHEN r.rx <= t.n // 20 AND r.ry <= t.n // 20 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / (max(t.n) // 20), 6) AS lambda_upper,
      |  round(CAST(sum(CASE WHEN r.rx <= t.n // 20 AND r.ry <= t.n // 20 THEN 1 ELSE 0 END) AS DOUBLE)
      |    * max(t.n) / (CAST(max(t.n) // 20 AS DOUBLE) * (max(t.n) // 20)), 6) AS lift_vs_independent
      |FROM ranked r, tot t""".stripMargin

  /** C805 stat_lognormal_fit — lognormal MLE for order totals:
    * per-row ln(dollars) quantized ·10⁹ ONCE, exact integer moment
    * sums → μ̂, σ̂ (log-space), the implied median e^μ and mean
    * e^{μ+σ²/2}, and the moment-match ratio (actual mean / implied
    * mean — 1 when the lognormal fits). Completes the parametric-fit
    * shelf beside Weibull, Gumbel, and negative-binomial.
    */
  def statLognormalFit(s: SparkSession, d: String): DataFrame = {
    val lq = orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cv"))
      .filter(col("cv") > 0)
      .select(col("cv"),
        expr("CAST(floor(ln(CAST(cv AS DOUBLE) / 100) * 1e9 + 0.5) AS BIGINT)").as("lq"))
    lq.agg(count(lit(1)).cast("long").as("n"),
        sum(col("lq")).cast("decimal(38,0)").as("sl"),
        sum(expr("CAST(lq AS DECIMAL(38,0)) * lq")).cast("decimal(38,0)").as("ql"),
        sum(col("cv")).cast("decimal(38,0)").as("sc"))
      .selectExpr("n",
        "CAST(sl AS DOUBLE) / n / 1e9 AS mu",
        "sqrt((CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / n) / (n - 1)) / 1e9 AS sig",
        "CAST(sc AS DOUBLE) / n / 100 AS actual_mean")
      .selectExpr("n", "round(mu, 6) AS mu_log", "round(sig, 6) AS sigma_log",
        "round(exp(mu), 4) AS implied_median_dollars",
        "round(exp(mu + sig * sig / 2), 4) AS implied_mean_dollars",
        "round(actual_mean / exp(mu + sig * sig / 2), 6) AS mean_match_ratio")
  }
  val statLognormalFitSql: String =
    """WITH lq AS (
      |  SELECT cv, CAST(floor(ln(CAST(cv AS DOUBLE) / 100) * 1e9 + 0.5) AS BIGINT) AS lq
      |  FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv FROM orders)
      |  WHERE cv > 0),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(lq) AS DECIMAL(38,0)) AS sl,
      |    CAST(sum(CAST(lq AS DECIMAL(38,0)) * lq) AS DECIMAL(38,0)) AS ql,
      |    CAST(sum(cv) AS DECIMAL(38,0)) AS sc
      |  FROM lq),
      |v AS (
      |  SELECT n, CAST(sl AS DOUBLE) / n / 1e9 AS mu,
      |    sqrt((CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / n) / (n - 1)) / 1e9 AS sig,
      |    CAST(sc AS DOUBLE) / n / 100 AS actual_mean
      |  FROM m)
      |SELECT n, round(mu, 6) AS mu_log, round(sig, 6) AS sigma_log,
      |  round(exp(mu), 4) AS implied_median_dollars,
      |  round(exp(mu + sig * sig / 2), 4) AS implied_mean_dollars,
      |  round(actual_mean / exp(mu + sig * sig / 2), 6) AS mean_match_ratio
      |FROM v""".stripMargin

  /** C806 time_event_coincidence — click→purchase coincidence within
    * a 1-hour window, per user: the fraction of clicks followed by a
    * same-user purchase within 3.6e9 µs (trigger rate) and the
    * fraction of purchases preceded by a same-user click (precursor
    * rate). Equi-join on user_id + integer-µs window — the
    * distributed form of event-coincidence analysis; rates are exact
    * distinct-count ratios.
    */
  def timeEventCoincidence(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"), col("event_id").as("cid"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("pus"), col("event_id").as("pid"))
    val joined = clicks.join(purch, Seq("user_id"))
      .filter(expr("pus > cus AND pus - cus <= 3600000000"))
    val trig = joined.agg(countDistinct(col("cid")).cast("long").as("clicks_triggering"),
      countDistinct(col("pid")).cast("long").as("purchases_triggered"))
    val totals = ev.agg(
      sum(expr("CASE WHEN event_type = 'click' THEN 1L ELSE 0L END")).cast("long").as("n_clicks"),
      sum(expr("CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END")).cast("long").as("n_purchases"))
    trig.crossJoin(broadcast(totals))
      .selectExpr("n_clicks", "n_purchases",
        "round(CAST(clicks_triggering AS DOUBLE) / n_clicks, 6) AS click_trigger_rate",
        "round(CAST(purchases_triggered AS DOUBLE) / n_purchases, 6) AS purchase_precursor_rate")
  }
  val timeEventCoincidenceSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
      |clicks AS (
      |  SELECT user_id, us AS cus, event_id AS cid FROM ev WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, us AS pus, event_id AS pid FROM ev WHERE event_type = 'purchase'),
      |joined AS (
      |  SELECT c.cid, p.pid FROM clicks c JOIN purch p ON p.user_id = c.user_id
      |  WHERE p.pus > c.cus AND p.pus - c.cus <= 3600000000),
      |trig AS (
      |  SELECT CAST(count(DISTINCT cid) AS BIGINT) AS clicks_triggering,
      |    CAST(count(DISTINCT pid) AS BIGINT) AS purchases_triggered
      |  FROM joined),
      |totals AS (
      |  SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      |  FROM ev)
      |SELECT n_clicks, n_purchases,
      |  round(CAST(clicks_triggering AS DOUBLE) / n_clicks, 6) AS click_trigger_rate,
      |  round(CAST(purchases_triggered AS DOUBLE) / n_purchases, 6) AS purchase_precursor_rate
      |FROM trig, totals""".stripMargin

  /** C807 win_capture_ratio — up/down capture of Brand#11's monthly
    * shipped revenue against the whole-market benchmark: monthly
    * log-returns quantized ·10⁹ once, months classified by the
    * benchmark's sign, capture = Σ brand-return / Σ market-return
    * within each class. The benchmark-relative asymmetry readout the
    * Sortino/ulcer rows don't give: does this segment amplify rallies
    * or drawdowns?
    */
  def winCaptureRatio(s: SparkSession, d: String): DataFrame = {
    val monthly = lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(expr("date_trunc('month', l_shipdate)").as("mon"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("mkt"),
        sum(expr(
          """CASE WHEN p_brand = 'Brand#11'
            |THEN CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0L END""".stripMargin))
          .cast("long").as("brd"))
      .filter(col("brd") > 0)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("mon").asc)
    val rets = monthly
      .withColumn("mktp", lag(col("mkt"), 1).over(w))
      .withColumn("brdp", lag(col("brd"), 1).over(w))
      .filter(col("mktp").isNotNull)
      .select(
        expr("CAST(floor(ln(CAST(mkt AS DOUBLE) / mktp) * 1e9 + 0.5) AS BIGINT)").as("rm"),
        expr("CAST(floor(ln(CAST(brd AS DOUBLE) / brdp) * 1e9 + 0.5) AS BIGINT)").as("rb"))
    rets.agg(count(lit(1)).cast("long").as("n_months"),
        sum(expr("CASE WHEN rm > 0 THEN rm ELSE 0L END")).cast("long").as("mu"),
        sum(expr("CASE WHEN rm > 0 THEN rb ELSE 0L END")).cast("long").as("bu"),
        sum(expr("CASE WHEN rm < 0 THEN rm ELSE 0L END")).cast("long").as("md"),
        sum(expr("CASE WHEN rm < 0 THEN rb ELSE 0L END")).cast("long").as("bd"))
      .selectExpr("n_months",
        "CASE WHEN mu = 0 THEN CAST(NULL AS DOUBLE) ELSE round(CAST(bu AS DOUBLE) / mu, 6) END AS capture_up",
        "CASE WHEN md = 0 THEN CAST(NULL AS DOUBLE) ELSE round(CAST(bd AS DOUBLE) / md, 6) END AS capture_down")
  }
  val winCaptureRatioSql: String =
    """WITH monthly AS (
      |  SELECT date_trunc('month', l.l_shipdate) AS mon,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS mkt,
      |    CAST(sum(CASE WHEN p.p_brand = 'Brand#11'
      |      THEN CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS brd
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |pos AS (SELECT * FROM monthly WHERE brd > 0),
      |rets AS (
      |  SELECT
      |    CAST(floor(ln(CAST(mkt AS DOUBLE) / lag(mkt, 1) OVER (ORDER BY mon)) * 1e9 + 0.5) AS BIGINT) AS rm,
      |    CAST(floor(ln(CAST(brd AS DOUBLE) / lag(brd, 1) OVER (ORDER BY mon)) * 1e9 + 0.5) AS BIGINT) AS rb
      |  FROM pos),
      |f AS (SELECT rm, rb FROM rets WHERE rm IS NOT NULL)
      |SELECT CAST(count(*) AS BIGINT) AS n_months,
      |  CASE WHEN CAST(sum(CASE WHEN rm > 0 THEN rm ELSE 0 END) AS BIGINT) = 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round(CAST(CAST(sum(CASE WHEN rm > 0 THEN rb ELSE 0 END) AS BIGINT) AS DOUBLE)
      |      / CAST(sum(CASE WHEN rm > 0 THEN rm ELSE 0 END) AS BIGINT), 6) END AS capture_up,
      |  CASE WHEN CAST(sum(CASE WHEN rm < 0 THEN rm ELSE 0 END) AS BIGINT) = 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round(CAST(CAST(sum(CASE WHEN rm < 0 THEN rb ELSE 0 END) AS BIGINT) AS DOUBLE)
      |      / CAST(sum(CASE WHEN rm < 0 THEN rm ELSE 0 END) AS BIGINT), 6) END AS capture_down
      |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_tail_dependence" -> (statTailDependence _),
    "stat_lognormal_fit" -> (statLognormalFit _),
    "time_event_coincidence" -> (timeEventCoincidence _),
    "win_capture_ratio" -> (winCaptureRatio _),
  )

  val oracle: Map[String, String] = Map(
    "stat_tail_dependence" -> statTailDependenceSql,
    "stat_lognormal_fit" -> statLognormalFitSql,
    "time_event_coincidence" -> timeEventCoincidenceSql,
    "win_capture_ratio" -> winCaptureRatioSql,
  )
}
