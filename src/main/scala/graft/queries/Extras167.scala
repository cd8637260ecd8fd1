package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 67 (C672–C675): Gries' DP dispersion, Atkinson index,
  * integrated autocorrelation time, biweight midvariance.
  */
object Extras167 {

  /** C672 text_gries_dp — Gries' "deviation of proportions" corpus-
    * dispersion measure for the top-10 tokens (is a word everywhere or
    * clumped in one source?): DP = ½Σ|v_i−s_i| stays EXACT — each
    * |v_i−s_i| = |c_i·T − C·t_i|/(C·T) has an exact integer numerator,
    * the bounded 20-source sum adds numerators exactly, ONE division
    * per token. Top-10 by corpus count (token tie-break) via the
    * top-N heap; per-source counts re-joined by broadcast semi.
    */
  def textGriesDp(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val bySrc = toks.groupBy("source", "tok")
      .agg(count(lit(1)).cast("long").as("ci"))
    val srcSizes = toks.groupBy("source")
      .agg(count(lit(1)).cast("long").as("ti"))
    val tokTot = bySrc.groupBy("tok").agg(sum(col("ci")).cast("long").as("c"))
    val top = tokTot.orderBy(col("c").desc, col("tok").asc).limit(10)
    val tt = srcSizes.agg(sum(col("ti")).cast("long").as("t"))
    bySrc.join(broadcast(top), Seq("tok"))
      .join(broadcast(srcSizes), Seq("source"))
      .crossJoin(broadcast(tt))
      // missing (source,token) cells contribute |0 - s_i| = t_i*C/(C*T):
      // handled by summing present cells and adding the absent mass below
      .groupBy("tok")
      .agg(max(col("c")).as("c"), max(col("t")).as("t"),
        sum(expr("abs(CAST(ci AS DECIMAL(38,0)) * t - CAST(c AS DECIMAL(38,0)) * ti)"))
          .cast("decimal(38,0)").as("num_present"),
        sum(expr("CAST(ti AS DECIMAL(38,0))")).cast("decimal(38,0)").as("ti_present"))
      .selectExpr("tok", "c",
        // absent sources: |0*T - C*t_i| summed = C*(T - ti_present)
        """round((CAST(num_present AS DOUBLE)
          |  + CAST(c AS DOUBLE) * (CAST(t AS DOUBLE) - CAST(ti_present AS DOUBLE)))
          |  / (2.0 * CAST(c AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS gries_dp""".stripMargin)
      .orderBy(col("c").desc, col("tok").asc)
  }
  val textGriesDpSql: String =
    """WITH toks AS (
      |  SELECT source, t.tok FROM documents,
      |    LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS tok) t
      |  WHERE strlen(t.tok) > 0),
      |bysrc AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS ci
      |  FROM toks GROUP BY 1, 2),
      |srcsizes AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS ti FROM toks GROUP BY 1),
      |toktot AS (SELECT tok, CAST(sum(ci) AS BIGINT) AS c FROM bysrc GROUP BY 1),
      |top AS (SELECT tok, c FROM toktot ORDER BY c DESC, tok LIMIT 10),
      |tt AS (SELECT CAST(sum(ti) AS BIGINT) AS t FROM srcsizes),
      |m AS (
      |  SELECT b.tok, max(top.c) AS c, max(tt.t) AS t,
      |    CAST(sum(abs(CAST(b.ci AS DECIMAL(38,0)) * tt.t
      |      - CAST(top.c AS DECIMAL(38,0)) * ss.ti)) AS DECIMAL(38,0)) AS num_present,
      |    CAST(sum(CAST(ss.ti AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ti_present
      |  FROM bysrc b JOIN top USING (tok) JOIN srcsizes ss USING (source), tt
      |  GROUP BY 1)
      |SELECT tok, c,
      |  round((CAST(num_present AS DOUBLE)
      |    + CAST(c AS DOUBLE) * (CAST(t AS DOUBLE) - CAST(ti_present AS DOUBLE)))
      |    / (2.0 * CAST(c AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS gries_dp
      |FROM m ORDER BY c DESC, tok""".stripMargin

  /** C673 analytics_atkinson_index — the Atkinson inequality index at
    * aversion ε = 1 on order values: A = 1 − geomean/mean, with the
    * geometric mean's Σln nano-quantized so the corpus sum is exact,
    * the arithmetic mean from exact cents. The welfare-weighted
    * sibling of the Gini/Theil rows.
    */
  def analyticsAtkinsonIndex(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("sc"),
        sum(expr("CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"))
          .cast("decimal(38,0)").as("sl"))
      .selectExpr("n",
        "CAST(sc AS DOUBLE) / n AS mean_",
        "exp(CAST(sl AS DOUBLE) / n / 1e9) AS gmean_")
      .selectExpr("n",
        "round(mean_ / 100, 2) AS mean_value",
        "round(gmean_ / 100, 2) AS geometric_mean",
        "round(1 - gmean_ / mean_, 6) AS atkinson_eps1")
  }
  val analyticsAtkinsonIndexSql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |  FROM orders),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
      |      AS DECIMAL(38,0)) AS sl
      |  FROM v),
      |p AS (
      |  SELECT n, CAST(sc AS DOUBLE) / n AS mean_,
      |    exp(CAST(sl AS DOUBLE) / n / 1e9) AS gmean_
      |  FROM m)
      |SELECT n,
      |  round(mean_ / 100, 2) AS mean_value,
      |  round(gmean_ / 100, 2) AS geometric_mean,
      |  round(1 - gmean_ / mean_, 6) AS atkinson_eps1
      |FROM p""".stripMargin

  /** C674 time_integrated_act — the integrated autocorrelation time
    * τ = 1 + 2Σₖ max(ρₖ,0), k = 1..30 (the effective-sample-size
    * deflator of MCMC and time-series practice; positive-truncated,
    * documented): all 30 autocovariances from ONE lead battery over
    * the bounded daily frame (cleared exact DECIMAL sums), the 30
    * ratios PIVOT into one row and τ + the first negative lag evaluate
    * in fixed textual order (the Higuchi discipline). ESS = n/τ.
    */
  def timeIntegratedAct(s: SparkSession, d: String): DataFrame = {
    val lags = 1 to 30
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = bars.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val w = Window.orderBy("day")
    val x0 = bars.crossJoin(broadcast(tot))
      .withColumn("x", expr("CAST(n * c - sc AS DECIMAL(38,0))"))
    val withLeads = lags.foldLeft(x0) { (df, k) =>
      df.withColumn(s"x$k", lead(col("x"), k).over(w))
    }
    val sumCols = sum(expr("x * x")).as("c0") +:
      lags.map(k => sum(expr(s"x * x$k")).as(s"c$k"))
    val sums = withLeads.agg(sumCols.head, sumCols.tail: _*)
    val rhoCols = lags.map(k =>
      s"CAST(c$k AS DOUBLE) / CAST(c0 AS DOUBLE) AS r$k")
    val tauExpr = lags.map(k => s"greatest(r$k, 0.0D)").mkString(" + ")
    val firstNeg = lags.map(k =>
      s"CASE WHEN r$k < 0 THEN ${k}L ELSE 99L END").mkString("least(", ", ", ")")
    sums.selectExpr(("CAST(1 AS BIGINT) AS one" +: rhoCols): _*)
      .crossJoin(broadcast(tot.selectExpr("CAST(n AS BIGINT) AS n_days")))
      .selectExpr("n_days",
        s"round(1 + 2 * ($tauExpr), 6) AS act_tau",
        s"round(n_days / (1 + 2 * ($tauExpr)), 2) AS ess",
        s"$firstNeg AS first_negative_lag")
  }
  val timeIntegratedActSql: String = {
    val lags = 1 to 30
    val leads = lags.map(k => s"lead(x, $k) OVER (ORDER BY day) AS x$k")
      .mkString(",\n      |    ")
    val csums = lags.map(k => s"sum(x * x$k) AS c$k").mkString(",\n      |    ")
    val rhos = lags.map(k =>
      s"CAST(c$k AS DOUBLE) / CAST(c0 AS DOUBLE) AS r$k").mkString(",\n      |    ")
    val tauExpr = lags.map(k => s"greatest(r$k, 0.0)").mkString(" + ")
    val firstNeg = lags.map(k =>
      s"CASE WHEN r$k < 0 THEN $k ELSE 99 END").mkString("least(", ", ", ")")
    s"""WITH bars AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
       |    CAST(sum(c) AS DECIMAL(38,0)) AS sc
       |  FROM bars),
       |x AS (
       |  SELECT day, CAST(n * c - sc AS DECIMAL(38,0)) AS x FROM bars, tot),
       |leads AS (
       |  SELECT x,
       |    $leads
       |  FROM x),
       |sums AS (
       |  SELECT sum(x * x) AS c0,
       |    $csums
       |  FROM leads),
       |rho AS (
       |  SELECT
       |    $rhos
       |  FROM sums)
       |SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_days,
       |  round(1 + 2 * ($tauExpr), 6) AS act_tau,
       |  round((SELECT CAST(n AS BIGINT) FROM tot) / (1 + 2 * ($tauExpr)), 2) AS ess,
       |  CAST($firstNeg AS BIGINT) AS first_negative_lag
       |FROM rho""".stripMargin
  }

  /** C675 stat_biweight_midvariance — Tukey's biweight midvariance of
    * quantity (the robust scale estimator that ignores outliers
    * smoothly): quantity has BOUNDED distinct values (≤50), so the
    * median and MAD are exact order statistics from histogram prefix
    * counts (smallest v with 2·cum ≥ n), and the biweight sums run
    * over the bounded value frame with count weights — per-value terms
    * micro-quantized, exact sums, one final ratio. Reported beside the
    * plain variance.
    */
  def statBiweightMidvariance(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .groupBy(expr("CAST(l_quantity AS BIGINT)").as("q"))
      .agg(count(lit(1)).cast("long").as("w"))
    val wp = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.agg(sum(col("w")).cast("long").as("n"),
      sum(expr("q * w")).cast("decimal(38,0)").as("sq"),
      sum(expr("CAST(q AS DECIMAL(38,0)) * q * w")).cast("decimal(38,0)").as("qq"))
    val withCl = hist.withColumn("cl", sum(col("w")).over(wp))
      .crossJoin(broadcast(tot))
    val med = withCl.filter(expr("2 * cl >= n"))
      .agg(min(col("q")).as("m")).selectExpr("CAST(m AS BIGINT) AS m")
    val hist2 = withCl.crossJoin(broadcast(med))
      .withColumn("ad", expr("abs(q - m)"))
      .groupBy("ad").agg(sum(col("w")).cast("long").as("w2"),
        max(col("n")).as("n"), max(col("m")).as("m"))
    val wp2 = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    val mad = hist2.withColumn("cl2", sum(col("w2")).over(wp2))
      .filter(expr("2 * cl2 >= n"))
      .agg(min(col("ad")).as("mad")).selectExpr("CAST(mad AS BIGINT) AS mad")
    withCl.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .withColumn("u", expr("CAST(q - m AS DOUBLE) / (9.0 * mad)"))
      .withColumn("num_q", expr(
        """CASE WHEN abs(u) < 1 THEN
          |  CAST(floor(w * CAST(q - m AS DOUBLE) * (q - m)
          |    * pow(1 - u * u, 4) * 1e6 + 0.5) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("den_q", expr(
        """CASE WHEN abs(u) < 1 THEN
          |  CAST(floor(w * (1 - u * u) * (1 - 5 * u * u) * 1e6 + 0.5) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .agg(max(col("n")).as("n"), max(col("m")).as("median_q"),
        max(col("mad")).as("mad_q"),
        sum(col("num_q")).cast("long").as("nq"),
        sum(col("den_q")).cast("long").as("dq"),
        max(expr(
          "CAST(CAST(n AS DECIMAL(38,0)) * qq - sq * sq AS DOUBLE) / (CAST(n AS DOUBLE) * n)"))
          .as("plain_var"))
      .selectExpr("n", "median_q", "mad_q",
        """round(n * (CAST(nq AS DOUBLE) / 1e6)
          |  / pow(CAST(dq AS DOUBLE) / 1e6, 2), 6) AS biweight_var""".stripMargin,
        "round(plain_var, 6) AS plain_var")
  }
  val statBiweightMidvarianceSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(w) AS BIGINT) AS n,
      |    CAST(sum(q * w) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(CAST(q AS DECIMAL(38,0)) * q * w) AS DECIMAL(38,0)) AS qq
      |  FROM hist),
      |wcl AS (
      |  SELECT q, w, CAST(sum(w) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM hist),
      |med AS (
      |  SELECT CAST(min(q) AS BIGINT) AS m FROM wcl, tot WHERE 2 * cl >= n),
      |h2 AS (
      |  SELECT abs(q - m) AS ad, CAST(sum(w) AS BIGINT) AS w2
      |  FROM wcl, med GROUP BY 1),
      |mad AS (
      |  SELECT CAST(min(ad) AS BIGINT) AS mad
      |  FROM (SELECT ad, CAST(sum(w2) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl2 FROM h2), tot
      |  WHERE 2 * cl2 >= n),
      |terms AS (
      |  SELECT w, q, m, mad, n, sq, qq,
      |    CAST(q - m AS DOUBLE) / (9.0 * mad) AS u
      |  FROM wcl, med, mad, tot),
      |qn AS (
      |  SELECT max(n) AS n, max(m) AS median_q, max(mad) AS mad_q,
      |    CAST(sum(CASE WHEN abs(u) < 1 THEN
      |      CAST(floor(w * CAST(q - m AS DOUBLE) * (q - m)
      |        * pow(1 - u * u, 4) * 1e6 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS nq,
      |    CAST(sum(CASE WHEN abs(u) < 1 THEN
      |      CAST(floor(w * (1 - u * u) * (1 - 5 * u * u) * 1e6 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS dq,
      |    max(CAST(CAST(n AS DECIMAL(38,0)) * qq - sq * sq AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n)) AS plain_var
      |  FROM terms)
      |SELECT n, median_q, mad_q,
      |  round(n * (CAST(nq AS DOUBLE) / 1e6) / pow(CAST(dq AS DOUBLE) / 1e6, 2), 6)
      |    AS biweight_var,
      |  round(plain_var, 6) AS plain_var
      |FROM qn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gries_dp" -> (textGriesDp _),
    "analytics_atkinson_index" -> (analyticsAtkinsonIndex _),
    "time_integrated_act" -> (timeIntegratedAct _),
    "stat_biweight_midvariance" -> (statBiweightMidvariance _),
  )

  val oracle: Map[String, String] = Map(
    "text_gries_dp" -> textGriesDpSql,
    "analytics_atkinson_index" -> analyticsAtkinsonIndexSql,
    "time_integrated_act" -> timeIntegratedActSql,
    "stat_biweight_midvariance" -> statBiweightMidvarianceSql,
  )
}
