package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 73 (C696–C699): Tukey trimean, Lorenz asymmetry, stochastic
  * oscillator, source-mix diversity.
  */
object Extras173 {

  /** C696 stat_tukey_trimean — the robust location battery on the
    * bounded quantity domain: Q1/median/Q3 as EXACT histogram order
    * statistics (smallest v with 4·cum ≥ n / 2·cum ≥ n / 4·cum ≥ 3n —
    * the lower-statistic convention both engines share), trimean =
    * (Q1+2Q2+Q3)/4 and midhinge = (Q1+Q3)/2 as two final divisions.
    */
  def statTukeyTrimean(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .groupBy(expr("CAST(l_quantity AS BIGINT)").as("q"))
      .agg(count(lit(1)).cast("long").as("w"))
    val wp = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    val tot = hist.agg(sum(col("w")).cast("long").as("n"))
    val withCl = hist.withColumn("cl", sum(col("w")).over(wp))
      .crossJoin(broadcast(tot))
    withCl.agg(max(col("n")).as("n"),
        min(expr("CASE WHEN 4 * cl >= n THEN q END")).as("q1"),
        min(expr("CASE WHEN 2 * cl >= n THEN q END")).as("q2"),
        min(expr("CASE WHEN 4 * cl >= 3 * n THEN q END")).as("q3"))
      .selectExpr("n", "q1", "q2", "q3",
        "round(CAST(q1 + 2 * q2 + q3 AS DOUBLE) / 4, 2) AS trimean",
        "round(CAST(q1 + q3 AS DOUBLE) / 2, 2) AS midhinge")
  }
  val statTukeyTrimeanSql: String =
    """WITH hist AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM hist),
      |wcl AS (
      |  SELECT q, CAST(sum(w) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM hist),
      |m AS (
      |  SELECT max(n) AS n,
      |    min(CASE WHEN 4 * cl >= n THEN q END) AS q1,
      |    min(CASE WHEN 2 * cl >= n THEN q END) AS q2,
      |    min(CASE WHEN 4 * cl >= 3 * n THEN q END) AS q3
      |  FROM wcl, tot)
      |SELECT n, q1, q2, q3,
      |  round(CAST(q1 + 2 * q2 + q3 AS DOUBLE) / 4, 2) AS trimean,
      |  round(CAST(q1 + q3 AS DOUBLE) / 2, 2) AS midhinge
      |FROM m""".stripMargin

  /** C697 stat_lorenz_asymmetry — the Lorenz asymmetry coefficient
    * S = F(μ) + L(μ) on order values (S ≠ 1 tells WHICH tail drives
    * the inequality the Gini alone can't): F(μ) = share of orders
    * below the mean, L(μ) = their value share — both EXACT via
    * cross-multiplied comparisons (c·n vs S) — two divisions at the
    * end. S < 1 means inequality comes from many small units.
    */
  def statLorenzAsymmetry(s: SparkSession, d: String): DataFrame = {
    val v = orders(s, d).select(
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
    val tot = v.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    v.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("sc")).as("sc"),
        sum(expr("CASE WHEN CAST(c AS DECIMAL(38,0)) * n < sc THEN 1L ELSE 0L END"))
          .cast("long").as("n_below"),
        sum(expr("CASE WHEN CAST(c AS DECIMAL(38,0)) * n < sc THEN c ELSE 0L END"))
          .cast("decimal(38,0)").as("v_below"))
      .selectExpr("n", "n_below",
        "round(CAST(n_below AS DOUBLE) / n, 6) AS f_mu",
        "round(CAST(v_below AS DOUBLE) / CAST(sc AS DOUBLE), 6) AS l_mu")
      .selectExpr("n", "n_below", "f_mu", "l_mu",
        "round(f_mu + l_mu, 6) AS lorenz_asymmetry")
  }
  val statLorenzAsymmetrySql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |  FROM orders),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS sc
      |  FROM v),
      |m AS (
      |  SELECT max(n) AS n, max(sc) AS sc,
      |    CAST(sum(CASE WHEN CAST(c AS DECIMAL(38,0)) * n < sc THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |    CAST(sum(CASE WHEN CAST(c AS DECIMAL(38,0)) * n < sc THEN c ELSE 0 END) AS DECIMAL(38,0)) AS v_below
      |  FROM v, tot),
      |p AS (
      |  SELECT n, n_below,
      |    round(CAST(n_below AS DOUBLE) / n, 6) AS f_mu,
      |    round(CAST(v_below AS DOUBLE) / CAST(sc AS DOUBLE), 6) AS l_mu
      |  FROM m)
      |SELECT n, n_below, f_mu, l_mu,
      |  round(f_mu + l_mu, 6) AS lorenz_asymmetry
      |FROM p""".stripMargin

  /** C698 win_stochastic_oscillator — the %K/%D stochastic on daily
    * bars: %K = 100(C−L14)/(H14−L14) PPM-QUANTIZED once per day (the
    * only division), %D = 3-bar mean of the quantized %K as an exact
    * integer sum, overbought/oversold census and K/D cross count —
    * exact ints after the single quantization.
    */
  def winStochasticOscillator(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(max(col("p")).as("h"), min(col("p")).as("l"),
        max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"))
      .selectExpr("day", "h", "l", "lo.p AS c")
    val w14 = Window.orderBy("day").rowsBetween(-13, 0)
    val wd = Window.orderBy("day")
    val kd = bars
      .withColumn("h14", max(col("h")).over(w14))
      .withColumn("l14", min(col("l")).over(w14))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") >= 14)
      .withColumn("k_ppm", expr(
        "(1000000L * (c - l14)) div (h14 - l14)"))
      .withColumn("d_ppm3", expr(
        """k_ppm + coalesce(lag(k_ppm, 1) OVER (ORDER BY day), 0L)
          |  + coalesce(lag(k_ppm, 2) OVER (ORDER BY day), 0L)""".stripMargin))
      .filter(col("rn") >= 16)
      .withColumn("cross", expr(
        """CASE WHEN (3 * k_ppm - d_ppm3)
          |  * (3 * lag(k_ppm, 1) OVER (ORDER BY day)
          |     - lag(d_ppm3, 1) OVER (ORDER BY day)) < 0 THEN 1L ELSE 0L END""".stripMargin))
    kd.agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CASE WHEN k_ppm > 800000 THEN 1L ELSE 0L END")).cast("long").as("n_overbought"),
        sum(expr("CASE WHEN k_ppm < 200000 THEN 1L ELSE 0L END")).cast("long").as("n_oversold"),
        sum(col("cross")).cast("long").as("kd_crosses"),
        sum(col("k_ppm")).cast("long").as("ks"))
      .selectExpr("n_days", "n_overbought", "n_oversold", "kd_crosses",
        "round(CAST(ks AS DOUBLE) / n_days / 1e4, 4) AS mean_k_pct")
  }
  val winStochasticOscillatorSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day, max(p) AS h, min(p) AS l,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c
      |  FROM px GROUP BY day),
      |k0 AS (
      |  SELECT day, c,
      |    max(h) OVER w14 AS h14, min(l) OVER w14 AS l14,
      |    row_number() OVER (ORDER BY day) AS rn
      |  FROM bars
      |  WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      |k1 AS (
      |  SELECT day, rn,
      |    (1000000 * (c - l14)) // (h14 - l14) AS k_ppm
      |  FROM k0 WHERE rn >= 14),
      |k2 AS (
      |  SELECT day, rn, k_ppm,
      |    k_ppm + coalesce(lag(k_ppm, 1) OVER (ORDER BY day), 0)
      |      + coalesce(lag(k_ppm, 2) OVER (ORDER BY day), 0) AS d_ppm3
      |  FROM k1),
      |k3 AS (
      |  SELECT k_ppm, d_ppm3,
      |    CASE WHEN (3 * k_ppm - d_ppm3)
      |      * (3 * lag(k_ppm, 1) OVER (ORDER BY day)
      |         - lag(d_ppm3, 1) OVER (ORDER BY day)) < 0 THEN 1 ELSE 0 END AS crs
      |  FROM k2 WHERE rn >= 16)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN k_ppm > 800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_overbought,
      |  CAST(sum(CASE WHEN k_ppm < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversold,
      |  CAST(sum(crs) AS BIGINT) AS kd_crosses,
      |  round(CAST(CAST(sum(k_ppm) AS BIGINT) AS DOUBLE) / count(*) / 1e4, 4)
      |    AS mean_k_pct
      |FROM k3""".stripMargin

  /** C699 pipeline_source_diversity — the effective number of sources
    * in the corpus mix (exp of Shannon entropy — the "how many sources
    * is this really" scalar of data-mixture audits): per-source shares
    * are exact rationals over the BOUNDED source frame, each −p·ln p
    * term micro-quantized so the entropy sum is exact, ENS = exp(H)
    * and evenness = H/ln k as final doubles; the token-weighted
    * variant beside the doc-weighted one.
    */
  def pipelineSourceDiversity(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).groupBy("source")
      .agg(count(lit(1)).cast("long").as("nd"),
        sum(expr("CAST(n_chars AS BIGINT)")).cast("long").as("nc"))
    val tot = src.agg(sum(col("nd")).cast("long").as("td"),
      sum(col("nc")).cast("long").as("tc"),
      count(lit(1)).cast("long").as("k"))
    src.crossJoin(broadcast(tot))
      .agg(max(col("k")).as("k"),
        sum(expr(
          "CAST(floor(-(CAST(nd AS DOUBLE) / td) * ln(CAST(nd AS DOUBLE) / td) * 1e9 + 0.5) AS BIGINT)"))
          .cast("long").as("hd9"),
        sum(expr(
          "CAST(floor(-(CAST(nc AS DOUBLE) / tc) * ln(CAST(nc AS DOUBLE) / tc) * 1e9 + 0.5) AS BIGINT)"))
          .cast("long").as("hc9"))
      .selectExpr("k",
        "round(exp(CAST(hd9 AS DOUBLE) / 1e9), 4) AS effective_sources_docs",
        "round(exp(CAST(hc9 AS DOUBLE) / 1e9), 4) AS effective_sources_chars",
        "round(CAST(hd9 AS DOUBLE) / 1e9 / ln(CAST(k AS DOUBLE)), 6) AS evenness_docs")
  }
  val pipelineSourceDiversitySql: String =
    """WITH src AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS nd,
      |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS nc
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(nd) AS BIGINT) AS td, CAST(sum(nc) AS BIGINT) AS tc,
      |    CAST(count(*) AS BIGINT) AS k
      |  FROM src),
      |m AS (
      |  SELECT max(k) AS k,
      |    CAST(sum(CAST(floor(-(CAST(nd AS DOUBLE) / td) * ln(CAST(nd AS DOUBLE) / td) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS hd9,
      |    CAST(sum(CAST(floor(-(CAST(nc AS DOUBLE) / tc) * ln(CAST(nc AS DOUBLE) / tc) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS hc9
      |  FROM src, tot)
      |SELECT k,
      |  round(exp(CAST(hd9 AS DOUBLE) / 1e9), 4) AS effective_sources_docs,
      |  round(exp(CAST(hc9 AS DOUBLE) / 1e9), 4) AS effective_sources_chars,
      |  round(CAST(hd9 AS DOUBLE) / 1e9 / ln(CAST(k AS DOUBLE)), 6) AS evenness_docs
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_tukey_trimean" -> (statTukeyTrimean _),
    "stat_lorenz_asymmetry" -> (statLorenzAsymmetry _),
    "win_stochastic_oscillator" -> (winStochasticOscillator _),
    "pipeline_source_diversity" -> (pipelineSourceDiversity _),
  )

  val oracle: Map[String, String] = Map(
    "stat_tukey_trimean" -> statTukeyTrimeanSql,
    "stat_lorenz_asymmetry" -> statLorenzAsymmetrySql,
    "win_stochastic_oscillator" -> winStochasticOscillatorSql,
    "pipeline_source_diversity" -> pipelineSourceDiversitySql,
  )
}
