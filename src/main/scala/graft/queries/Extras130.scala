package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 30 (C525–C527): Yule's K lexical diversity, Neyman sampling
  * allocation, and forecast-baseline MASE.
  */
object Extras130 {

  /** C525 text_yule_k — Yule's characteristic K per language
    * (repeat-rate lexical diversity, the scale-free companion to C482
    * hapax share): K = 10⁴·(Σ m²·V(m) − N)/N² over the frequency
    * spectrum V(m) = #types occurring m times. Σm²V(m) = Σ_type c² —
    * so one (lang, term) aggregate and one per-lang rollup, ALL exact
    * integers, one IEEE division. Also reports the spectrum head
    * V(1), V(2) pinning the spectrum construction.
    */
  def textYuleK(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).cast("long").as("c"))
    tf.groupBy("lang")
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(expr("c * c")).cast("long").as("sc2"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("v1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).cast("long").as("v2"))
      .selectExpr("lang", "n_tokens", "n_types", "v1", "v2",
        """round(1e4 * (sc2 - n_tokens)
          |  / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS yule_k""".stripMargin)
      .orderBy("lang")
  }
  val textYuleKSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2)
      |SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  round(1e4 * (CAST(sum(c * c) AS BIGINT) - CAST(sum(c) AS BIGINT))
      |    / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS BIGINT)), 6) AS yule_k
      |FROM tf GROUP BY lang ORDER BY lang""".stripMargin

  /** C526 sample_neyman_allocation — optimal stratified-sample
    * allocation (Neyman): given a 1000-doc budget, stratum h gets
    * n_h ∝ N_h·S_h (size × length stddev) — minimum-variance
    * allocation for estimating mean length. S_h is ONE IEEE sqrt over
    * the exact integer n·SS − S²; the allocation share normalizes by
    * the Σ over 5 bounded strata at a 1e-6 fixed-point grain (exact
    * BIGINT total), and seats round by floor + the largest-remainder
    * tie-broken on lang — fully deterministic, seats sum EXACTLY to
    * the budget (spec-checked).
    */
  def sampleNeymanAllocation(s: SparkSession, d: String): DataFrame = {
    val strata = documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("nh"),
        sum(col("n_chars")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars"))
          .cast("decimal(38,0)").as("s2"))
      .withColumn("nhsh_fx", expr(
        """CAST(floor(nh * sqrt(CAST(nh * s2 - s1 * s1 AS DOUBLE)
          |  / (CAST(nh AS DOUBLE) * nh)) * 1e6 + 0.5) AS BIGINT)""".stripMargin))
    val tot = strata.agg(sum(col("nhsh_fx")).cast("long").as("tot_fx"))
    val seats = strata.crossJoin(broadcast(tot))
      .withColumn("exact", expr("1000 * CAST(nhsh_fx AS DOUBLE) / tot_fx"))
      .withColumn("base", expr("CAST(floor(1000 * nhsh_fx / tot_fx) AS BIGINT)"))
      .withColumn("rem_rank", row_number().over(Window.orderBy(
        expr("1000 * nhsh_fx % tot_fx").desc, col("lang"))))
    seats
      .withColumn("deficit", expr(
        "1000 - sum(base) OVER ()"))
      .withColumn("n_alloc",
        col("base") + when(col("rem_rank") <= col("deficit"), 1L).otherwise(0L))
      .select(col("lang"), col("nh"), round(col("exact"), 4).as("exact_share"),
        col("n_alloc").cast("long").as("n_alloc"))
      .orderBy("lang")
  }
  val sampleNeymanAllocationSql: String =
    """WITH strata AS (
      |  SELECT lang, count(*) AS nh,
      |    CAST(sum(n_chars) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS DECIMAL(38,0)) AS s2
      |  FROM documents GROUP BY lang),
      |fx AS (
      |  SELECT lang, nh,
      |    CAST(floor(nh * sqrt(CAST(nh * s2 - s1 * s1 AS DOUBLE)
      |      / (CAST(nh AS DOUBLE) * nh)) * 1e6 + 0.5) AS BIGINT) AS nhsh_fx
      |  FROM strata),
      |tot AS (SELECT CAST(sum(nhsh_fx) AS BIGINT) AS tot_fx FROM fx),
      |seats AS (
      |  SELECT lang, nh, nhsh_fx, tot_fx,
      |    1000 * CAST(nhsh_fx AS DOUBLE) / tot_fx AS exact,
      |    CAST(floor(1000 * nhsh_fx / tot_fx) AS BIGINT) AS base,
      |    row_number() OVER (ORDER BY (1000 * nhsh_fx % tot_fx) DESC, lang)
      |      AS rem_rank
      |  FROM fx, tot)
      |SELECT lang, nh, round(exact, 4) AS exact_share,
      |  CAST(base + CASE WHEN rem_rank <= 1000 - (SELECT sum(base) FROM seats)
      |    THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
      |FROM seats ORDER BY lang""".stripMargin

  /** C527 time_seasonal_naive_mase — forecast-baseline evaluation on
    * the daily revenue series: MASE of the lag-7 seasonal-naive
    * forecast, scaled by the lag-1 naive baseline (Hyndman's
    * scale-free error — MASE < 1 means weekly seasonality beats
    * random-walk persistence). Both error sums are EXACT BIGINT cents
    * over the common evaluable window (t > 7); ONE IEEE division.
    * Also reports both MAEs in dollars.
    */
  def timeSeasonalNaiveMase(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wo = Window.orderBy("day")
    daily
      .withColumn("l1", lag(col("c"), 1).over(wo))
      .withColumn("l7", lag(col("c"), 7).over(wo))
      .filter(col("l7").isNotNull)
      .agg(
        count(lit(1)).cast("long").as("n_eval"),
        sum(abs(col("c") - col("l7"))).cast("long").as("sae_snaive"),
        sum(abs(col("c") - col("l1"))).cast("long").as("sae_naive"))
      .selectExpr("n_eval",
        "round(CAST(sae_snaive AS DOUBLE) / n_eval / 100, 6) AS mae_snaive",
        "round(CAST(sae_naive AS DOUBLE) / n_eval / 100, 6) AS mae_naive",
        "round(CAST(sae_snaive AS DOUBLE) / sae_naive, 6) AS mase")
      .selectExpr("n_eval", "mae_snaive", "mae_naive", "mase",
        "mase < 1.0 AS weekly_seasonality_helps")
  }
  val timeSeasonalNaiveMaseSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |lagged AS (
      |  SELECT c,
      |    lag(c, 1) OVER (ORDER BY day) AS l1,
      |    lag(c, 7) OVER (ORDER BY day) AS l7
      |  FROM daily),
      |agg AS (
      |  SELECT count(*) AS n_eval,
      |    CAST(sum(abs(c - l7)) AS BIGINT) AS sae_snaive,
      |    CAST(sum(abs(c - l1)) AS BIGINT) AS sae_naive
      |  FROM lagged WHERE l7 IS NOT NULL)
      |SELECT CAST(n_eval AS BIGINT) AS n_eval,
      |  round(CAST(sae_snaive AS DOUBLE) / n_eval / 100, 6) AS mae_snaive,
      |  round(CAST(sae_naive AS DOUBLE) / n_eval / 100, 6) AS mae_naive,
      |  round(CAST(sae_snaive AS DOUBLE) / sae_naive, 6) AS mase,
      |  round(CAST(sae_snaive AS DOUBLE) / sae_naive, 6) < 1.0
      |    AS weekly_seasonality_helps
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_yule_k" -> (textYuleK _),
    "sample_neyman_allocation" -> (sampleNeymanAllocation _),
    "time_seasonal_naive_mase" -> (timeSeasonalNaiveMase _),
  )

  val oracle: Map[String, String] = Map(
    "text_yule_k" -> textYuleKSql,
    "sample_neyman_allocation" -> sampleNeymanAllocationSql,
    "time_seasonal_naive_mase" -> timeSeasonalNaiveMaseSql,
  )
}
