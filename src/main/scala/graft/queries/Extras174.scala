package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 74 (C700–C703): Wilson intervals, hash-uniformity audit,
  * second-digit Benford, extremal index.
  */
object Extras174 {

  /** C700 stat_wilson_interval — the Wilson score interval for each
    * source's "english share" (the small-n-safe binomial CI the naive
    * Wald interval gets wrong): exact per-source counts over the
    * bounded source frame, the closed-form Wilson bounds in final
    * doubles (z = 1.96); top-5 sources by doc count for a stable
    * output, tie-break by source.
    */
  def statWilsonInterval(s: SparkSession, d: String): DataFrame = {
    documents(s, d).groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN lang = 'en' THEN 1L ELSE 0L END")).cast("long").as("x"))
      .orderBy(col("n").desc, col("source").asc)
      .limit(5)
      .selectExpr("source", "n", "x",
        "CAST(x AS DOUBLE) / n AS p")
      .selectExpr("source", "n", "x",
        "round(p, 6) AS p_hat",
        """round((p + 1.9208 / n - 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
          |  / (1 + 3.8416 / n), 6) AS wilson_lo""".stripMargin,
        """round((p + 1.9208 / n + 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
          |  / (1 + 3.8416 / n), 6) AS wilson_hi""".stripMargin)
      // explicit FINAL order (r10 ADVICE): the row order must not depend
      // on the engines happening to preserve the CTE's ORDER BY through
      // the outer projection
      .orderBy(col("n").desc, col("source").asc)
  }
  val statWilsonIntervalSql: String =
    """WITH src AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM documents GROUP BY 1
      |  ORDER BY n DESC, source LIMIT 5),
      |p AS (SELECT source, n, x, CAST(x AS DOUBLE) / n AS p FROM src)
      |SELECT source, n, x,
      |  round(p, 6) AS p_hat,
      |  round((p + 1.9208 / n - 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
      |    / (1 + 3.8416 / n), 6) AS wilson_lo,
      |  round((p + 1.9208 / n + 1.96 * sqrt(p * (1 - p) / n + 0.9604 / (CAST(n AS DOUBLE) * n)))
      |    / (1 + 3.8416 / n), 6) AS wilson_hi
      |FROM p ORDER BY n DESC, source""".stripMargin

  /** C701 sample_hash_uniformity_audit — the PRNG-idiom audit: the
    * md5-fraction uniforms every hash-sampling row relies on are
    * BINNED into 256 cells (bounded frame), the binned KS sup-gap and
    * the χ² against uniform computed from exact counts — validating
    * the repo's cross-engine pseudo-randomness machinery itself.
    */
  def sampleHashUniformityAudit(s: SparkSession, d: String): DataFrame = {
    val bins = orders(s, d)
      .select(expr(
        "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 2), 16, 10) AS BIGINT)").as("b"))
      .groupBy("b").agg(count(lit(1)).cast("long").as("w"))
    val wp = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("w")).cast("long").as("n"))
    bins
      .withColumn("cl", sum(col("w")).over(wp))
      .crossJoin(broadcast(tot))
      // KS gap at each bin boundary: |cl/n - (b+1)/256|, cross-multiplied
      .withColumn("gap256n", expr("abs(cl * 256 - (b + 1) * n)"))
      .withColumn("chi_q", expr(
        "CAST(floor(pow(w - CAST(n AS DOUBLE) / 256, 2) / (CAST(n AS DOUBLE) / 256) * 1e6 + 0.5) AS BIGINT)"))
      .agg(max(col("n")).as("n"),
        count(lit(1)).cast("long").as("bins_hit"),
        max(col("gap256n")).cast("long").as("maxgap"),
        sum(col("chi_q")).cast("long").as("chi6"))
      .selectExpr("n", "bins_hit",
        "round(CAST(maxgap AS DOUBLE) / 256 / n, 6) AS ks_d_binned",
        "round(CAST(chi6 AS DOUBLE) / 1e6, 4) AS chi2_255df",
        // chi2(255) 5% critical ~ 293.25
        "CAST(chi6 AS DOUBLE) / 1e6 > 293.25 AS reject_uniform")
  }
  val sampleHashUniformityAuditSql: String =
    """WITH bins AS (
      |  SELECT CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS BIGINT) AS BIGINT) AS b,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM bins),
      |pre AS (
      |  SELECT b, w,
      |    CAST(sum(w) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
      |  FROM bins),
      |q AS (
      |  SELECT n, abs(cl * 256 - (b + 1) * n) AS gap256n,
      |    CAST(floor(pow(w - CAST(n AS DOUBLE) / 256, 2) / (CAST(n AS DOUBLE) / 256) * 1e6 + 0.5) AS BIGINT) AS chi_q
      |  FROM pre, tot)
      |SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS bins_hit,
      |  round(CAST(max(gap256n) AS DOUBLE) / 256 / max(n), 6) AS ks_d_binned,
      |  round(CAST(CAST(sum(chi_q) AS BIGINT) AS DOUBLE) / 1e6, 4) AS chi2_255df,
      |  CAST(CAST(sum(chi_q) AS BIGINT) AS DOUBLE) / 1e6 > 293.25 AS reject_uniform
      |FROM q""".stripMargin

  /** C702 stat_benford_second_digit — the SECOND-digit Benford test
    * (the standard forensic follow-up to the first-digit row; catches
    * rounding manipulation the leading digit misses): second digit of
    * price cents via integer arithmetic, expected P(d) =
    * Σ_k log10(1+1/(10k+d)) as compile-time constants, χ² over the
    * bounded 10-digit frame from exact counts.
    */
  def statBenfordSecondDigit(s: SparkSession, d: String): DataFrame = {
    // expected second-digit probabilities (Benford), fixed constants
    val probs = (0 to 9).map { d0 =>
      (1 to 9).map(k => math.log10(1 + 1.0 / (10 * k + d0))).sum
    }
    val probExpr = (0 to 9).map(d0 => s"WHEN $d0 THEN ${probs(d0)}D")
      .mkString("CASE sd ", " ", " END")
    val digits = lineitem(s, d)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .filter(col("c") >= 10)
      .withColumn("sd", expr(
        """CAST(CAST(c AS STRING) AS BIGINT) div
          |  CAST(pow(10, length(CAST(c AS STRING)) - 2) AS BIGINT) % 10""".stripMargin))
      .groupBy("sd").agg(count(lit(1)).cast("long").as("w"))
    val tot = digits.agg(sum(col("w")).cast("long").as("n"))
    digits.crossJoin(broadcast(tot))
      .withColumn("p_exp", expr(probExpr))
      .selectExpr("sd AS second_digit", "w AS n_obs",
        "round(CAST(w AS DOUBLE) / n, 6) AS p_obs",
        "round(p_exp, 6) AS p_benford",
        "round(pow(w - p_exp * n, 2) / (p_exp * n), 4) AS chi2_term")
      .orderBy("second_digit")
  }
  val statBenfordSecondDigitSql: String = {
    val probs = (0 to 9).map { d0 =>
      (1 to 9).map(k => math.log10(1 + 1.0 / (10 * k + d0))).sum
    }
    val probExpr = (0 to 9).map(d0 => s"WHEN $d0 THEN CAST(${probs(d0)} AS DOUBLE)")
      .mkString("CASE sd ", " ", " END")
    s"""WITH digits AS (
       |  SELECT CAST(CAST(c AS VARCHAR) AS BIGINT)
       |      // CAST(pow(10, strlen(CAST(c AS VARCHAR)) - 2) AS BIGINT) % 10 AS sd
       |  FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
       |        FROM lineitem) WHERE c >= 10),
       |g AS (SELECT sd, CAST(count(*) AS BIGINT) AS w FROM digits GROUP BY 1),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM g)
       |SELECT sd AS second_digit, w AS n_obs,
       |  round(CAST(w AS DOUBLE) / n, 6) AS p_obs,
       |  round($probExpr, 6) AS p_benford,
       |  round(pow(w - ($probExpr) * n, 2) / (($probExpr) * n), 4) AS chi2_term
       |FROM g, tot ORDER BY 1""".stripMargin
  }

  /** C703 time_extremal_index — the blocks estimator of the extremal
    * index θ (do revenue spikes CLUSTER? — the EVT companion to the
    * Gumbel row; θ = 1 means independent extremes): the 95% threshold
    * is an exact order statistic over the bounded daily frame, θ̂ =
    * (#blocks of 10 days containing an exceedance)/(#exceedances),
    * both exact integer counts.
    */
  def timeExtremalIndex(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    val rn = bars.withColumn("rn", row_number().over(w).cast("long"))
    val tot = rn.agg(count(lit(1)).cast("long").as("n"))
    val thr = rn
      .withColumn("qr", row_number().over(Window.orderBy(col("c").asc, col("rn").asc))
        .cast("long"))
      .crossJoin(broadcast(tot))
      .filter(expr("qr * 20 >= 19 * n"))
      .agg(min(col("c")).as("u"))
    rn.crossJoin(broadcast(thr))
      .withColumn("exceed", expr("CASE WHEN c >= u THEN 1L ELSE 0L END"))
      .withColumn("block", expr("(rn - 1) div 10"))
      .groupBy("block")
      .agg(sum(col("exceed")).cast("long").as("ex"))
      .agg(sum(col("ex")).cast("long").as("n_exceed"),
        sum(expr("CASE WHEN ex > 0 THEN 1L ELSE 0L END")).cast("long").as("blocks_hit"),
        count(lit(1)).cast("long").as("n_blocks"))
      .selectExpr("n_blocks", "n_exceed", "blocks_hit",
        "round(CAST(blocks_hit AS DOUBLE) / n_exceed, 6) AS extremal_index")
  }
  val timeExtremalIndexSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |rn AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |  FROM bars),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rn),
      |thr AS (
      |  SELECT min(c) AS u FROM (
      |    SELECT c, CAST(row_number() OVER (ORDER BY c, rn) AS BIGINT) AS qr
      |    FROM rn), tot
      |  WHERE qr * 20 >= 19 * n),
      |blocks AS (
      |  SELECT (rn - 1) // 10 AS block,
      |    CAST(sum(CASE WHEN c >= u THEN 1 ELSE 0 END) AS BIGINT) AS ex
      |  FROM rn, thr GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(ex) AS BIGINT) AS n_exceed,
      |  CAST(sum(CASE WHEN ex > 0 THEN 1 ELSE 0 END) AS BIGINT) AS blocks_hit,
      |  round(CAST(sum(CASE WHEN ex > 0 THEN 1 ELSE 0 END) AS DOUBLE) / sum(ex), 6)
      |    AS extremal_index
      |FROM blocks""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_wilson_interval" -> (statWilsonInterval _),
    "sample_hash_uniformity_audit" -> (sampleHashUniformityAudit _),
    "stat_benford_second_digit" -> (statBenfordSecondDigit _),
    "time_extremal_index" -> (timeExtremalIndex _),
  )

  val oracle: Map[String, String] = Map(
    "stat_wilson_interval" -> statWilsonIntervalSql,
    "sample_hash_uniformity_audit" -> sampleHashUniformityAuditSql,
    "stat_benford_second_digit" -> statBenfordSecondDigitSql,
    "time_extremal_index" -> timeExtremalIndexSql,
  )
}
