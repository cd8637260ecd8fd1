package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 146 (C988–C991): meta-analysis over year strata + the
  * optimizer-injected runtime bloom filter exhibit — DerSimonian–Laird
  * random-effects pooling (with I²), Egger's funnel-asymmetry
  * regression, Stouffer's combined z (all over the per-year
  * deep-discount×return 2×2 effect sizes the C964 Woolf test
  * homogeneity-checks), and the Spark-4 InjectRuntimeFilter exhibit
  * (the engine builds a bloom filter from the dimension side at
  * RUNTIME and pushes it into the fact scan — the optimizer-owned
  * version of C-line join_bloom_prefilter's hand-built filter).
  *
  * Meta discipline: per-stratum log-ORs ·10¹² and variances ·10¹²
  * quantized, every cross-stratum sum an exact integer sum of per-
  * stratum quantized terms (·10⁶/·10⁹), Φ for the combined p via the
  * shared Zelen–Severo rational.
  */
object Extras246 {

  /** Per-year Haldane-corrected log-OR (·1e12 int) and its variance
    * (·1e12 int) for deep-discount exposure × return outcome, plus the
    * stratum size — the shared effect-size frame (bounded year strata).
    */
  private def effects(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"), "l_orderkey")
      .groupBy(expr("year(o_orderdate)").as("yr"))
      .agg(
        sum(expr("CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("a"),
        sum(expr("CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("b"),
        sum(expr("CASE WHEN NOT l_discount > 0.05 AND l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("c"),
        sum(expr("CASE WHEN NOT l_discount > 0.05 AND l_returnflag <> 'R' THEN 1L ELSE 0L END")).cast("long").as("dd"))
      .selectExpr("yr", "a + b + c + dd AS nst",
        """CAST(floor(ln((a + CAST(0.5 AS DOUBLE)) * (dd + CAST(0.5 AS DOUBLE))
          |  / ((b + CAST(0.5 AS DOUBLE)) * (c + CAST(0.5 AS DOUBLE)))) * 1e12 + 0.5)
          |  AS BIGINT) AS lq""".stripMargin,
        """CAST(floor((1 / (a + CAST(0.5 AS DOUBLE)) + 1 / (b + CAST(0.5 AS DOUBLE))
          |  + 1 / (c + CAST(0.5 AS DOUBLE)) + 1 / (dd + CAST(0.5 AS DOUBLE))) * 1e12 + 0.5)
          |  AS BIGINT) AS vq""".stripMargin)
      .localCheckpoint(true)
  private val effectsSql: String =
    """eff AS (
      |  SELECT yr, a + b + c + dd AS nst,
      |    CAST(floor(ln((a + CAST(0.5 AS DOUBLE)) * (dd + CAST(0.5 AS DOUBLE))
      |      / ((b + CAST(0.5 AS DOUBLE)) * (c + CAST(0.5 AS DOUBLE)))) * 1e12 + 0.5)
      |      AS BIGINT) AS lq,
      |    CAST(floor((1 / (a + CAST(0.5 AS DOUBLE)) + 1 / (b + CAST(0.5 AS DOUBLE))
      |      + 1 / (c + CAST(0.5 AS DOUBLE)) + 1 / (dd + CAST(0.5 AS DOUBLE))) * 1e12 + 0.5)
      |      AS BIGINT) AS vq
      |  FROM (
      |    SELECT year(o_orderdate) AS yr,
      |      CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |      CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |      CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |      CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS dd
      |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    GROUP BY 1))""".stripMargin

  /** C988 stat_dersimonian_laird — DerSimonian–Laird random-effects
    * pooling of the yearly log-ORs: FE weights 1/vᵢ, Cochran's Q,
    * τ² = max(0, (Q−df)/C), RE weights 1/(vᵢ+τ²), pooled effect with
    * its CI and the I² heterogeneity share. The pooling C964's Woolf
    * test licenses — and the honest version when it doesn't (τ² ≫ 0).
    * Per-stratum FE/RE weight terms quantize ·10⁶ before each sum.
    */
  def statDersimonianLaird(s: SparkSession, d: String): DataFrame = {
    val e = effects(s, d)
    val fe = e.agg(count(lit(1)).cast("long").as("k"),
      sum(expr("CAST(floor(1e12 / vq * 1e6 + 0.5) AS BIGINT)")).cast("long").as("sw"),
      sum(expr("CAST(floor(1e12 / vq * (lq / 1e12) * 1e6 + 0.5) AS BIGINT)")).cast("long").as("swl"),
      sum(expr("CAST(floor(1e12 / vq * (1e12 / vq) * 1e6 + 0.5) AS BIGINT)")).cast("long").as("sw2"))
      .selectExpr("k", "CAST(sw AS DOUBLE) / 1e6 AS sw",
        "CAST(swl AS DOUBLE) / 1e6 AS swl", "CAST(sw2 AS DOUBLE) / 1e6 AS sw2")
      .withColumn("mufe", expr("swl / sw"))
    val q = e.crossJoin(broadcast(fe))
      .agg(max(col("k")).as("k"), max(col("sw")).as("sw"),
        max(col("sw2")).as("sw2"), max(col("mufe")).as("mufe"),
        sum(expr(
          """CAST(floor(1e12 / vq * (lq / 1e12 - mufe) * (lq / 1e12 - mufe) * 1e6 + 0.5)
            |AS BIGINT)""".stripMargin)).cast("long").as("qq"))
      .withColumn("qstat", expr("CAST(qq AS DOUBLE) / 1e6"))
      .withColumn("tau2", expr(
        "greatest(CAST(0 AS DOUBLE), (qstat - (k - 1)) / (sw - sw2 / sw))"))
    e.crossJoin(broadcast(q))
      .agg(max(col("k")).as("k"), max(col("qstat")).as("qstat"),
        max(col("tau2")).as("tau2"),
        sum(expr("CAST(floor(1e12 / (vq + tau2 * 1e12) * 1e6 + 0.5) AS BIGINT)")).cast("long").as("swr"),
        sum(expr("CAST(floor(1e12 / (vq + tau2 * 1e12) * (lq / 1e12) * 1e6 + 0.5) AS BIGINT)")).cast("long").as("swrl"))
      .selectExpr("k AS n_strata", "round(tau2, 6) AS tau2",
        "round(greatest(CAST(0 AS DOUBLE), (qstat - (k - 1)) / qstat), 4) AS i2",
        "CAST(swrl AS DOUBLE) / swr AS mure",
        "CAST(1 AS DOUBLE) / (CAST(swr AS DOUBLE) / 1e6) AS vre")
      .selectExpr("n_strata", "tau2", "i2",
        "round(mure, 6) AS pooled_re_log_or",
        "round(mure - CAST(1.96 AS DOUBLE) * sqrt(vre), 6) AS re_lo95",
        "round(mure + CAST(1.96 AS DOUBLE) * sqrt(vre), 6) AS re_hi95")
  }
  val statDersimonianLairdSql: String =
    s"""WITH $effectsSql,
       |fe AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(CAST(sum(CAST(floor(1e12 / vq * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS sw,
       |    CAST(CAST(sum(CAST(floor(1e12 / vq * (lq / 1e12) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS swl,
       |    CAST(CAST(sum(CAST(floor(1e12 / vq * (1e12 / vq) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS sw2
       |  FROM eff),
       |fe2 AS (SELECT k, sw, sw2, swl / sw AS mufe FROM fe),
       |q AS (
       |  SELECT max(k) AS k, max(sw) AS sw, max(sw2) AS sw2, max(mufe) AS mufe,
       |    CAST(CAST(sum(CAST(floor(1e12 / vq * (lq / 1e12 - mufe) * (lq / 1e12 - mufe) * 1e6 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS qstat
       |  FROM eff, fe2),
       |q2 AS (
       |  SELECT k, qstat,
       |    greatest(CAST(0 AS DOUBLE), (qstat - (k - 1)) / (sw - sw2 / sw)) AS tau2
       |  FROM q),
       |re AS (
       |  SELECT max(k) AS k, max(qstat) AS qstat, max(tau2) AS tau2,
       |    CAST(sum(CAST(floor(1e12 / (vq + tau2 * 1e12) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swr,
       |    CAST(sum(CAST(floor(1e12 / (vq + tau2 * 1e12) * (lq / 1e12) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swrl
       |  FROM eff, q2)
       |SELECT k AS n_strata, round(tau2, 6) AS tau2,
       |  round(greatest(CAST(0 AS DOUBLE), (qstat - (k - 1)) / qstat), 4) AS i2,
       |  round(CAST(swrl AS DOUBLE) / swr, 6) AS pooled_re_log_or,
       |  round(CAST(swrl AS DOUBLE) / swr
       |    - CAST(1.96 AS DOUBLE) * sqrt(CAST(1 AS DOUBLE) / (CAST(swr AS DOUBLE) / 1e6)), 6) AS re_lo95,
       |  round(CAST(swrl AS DOUBLE) / swr
       |    + CAST(1.96 AS DOUBLE) * sqrt(CAST(1 AS DOUBLE) / (CAST(swr AS DOUBLE) / 1e6)), 6) AS re_hi95
       |FROM re""".stripMargin

  /** C989 stat_egger_test — Egger's funnel-plot asymmetry regression
    * over the yearly effects: standardized effect lorᵢ/seᵢ on
    * precision 1/seᵢ, the intercept (and its t) is the small-study
    * bias signal. Points quantize ·10⁹ into exact OLS moments over the
    * bounded strata. In a curation context: do low-information strata
    * systematically inflate the effect?
    */
  def statEggerTest(s: SparkSession, d: String): DataFrame = {
    val pts = effects(s, d)
      .selectExpr(
        "CAST(floor((lq / 1e12) / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS yq",
        "CAST(floor(1 / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS xq")
    pts.agg(count(lit(1)).cast("long").as("m"),
      sum(col("xq")).cast("decimal(38,0)").as("sx"),
      sum(col("yq")).cast("decimal(38,0)").as("sy"),
      sum(expr("CAST(xq AS DECIMAL(38,0)) * xq")).cast("decimal(38,0)").as("sxx"),
      sum(expr("CAST(xq AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as("sxy"),
      sum(expr("CAST(yq AS DECIMAL(38,0)) * yq")).cast("decimal(38,0)").as("syy"))
      .selectExpr("m",
        """(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |/ (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b""".stripMargin,
        "CAST(sx AS DOUBLE) / 1e9 AS sxr", "CAST(sy AS DOUBLE) / 1e9 AS syr",
        "CAST(sxx AS DOUBLE) / 1e18 AS sxxr", "CAST(sxy AS DOUBLE) / 1e18 AS sxyr",
        "CAST(syy AS DOUBLE) / 1e18 AS syyr")
      .selectExpr("m", "(syr - b * sxr) / m AS a", "b", "sxr", "sxxr",
        "syyr - syr * syr / m - b * (sxyr - sxr * syr / m) AS sse")
      .selectExpr("m AS n_strata", "round(a, 4) AS egger_intercept",
        """round(a / sqrt(sse / (m - 2) * sxxr / (m * sxxr - sxr * sxr)), 4) AS t_stat""".stripMargin,
        """abs(a / sqrt(sse / (m - 2) * sxxr / (m * sxxr - sxr * sxr))) > 2.571 AS asymmetric""".stripMargin)
  }
  val statEggerTestSql: String =
    s"""WITH $effectsSql,
       |pts AS (
       |  SELECT CAST(floor((lq / 1e12) / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS yq,
       |    CAST(floor(1 / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS xq
       |  FROM eff),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(CAST(xq AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
       |    CAST(sum(CAST(yq AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
       |    CAST(sum(CAST(xq AS HUGEINT) * xq) AS DECIMAL(38,0)) AS sxx,
       |    CAST(sum(CAST(xq AS HUGEINT) * yq) AS DECIMAL(38,0)) AS sxy,
       |    CAST(sum(CAST(yq AS HUGEINT) * yq) AS DECIMAL(38,0)) AS syy
       |  FROM pts),
       |fit AS (
       |  SELECT m,
       |    (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
       |    CAST(sx AS DOUBLE) / 1e9 AS sxr, CAST(sy AS DOUBLE) / 1e9 AS syr,
       |    CAST(sxx AS DOUBLE) / 1e18 AS sxxr, CAST(sxy AS DOUBLE) / 1e18 AS sxyr,
       |    CAST(syy AS DOUBLE) / 1e18 AS syyr
       |  FROM mom),
       |fit2 AS (
       |  SELECT m, (syr - b * sxr) / m AS a, b, sxr, sxxr,
       |    syyr - syr * syr / m - b * (sxyr - sxr * syr / m) AS sse
       |  FROM fit)
       |SELECT m AS n_strata, round(a, 4) AS egger_intercept,
       |  round(a / sqrt(sse / (m - 2) * sxxr / (m * sxxr - sxr * sxr)), 4) AS t_stat,
       |  abs(a / sqrt(sse / (m - 2) * sxxr / (m * sxxr - sxr * sxr))) > 2.571 AS asymmetric
       |FROM fit2""".stripMargin

  /** C990 stat_stouffer_combined — Stouffer's combined evidence across
    * the yearly effects: unweighted Z = Σzᵢ/√k and the √n-weighted
    * variant, with the two-sided p via the shared Zelen–Severo Φ.
    * Per-stratum z's quantize ·10⁹ into exact sums. The "seven weak
    * yearly signals, one strong combined verdict" mechanics of any
    * stratified monitoring rollup.
    */
  def statStoufferCombined(s: SparkSession, d: String): DataFrame = {
    val pts = effects(s, d)
      .selectExpr("nst",
        "CAST(floor((lq / 1e12) / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS zq",
        """CAST(floor(sqrt(CAST(nst AS DOUBLE)) * ((lq / 1e12) / sqrt(vq / 1e12)) * 1e9 + 0.5)
          |AS BIGINT) AS wzq""".stripMargin)
    val zStr = "(CAST(sz AS DOUBLE) / 1e9 / sqrt(CAST(k AS DOUBLE)))"
    pts.agg(count(lit(1)).cast("long").as("k"),
      sum(col("zq")).cast("long").as("sz"),
      sum(col("wzq")).cast("long").as("swz"),
      sum(col("nst")).cast("long").as("sn"))
      .selectExpr("k AS n_strata",
        s"round($zStr, 4) AS stouffer_z",
        """round(CAST(swz AS DOUBLE) / 1e9 / sqrt(CAST(sn AS DOUBLE)), 4) AS stouffer_z_weighted""".stripMargin,
        s"""round(2 * (1 - (CASE WHEN abs($zStr) >= 0
           |  THEN 1 - exp(-((abs($zStr)) * (abs($zStr))) / 2) / sqrt(2 * pi())
           |    * ((1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($zStr))) * (CAST(0.319381530 AS DOUBLE)
           |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($zStr))) * (CAST(-0.356563782 AS DOUBLE)
           |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($zStr))) * (CAST(1.781477937 AS DOUBLE)
           |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($zStr))) * (CAST(-1.821255978 AS DOUBLE)
           |      + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($zStr))) * CAST(1.330274429 AS DOUBLE))))))
           |  ELSE 0 END)), 6) AS combined_p_two_sided""".stripMargin)
  }
  val statStoufferCombinedSql: String = {
    val z = "(CAST(sz AS DOUBLE) / 1e9 / sqrt(CAST(k AS DOUBLE)))"
    s"""WITH $effectsSql,
       |pts AS (
       |  SELECT nst,
       |    CAST(floor((lq / 1e12) / sqrt(vq / 1e12) * 1e9 + 0.5) AS BIGINT) AS zq,
       |    CAST(floor(sqrt(CAST(nst AS DOUBLE)) * ((lq / 1e12) / sqrt(vq / 1e12)) * 1e9 + 0.5)
       |    AS BIGINT) AS wzq
       |  FROM eff),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(zq) AS BIGINT) AS sz,
       |    CAST(sum(wzq) AS BIGINT) AS swz, CAST(sum(nst) AS BIGINT) AS sn
       |  FROM pts)
       |SELECT k AS n_strata,
       |  round($z, 4) AS stouffer_z,
       |  round(CAST(swz AS DOUBLE) / 1e9 / sqrt(CAST(sn AS DOUBLE)), 4) AS stouffer_z_weighted,
       |  round(2 * (1 - (CASE WHEN abs($z) >= 0
       |    THEN 1 - exp(-((abs($z)) * (abs($z))) / 2) / sqrt(2 * pi())
       |      * ((1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($z))) * (CAST(0.319381530 AS DOUBLE)
       |        + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($z))) * (CAST(-0.356563782 AS DOUBLE)
       |        + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($z))) * (CAST(1.781477937 AS DOUBLE)
       |        + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($z))) * (CAST(-1.821255978 AS DOUBLE)
       |        + (1 / (1 + CAST(0.2316419 AS DOUBLE) * abs($z))) * CAST(1.330274429 AS DOUBLE))))))
       |    ELSE 0 END)), 6) AS combined_p_two_sided
       |FROM agg""".stripMargin
  }

  /** C991 exec_runtime_filter — the Spark-4 optimizer-injected runtime
    * bloom filter: with the application-side scan threshold dropped,
    * InjectRuntimeFilter builds a bloom filter over the URGENT order
    * keys at runtime and pushes `might_contain` into the lineitem scan
    * — no hand-built filter (contrast C-line join_bloom_prefilter,
    * which constructs one manually). At 100 TB this is the difference
    * between scanning the full fact table and skipping ~80% of it
    * before the join. Conf toggles are set on the (cloned) session and
    * restored; the result is the plain join aggregate either way.
    */
  def execRuntimeFilter(s: SparkSession, d: String): DataFrame = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      // a broadcast join needs no runtime filter; pin the shuffle-join
      // shape the 100 TB fact x dim join would take so the exhibit
      // exercises the injection at every test sf
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      lineitem(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
        .agg(count(lit(1)).cast("long").as("n_lines"),
          dsum(col("l_extendedprice")).as("urgent_revenue"))
        .localCheckpoint(true) // execute under the toggled confs
    } finally prev.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }
  val execRuntimeFilterSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
       |  ${graft.Tables.dsumSql("l_extendedprice")} AS urgent_revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_dersimonian_laird" -> (statDersimonianLaird _),
    "stat_egger_test" -> (statEggerTest _),
    "stat_stouffer_combined" -> (statStoufferCombined _),
    "exec_runtime_filter" -> (execRuntimeFilter _),
  )

  val oracle: Map[String, String] = Map(
    "stat_dersimonian_laird" -> statDersimonianLairdSql,
    "stat_egger_test" -> statEggerTestSql,
    "stat_stouffer_combined" -> statStoufferCombinedSql,
    "exec_runtime_filter" -> execRuntimeFilterSql,
  )
}
