package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 40 (C564–C567): Engle–Granger cointegration, price/volume
  * decomposition, Chow break test, and Horvitz–Thompson estimation.
  */
object Extras140 {

  /** C564 stat_engle_granger_coint — Engle–Granger two-step
    * cointegration between daily revenue and daily line-count: step 1
    * fits y ~ a + b·x in closed form and QUANTIZES the cleared-
    * denominator residual to milli-cent fixed point (the C528 idiom —
    * ê·nD is exact integer algebra, one IEEE division + floor, so the
    * residual SERIES is bit-identical across engines); step 2 runs the
    * no-constant Dickey–Fuller on that integer series (Σe·Δe, Σe² in
    * DECIMAL(38,0), one fixed chain for ρ, s², t). Composite of two
    * exact-OLS machines with an integer hand-off — never a float
    * column between stages.
    */
  def statEngleGrangerCoint(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("y"),
        count(lit(1)).cast("long").as("x"))
    val fit = daily.agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .selectExpr("n", "sx", "sy",
        "CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS nb",
        "CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS dd")
      .selectExpr("n", "nb", "dd",
        "sy * dd - nb * sx AS a2",
        "CAST(n AS DECIMAL(38,0)) * dd AS nd")
    val resid = daily.crossJoin(broadcast(fit))
      .selectExpr("day", "n", "nb", "dd", "nd",
        """CAST(floor(CAST(CAST(y AS DECIMAL(38,0)) * nd - a2
          |  - nb * CAST(n AS DECIMAL(38,0)) * x AS DOUBLE)
          |  / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e""".stripMargin)
      .withColumn("ep", lag(col("e"), 1).over(Window.orderBy("day")))
      .filter(col("ep").isNotNull)
    resid
      .agg(
        max(col("nb")).as("nb"), max(col("dd")).as("dd"),
        count(lit(1)).cast("long").as("m"),
        sum(expr("CAST(ep AS DECIMAL(38,0)) * (e - ep)")).as("sed"),
        sum(expr("CAST(ep AS DECIMAL(38,0)) * ep")).as("see"),
        sum(expr("CAST(e - ep AS DECIMAL(38,0)) * (e - ep)")).as("sdd"))
      .selectExpr("m",
        "CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) AS b",
        "CAST(sed AS DOUBLE) AS sedd", "CAST(see AS DOUBLE) AS seed",
        "CAST(sdd AS DOUBLE) AS sddd")
      .selectExpr("m", "b", "seed",
        "sedd / seed AS rho",
        "(sddd - sedd / seed * sedd) / (m - 2) AS s2")
      .selectExpr("m AS n_obs",
        "round(b, 9) AS coint_coef",
        "round(rho / sqrt(s2 / seed), 6) AS eg_t",
        """CASE WHEN rho / sqrt(s2 / seed) < -3.34
          |  THEN 'cointegrated_5pct' ELSE 'no_cointegration' END
          |  AS verdict""".stripMargin)
  }
  val statEngleGrangerCointSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1),
      |fit AS (
      |  SELECT n, nb, dd, sy * dd - nb * sx AS a2,
      |    CAST(n AS DECIMAL(38,0)) * dd AS nd
      |  FROM (
      |    SELECT n, sx, sy,
      |      CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS nb,
      |      CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS dd
      |    FROM (
      |      SELECT CAST(count(*) AS BIGINT) AS n,
      |        sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |        sum(CAST(y AS DECIMAL(38,0))) AS sy,
      |        sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |        sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      |      FROM daily))),
      |resid AS (
      |  SELECT day, nb, dd,
      |    CAST(floor(CAST(CAST(y AS DECIMAL(38,0)) * nd - a2
      |      - nb * CAST(n AS DECIMAL(38,0)) * x AS DOUBLE)
      |      / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e
      |  FROM daily, fit),
      |lagged AS (
      |  SELECT nb, dd, e, lag(e, 1) OVER (ORDER BY day) AS ep
      |  FROM resid),
      |sums AS (
      |  SELECT max(nb) AS nb, max(dd) AS dd,
      |    CAST(count(*) AS BIGINT) AS m,
      |    sum(CAST(ep AS DECIMAL(38,0)) * (e - ep)) AS sed,
      |    sum(CAST(ep AS DECIMAL(38,0)) * ep) AS see,
      |    sum(CAST(e - ep AS DECIMAL(38,0)) * (e - ep)) AS sdd
      |  FROM lagged WHERE ep IS NOT NULL),
      |dbl AS (
      |  SELECT m, CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) AS b,
      |    CAST(sed AS DOUBLE) AS sedd, CAST(see AS DOUBLE) AS seed,
      |    CAST(sdd AS DOUBLE) AS sddd
      |  FROM sums),
      |st AS (
      |  SELECT m, b, seed, sedd / seed AS rho,
      |    (sddd - sedd / seed * sedd) / (m - 2) AS s2
      |  FROM dbl)
      |SELECT m AS n_obs, round(b, 9) AS coint_coef,
      |  round(rho / sqrt(s2 / seed), 6) AS eg_t,
      |  CASE WHEN rho / sqrt(s2 / seed) < -3.34
      |    THEN 'cointegrated_5pct' ELSE 'no_cointegration' END AS verdict
      |FROM st""".stripMargin

  /** C565 analytics_price_volume_mix — the BI price/volume
    * decomposition of per-brand revenue change between 1996 and 1997:
    * price effect = (r1·q0 − r0·q1)/q0, volume effect = r0·(q1−q0)/q0
    * — numerators EXACT integer cents·quantity (l_quantity is
    * integral), ONE IEEE division per effect, and the two effects sum
    * to Δrevenue identically (spec-asserted). One conditional
    * aggregate per brand over the broadcast part dimension; brands
    * with no 1996 baseline report null effects (no fake zero).
    */
  def analyticsPriceVolumeMix(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .filter(expr("year(l_shipdate) IN (1996, 1997)"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), expr("year(l_shipdate)").as("yr"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("r"))
    li.groupBy("p_brand")
      .agg(
        sum(when(col("yr") === 1996, col("q")).otherwise(0L)).cast("long").as("q0"),
        sum(when(col("yr") === 1996, col("r")).otherwise(0L)).cast("long").as("r0"),
        sum(when(col("yr") === 1997, col("q")).otherwise(0L)).cast("long").as("q1"),
        sum(when(col("yr") === 1997, col("r")).otherwise(0L)).cast("long").as("r1"))
      .selectExpr("p_brand", "q0", "q1",
        "round(CAST(r1 - r0 AS DOUBLE) / 100, 6) AS delta_revenue",
        """round(CAST(CAST(r1 AS DECIMAL(38,0)) * q0
          |  - CAST(r0 AS DECIMAL(38,0)) * q1 AS DOUBLE)
          |  / nullif(q0, 0) / 100, 6) AS price_effect""".stripMargin,
        """round(CAST(CAST(r0 AS DECIMAL(38,0)) * (q1 - q0) AS DOUBLE)
          |  / nullif(q0, 0) / 100, 6) AS volume_effect""".stripMargin)
      .orderBy("p_brand")
  }
  val analyticsPriceVolumeMixSql: String =
    """WITH li AS (
      |  SELECT p_brand, year(l_shipdate) AS yr,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE year(l_shipdate) IN (1996, 1997)),
      |agg AS (
      |  SELECT p_brand,
      |    CAST(sum(CASE WHEN yr = 1996 THEN q ELSE 0 END) AS BIGINT) AS q0,
      |    CAST(sum(CASE WHEN yr = 1996 THEN r ELSE 0 END) AS BIGINT) AS r0,
      |    CAST(sum(CASE WHEN yr = 1997 THEN q ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(sum(CASE WHEN yr = 1997 THEN r ELSE 0 END) AS BIGINT) AS r1
      |  FROM li GROUP BY p_brand)
      |SELECT p_brand, q0, q1,
      |  round(CAST(r1 - r0 AS DOUBLE) / 100, 6) AS delta_revenue,
      |  round(CAST(CAST(r1 AS DECIMAL(38,0)) * q0
      |    - CAST(r0 AS DECIMAL(38,0)) * q1 AS DOUBLE)
      |    / nullif(q0, 0) / 100, 6) AS price_effect,
      |  round(CAST(CAST(r0 AS DECIMAL(38,0)) * (q1 - q0) AS DOUBLE)
      |    / nullif(q0, 0) / 100, 6) AS volume_effect
      |FROM agg ORDER BY p_brand""".stripMargin

  /** C566 stat_chow_break — Chow structural-break test for the daily
    * revenue trend at the sample midpoint: pooled and both-half OLS
    * fits all come from ONE pass of conditional exact sums (CASE on
    * t ≤ m), RSS via the centered identity per regime, and
    * F = ((RSSp − RSS1 − RSS2)/2)/((RSS1 + RSS2)/(n−4)) in a single
    * fixed-order chain. Never materializes residuals, never scans
    * twice.
    */
  def statChowBreak(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("seg", expr("CASE WHEN t <= n div 2 THEN 0 ELSE 1 END"))
    def sums(tag: String, cond: String) = Seq(
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS n$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS st$tag",
      s"sum(CASE WHEN $cond THEN CAST(c AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sc$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) * t ELSE CAST(0 AS DECIMAL(38,0)) END) AS stt$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END) AS stc$tag",
      s"sum(CASE WHEN $cond THEN CAST(c AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END) AS scc$tag")
    val allSums = sums("p", "TRUE") ++ sums("a", "seg = 0") ++ sums("b", "seg = 1")
    def rss(tag: String) =
      s"""(CAST(n$tag * scc$tag - sc$tag * sc$tag AS DOUBLE)
         |  - CAST(n$tag * stc$tag - st$tag * sc$tag AS DOUBLE)
         |    / CAST(n$tag * stt$tag - st$tag * st$tag AS DOUBLE)
         |    * CAST(n$tag * stc$tag - st$tag * sc$tag AS DOUBLE))
         |  / CAST(n$tag AS DOUBLE)""".stripMargin
    daily
      .agg(expr(allSums.head), allSums.tail.map(expr): _*)
      .selectExpr("CAST(np AS BIGINT) AS n_days",
        s"round((${rss("p")} - (${rss("a")}) - (${rss("b")})) / 2 " +
          s"/ (((${rss("a")}) + (${rss("b")})) / (CAST(np AS DOUBLE) - 4)), 6) AS chow_f",
        s"""CASE WHEN (${rss("p")} - (${rss("a")}) - (${rss("b")})) / 2
           |  / (((${rss("a")}) + (${rss("b")})) / (CAST(np AS DOUBLE) - 4))
           |  > 3.0 THEN 'break_5pct' ELSE 'stable' END AS verdict""".stripMargin)
  }
  val statChowBreakSql: String = {
    def sums(tag: String, cond: String) = Seq(
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS n$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS st$tag",
      s"sum(CASE WHEN $cond THEN CAST(c AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS sc$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) * t ELSE CAST(0 AS DECIMAL(38,0)) END) AS stt$tag",
      s"sum(CASE WHEN $cond THEN CAST(t AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END) AS stc$tag",
      s"sum(CASE WHEN $cond THEN CAST(c AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END) AS scc$tag")
    val allSums = (sums("p", "TRUE") ++ sums("a", "seg = 0") ++ sums("b", "seg = 1"))
      .mkString(",\n      |    ")
    def rss(tag: String) =
      s"""(CAST(n$tag * scc$tag - sc$tag * sc$tag AS DOUBLE)
         |    - CAST(n$tag * stc$tag - st$tag * sc$tag AS DOUBLE)
         |      / CAST(n$tag * stt$tag - st$tag * st$tag AS DOUBLE)
         |      * CAST(n$tag * stc$tag - st$tag * sc$tag AS DOUBLE))
         |    / CAST(n$tag AS DOUBLE)""".stripMargin
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |idx AS (
       |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |    CAST(count(*) OVER () AS BIGINT) AS nn
       |  FROM daily),
       |seg AS (
       |  SELECT t, c, CASE WHEN t <= nn // 2 THEN 0 ELSE 1 END AS seg
       |  FROM idx),
       |sums AS (
       |  SELECT $allSums
       |  FROM seg)
       |SELECT CAST(np AS BIGINT) AS n_days,
       |  round((${rss("p")} - (${rss("a")}) - (${rss("b")})) / 2
       |    / (((${rss("a")}) + (${rss("b")})) / (CAST(np AS DOUBLE) - 4)), 6)
       |    AS chow_f,
       |  CASE WHEN (${rss("p")} - (${rss("a")}) - (${rss("b")})) / 2
       |    / (((${rss("a")}) + (${rss("b")})) / (CAST(np AS DOUBLE) - 4))
       |    > 3.0 THEN 'break_5pct' ELSE 'stable' END AS verdict
       |FROM sums""".stripMargin
  }

  /** C567 sample_horvitz_thompson — Horvitz–Thompson population-total
    * estimation from a size-proportional deterministic sample:
    * π_o = min(1, K·c_o/Σc) with K = 1000, inclusion decided by the
    * md5-fraction integer h against π CROSS-MULTIPLIED in
    * DECIMAL(38,0) (h·Σc < K·c·2²⁴ — no float anywhere in the draw),
    * and Σĉ = Σ_{certain} c + #(non-certain sampled)·Σc/K by the HT
    * identity (value/π is CONSTANT off the certainty stratum — the
    * estimate needs ONE division). Reports the estimate beside the
    * true total and the exact ppm error.
    */
  def sampleHorvitzThompson(s: SparkSession, d: String): DataFrame = {
    val K = 1000L
    val base = orders(s, d).select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('ht:', o_orderkey)), 1, 6), 16, 10) AS BIGINT)"))
    val tot = base.agg(sum(expr("CAST(c AS DECIMAL(38,0))")).as("sc"),
      count(lit(1)).cast("long").as("n"))
    base.crossJoin(broadcast(tot))
      .selectExpr("c", "n", "sc",
        s"CAST($K AS DECIMAL(38,0)) * c >= sc AS certain",
        s"CAST(h AS DECIMAL(38,0)) * sc < CAST($K AS DECIMAL(38,0)) * c * 16777216 AS drawn")
      .agg(
        max(col("n")).as("n"), max(col("sc")).as("sc"),
        sum(expr("CASE WHEN certain THEN CAST(c AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("cert_c"),
        sum(expr("CASE WHEN certain THEN 1L ELSE 0L END")).cast("long").as("n_cert"),
        sum(expr("CASE WHEN NOT certain AND drawn THEN 1L ELSE 0L END")).cast("long").as("n_draw"))
      // dollars rounded to CENTS (2dp): at ~1e10 magnitude a double's
      // ulp exceeds a 1e-6 rounding grid, so round(,6) was an identity
      // and a 1-ulp decimal->double divergence between engines survived
      // it (caught by the r11 sf0.1 sweep compare)
      .selectExpr("n AS n_orders", "n_cert + n_draw AS n_sampled",
        s"""round((CAST(cert_c AS DOUBLE)
           |  + CAST(n_draw AS DOUBLE) * CAST(sc AS DOUBLE) / $K) / 100, 2)
           |  AS ht_estimate""".stripMargin,
        "round(CAST(sc AS DOUBLE) / 100, 2) AS true_total",
        s"""round(((CAST(cert_c AS DOUBLE)
           |  + CAST(n_draw AS DOUBLE) * CAST(sc AS DOUBLE) / $K)
           |  - CAST(sc AS DOUBLE)) / CAST(sc AS DOUBLE) * 1000000, 4)
           |  AS err_ppm""".stripMargin)
  }
  val sampleHorvitzThompsonSql: String =
    """WITH base AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c,
      |    CAST('0x' || substr(md5('ht:' || o_orderkey), 1, 6) AS BIGINT) AS h
      |  FROM orders),
      |tot AS (
      |  SELECT sum(CAST(c AS DECIMAL(38,0))) AS sc,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM base),
      |cls AS (
      |  SELECT c, n, sc,
      |    CAST(1000 AS DECIMAL(38,0)) * c >= sc AS certain,
      |    CAST(h AS DECIMAL(38,0)) * sc
      |      < CAST(1000 AS DECIMAL(38,0)) * c * 16777216 AS drawn
      |  FROM base, tot),
      |agg AS (
      |  SELECT max(n) AS n, max(sc) AS sc,
      |    sum(CASE WHEN certain THEN CAST(c AS DECIMAL(38,0))
      |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS cert_c,
      |    CAST(sum(CASE WHEN certain THEN 1 ELSE 0 END) AS BIGINT) AS n_cert,
      |    CAST(sum(CASE WHEN NOT certain AND drawn THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_draw
      |  FROM cls)
      |SELECT n AS n_orders, n_cert + n_draw AS n_sampled,
      |  round((CAST(cert_c AS DOUBLE)
      |    + CAST(n_draw AS DOUBLE) * CAST(sc AS DOUBLE) / 1000) / 100, 2)
      |    AS ht_estimate,
      |  round(CAST(sc AS DOUBLE) / 100, 2) AS true_total,
      |  round(((CAST(cert_c AS DOUBLE)
      |    + CAST(n_draw AS DOUBLE) * CAST(sc AS DOUBLE) / 1000)
      |    - CAST(sc AS DOUBLE)) / CAST(sc AS DOUBLE) * 1000000, 4) AS err_ppm
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_engle_granger_coint" -> (statEngleGrangerCoint _),
    "analytics_price_volume_mix" -> (analyticsPriceVolumeMix _),
    "stat_chow_break" -> (statChowBreak _),
    "sample_horvitz_thompson" -> (sampleHorvitzThompson _),
  )

  val oracle: Map[String, String] = Map(
    "stat_engle_granger_coint" -> statEngleGrangerCointSql,
    "analytics_price_volume_mix" -> analyticsPriceVolumeMixSql,
    "stat_chow_break" -> statChowBreakSql,
    "sample_horvitz_thompson" -> sampleHorvitzThompsonSql,
  )
}
