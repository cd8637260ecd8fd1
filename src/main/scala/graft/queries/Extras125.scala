package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 25 (C503–C508): log-log elasticity regression, Average True
  * Range, systematic sampling, Bartlett's variance test, term
  * burstiness, and the Ulcer volatility index.
  */
object Extras125 {

  /** C503 analytics_price_elasticity — log-log OLS elasticity of
    * quantity with respect to unit price, per brand: slope of
    * ln(qty) on ln(unit_price). Determinism: unit price floors to
    * exact integer cents (pc div q — both engines truncate), each
    * row's ln(x), ln(y), x·y, x² terms round to a 1e-9 fixed-point
    * BIGINT, and the OLS slope is ONE exact-integer ratio
    * (n·Σfxy·1e9 − Σfx·Σfy)/(n·Σfxx·1e9 − Σfx²) in DECIMAL(38,0)
    * (cross-products reach ~1e34) with a single IEEE division — the
    * grain defines the statistic identically in both engines. One
    * scan, one keyed aggregate per brand.
    */
  def analyticsPriceElasticity(s: SparkSession, d: String): DataFrame = {
    val rows = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("""CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
                div CAST(l_quantity AS BIGINT) AS BIGINT)""").as("up_c"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .select(col("p_brand"),
        expr("CAST(floor(ln(up_c) * 1e9 + 0.5) AS BIGINT)").as("fx"),
        expr("CAST(floor(ln(q) * 1e9 + 0.5) AS BIGINT)").as("fy"),
        expr("CAST(floor(ln(up_c) * ln(q) * 1e9 + 0.5) AS BIGINT)").as("fxy"),
        expr("CAST(floor(ln(up_c) * ln(up_c) * 1e9 + 0.5) AS BIGINT)").as("fxx"))
    rows.groupBy("p_brand")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("fx")).cast("decimal(38,0)").as("sfx"),
        sum(col("fy")).cast("decimal(38,0)").as("sfy"),
        sum(col("fxy")).cast("decimal(38,0)").as("sfxy"),
        sum(col("fxx")).cast("decimal(38,0)").as("sfxx"))
      .selectExpr("p_brand", "n",
        """round(CAST(n * sfxy * 1000000000 - sfx * sfy AS DOUBLE)
          |  / CAST(n * sfxx * 1000000000 - sfx * sfx AS DOUBLE), 6)
          |  AS elasticity""".stripMargin)
      .orderBy("p_brand")
  }
  val analyticsPriceElasticitySql: String =
    """WITH t AS (
      |  SELECT p_brand,
      |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      // CAST(l_quantity AS BIGINT) AS BIGINT) AS up_c,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |f AS (
      |  SELECT p_brand,
      |    CAST(floor(ln(up_c) * 1e9 + 0.5) AS BIGINT) AS fx,
      |    CAST(floor(ln(q) * 1e9 + 0.5) AS BIGINT) AS fy,
      |    CAST(floor(ln(up_c) * ln(q) * 1e9 + 0.5) AS BIGINT) AS fxy,
      |    CAST(floor(ln(up_c) * ln(up_c) * 1e9 + 0.5) AS BIGINT) AS fxx
      |  FROM t),
      |g AS (
      |  SELECT p_brand, count(*) AS n,
      |    CAST(sum(fx) AS DECIMAL(38,0)) AS sfx,
      |    CAST(sum(fy) AS DECIMAL(38,0)) AS sfy,
      |    CAST(sum(fxy) AS DECIMAL(38,0)) AS sfxy,
      |    CAST(sum(fxx) AS DECIMAL(38,0)) AS sfxx
      |  FROM f GROUP BY p_brand)
      |SELECT p_brand, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * sfxy * 1000000000 - sfx * sfy AS DOUBLE)
      |    / CAST(n * sfxx * 1000000000 - sfx * sfx AS DOUBLE), 6) AS elasticity
      |FROM g ORDER BY p_brand""".stripMargin

  /** C504 win_atr_bands — 14-day Average True Range (Wilder's
    * volatility unit, simple-average variant like C484): TR =
    * greatest(hi−lo, |hi−prev_close|, |lo−prev_close|) in EXACT cents,
    * rolling 14-row exact sum, one IEEE display division; NULL until
    * 14 TRs exist. The window runs over the O(days) daily OHLC
    * aggregate; report = last 60 days with close ± ATR bands.
    */
  def winAtrBands(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .select(col("l_shipdate"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("pc"),
        (col("l_orderkey") * 100 + col("l_linenumber")).as("fillkey"))
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(max(col("pc")).as("hi"), min(col("pc")).as("lo"),
        max_by(col("pc"), col("fillkey")).as("close"))
    val wo = Window.orderBy("day")
    daily
      .withColumn("pc", lag(col("close"), 1).over(wo))
      .withColumn("tr", when(col("pc").isNull, lit(null).cast("long"))
        .otherwise(greatest(col("hi") - col("lo"),
          abs(col("hi") - col("pc")), abs(col("lo") - col("pc")))))
      .withColumn("ntr", count(col("tr")).over(wo.rowsBetween(-13, 0)))
      .withColumn("str", sum(col("tr")).over(wo.rowsBetween(-13, 0)).cast("long"))
      .withColumn("atr", when(col("ntr") < 14, lit(null).cast("double"))
        .otherwise(round(col("str").cast("double") / 14 / 100, 6)))
      .withColumn("rn", row_number().over(Window.orderBy(col("day").desc)))
      .filter(col("rn") <= 60)
      .select(col("day"), round(col("close").cast("double") / 100, 6).as("close"),
        col("atr"))
      .orderBy("day")
  }
  val winAtrBandsSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS hi,
      |    min(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS lo,
      |    arg_max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT),
      |      l_orderkey * 100 + l_linenumber) AS close
      |  FROM lineitem GROUP BY 1),
      |tr AS (
      |  SELECT day, close,
      |    CASE WHEN lag(close, 1) OVER (ORDER BY day) IS NULL THEN NULL
      |         ELSE greatest(hi - lo,
      |           abs(hi - lag(close, 1) OVER (ORDER BY day)),
      |           abs(lo - lag(close, 1) OVER (ORDER BY day))) END AS tr
      |  FROM daily),
      |fr AS (
      |  SELECT day, close,
      |    count(tr) OVER w AS ntr,
      |    CAST(sum(tr) OVER w AS BIGINT) AS str,
      |    row_number() OVER (ORDER BY day DESC) AS rn
      |  FROM tr
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT day, round(CAST(close AS DOUBLE) / 100, 6) AS close,
      |  CASE WHEN ntr < 14 THEN NULL
      |       ELSE round(CAST(str AS DOUBLE) / 14 / 100, 6) END AS atr
      |FROM fr WHERE rn <= 60
      |ORDER BY day""".stripMargin

  /** C505 sample_systematic_every_k — systematic sampling (every 10th
    * row of the length-sorted corpus, fixed offset 3): the classic
    * low-variance design that stratifies by the sort key for free.
    * The rank is the two-pass GlobalRank over (n_chars, doc_id) — no
    * global window touches the corpus; the audit compares per-lang
    * sampled vs population mean length (exact integer sums, IEEE
    * division at the end) — systematic over the length sort should
    * match the population mean closely, and the spec asserts it beats
    * a 5% relative gap.
    */
  def sampleSystematicEveryK(s: SparkSession, d: String): DataFrame = {
    val ranked = graft.plans.GlobalRank.withGlobalRowNumber(
      documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      "rk", Seq(col("n_chars"), col("doc_id")))
    ranked
      .groupBy("lang")
      .agg(
        count(lit(1)).cast("long").as("n_pop"),
        sum(col("n_chars")).cast("long").as("chars_pop"),
        sum(when(col("rk") % 10 === 3, 1L).otherwise(0L)).cast("long").as("n_sample"),
        sum(when(col("rk") % 10 === 3, col("n_chars")).otherwise(0L))
          .cast("long").as("chars_sample"))
      .select(col("lang"), col("n_pop"), col("n_sample"),
        round(col("chars_pop").cast("double") / col("n_pop"), 6).as("mean_pop"),
        round(col("chars_sample").cast("double") / col("n_sample"), 6).as("mean_sample"))
      .orderBy("lang")
  }
  val sampleSystematicEveryKSql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk
      |  FROM documents),
      |g AS (
      |  SELECT lang, count(*) AS n_pop,
      |    CAST(sum(n_chars) AS BIGINT) AS chars_pop,
      |    CAST(sum(CASE WHEN rk % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
      |    CAST(sum(CASE WHEN rk % 10 = 3 THEN n_chars ELSE 0 END) AS BIGINT)
      |      AS chars_sample
      |  FROM ranked GROUP BY lang)
      |SELECT lang, CAST(n_pop AS BIGINT) AS n_pop, n_sample,
      |  round(CAST(chars_pop AS DOUBLE) / n_pop, 6) AS mean_pop,
      |  round(CAST(chars_sample AS DOUBLE) / n_sample, 6) AS mean_sample
      |FROM g ORDER BY lang""".stripMargin

  /** C506 stat_bartlett — Bartlett's test for variance homogeneity
    * across the five event types (the parametric counterpart of C205
    * Brown–Forsythe): T = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C.
    * Each Sᵢ² is ONE IEEE expression over the exact cent sums
    * (n·SS − S², DECIMAL(38,0)); the pooled SSE sums per-group IEEE
    * values at a grain-1.0 floor (≈1e16 cents², identical both
    * engines); Σ(nᵢ−1)·ln(Sᵢ²) and Σ1/(nᵢ−1) use 1e-9/1e-12 fixed
    * points. Everything shuffle-order independent.
    */
  def statBartlett(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("s1"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("s2"))
      .withColumn("var_i", expr(
        "CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))"))
      .withColumn("sse_fx", expr(
        "CAST(floor(var_i * (n - 1) + 0.5) AS DECIMAL(38,0))"))
      .withColumn("ln_fx", expr(
        "CAST(floor((n - 1) * ln(var_i) * 1e9 + 0.5) AS BIGINT)"))
      .withColumn("inv_fx", expr(
        "CAST(floor(1e12 / (n - 1) + 0.5) AS BIGINT)"))
    g.groupBy()
      .agg(
        sum(col("n")).cast("long").as("n_tot"),
        countDistinct(col("event_type")).cast("long").as("k"),
        sum(col("sse_fx")).cast("decimal(38,0)").as("sse"),
        sum(col("ln_fx")).cast("long").as("slnfx"),
        sum(col("inv_fx")).cast("long").as("sinvfx"))
      .selectExpr("n_tot", "k",
        """round(((n_tot - k) * ln(CAST(sse AS DOUBLE) / (n_tot - k))
          |   - CAST(slnfx AS DOUBLE) / 1e9)
          |  / (1.0 + (CAST(sinvfx AS DOUBLE) / 1e12 - 1.0 / (n_tot - k))
          |     / (3.0 * (k - 1))), 4) AS t_stat""".stripMargin)
      .selectExpr("n_tot", "k", "t_stat", "t_stat > 9.488 AS reject_equal_var")
  }
  val statBartlettSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |g AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s2
      |  FROM c GROUP BY event_type),
      |v AS (
      |  SELECT event_type, n,
      |    CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS var_i
      |  FROM g),
      |fx AS (
      |  SELECT event_type, n, var_i,
      |    CAST(floor(var_i * (n - 1) + 0.5) AS DECIMAL(38,0)) AS sse_fx,
      |    CAST(floor((n - 1) * ln(var_i) * 1e9 + 0.5) AS BIGINT) AS ln_fx,
      |    CAST(floor(1e12 / (n - 1) + 0.5) AS BIGINT) AS inv_fx
      |  FROM v),
      |agg AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS n_tot, count(DISTINCT event_type) AS k,
      |    CAST(sum(sse_fx) AS DECIMAL(38,0)) AS sse,
      |    CAST(sum(ln_fx) AS BIGINT) AS slnfx,
      |    CAST(sum(inv_fx) AS BIGINT) AS sinvfx
      |  FROM fx)
      |SELECT n_tot, CAST(k AS BIGINT) AS k,
      |  round(((n_tot - k) * ln(CAST(sse AS DOUBLE) / (n_tot - k))
      |     - CAST(slnfx AS DOUBLE) / 1e9)
      |    / (1.0 + (CAST(sinvfx AS DOUBLE) / 1e12 - 1.0 / (n_tot - k))
      |       / (3.0 * (k - 1))), 4) AS t_stat,
      |  round(((n_tot - k) * ln(CAST(sse AS DOUBLE) / (n_tot - k))
      |     - CAST(slnfx AS DOUBLE) / 1e9)
      |    / (1.0 + (CAST(sinvfx AS DOUBLE) / 1e12 - 1.0 / (n_tot - k))
      |       / (3.0 * (k - 1))), 4) > 9.488 AS reject_equal_var
      |FROM agg""".stripMargin

  /** C507 text_burstiness — per-term dispersion (variance-to-mean
    * ratio of within-document counts, over the documents CONTAINING
    * the term) for the top-20 document-frequency terms: VMR ≈ 1 for
    * Poisson-scattered function words, ≫ 1 for bursty topical terms —
    * the signal separating stopword candidates from content words.
    * VMR = (n·Σc² − (Σc)²)/(n·Σc): all exact integers, one IEEE
    * division. Two keyed aggregates riding the term shuffle.
    */
  def textBurstiness(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).cast("long").as("c"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("c")).cast("long").as("sc"),
        sum(col("c") * col("c")).cast("long").as("sc2"))
    stats
      .withColumn("rn", row_number().over(
        Window.orderBy(col("df").desc, col("term"))))
      .filter(col("rn") <= 20)
      .select(col("term"), col("df"),
        round((col("df") * col("sc2") - col("sc") * col("sc")).cast("double")
          / (col("df") * col("sc")), 6).as("vmr"))
      .orderBy("term")
  }
  val textBurstinessSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT term, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
      |stats AS (
      |  SELECT term, count(*) AS df,
      |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS sc2
      |  FROM tf GROUP BY term),
      |r AS (
      |  SELECT term, df, sc, sc2,
      |    row_number() OVER (ORDER BY df DESC, term) AS rn
      |  FROM stats)
      |SELECT term, CAST(df AS BIGINT) AS df,
      |  round(CAST(df * sc2 - sc * sc AS DOUBLE) / (df * sc), 6) AS vmr
      |FROM r WHERE rn <= 20
      |ORDER BY term""".stripMargin

  /** C508 win_ulcer_index — the Ulcer Index (root-mean-square
    * percentage drawdown over 14 days — penalizes depth AND duration
    * where C*_drawdown reports only the max): per-day drawdown vs the
    * rolling 14-day high is one IEEE ratio over exact cents, squared
    * and floored to a 1e-12 fixed-point BIGINT; the 14-row frame sum
    * is then EXACT and one sqrt finishes. Warmup guard rn ≥ 27 (14
    * for the high + 14 for the mean); report = last 60 days.
    */
  def winUlcerIndex(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .select(col("l_shipdate"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("pc"),
        (col("l_orderkey") * 100 + col("l_linenumber")).as("fillkey"))
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(max_by(col("pc"), col("fillkey")).as("close"))
    val wo = Window.orderBy("day")
    daily
      .withColumn("rn", row_number().over(wo))
      .withColumn("hi14", max(col("close")).over(wo.rowsBetween(-13, 0)).cast("long"))
      .withColumn("dd_fx", expr(
        """CAST(floor(
          |  (CAST(hi14 - close AS DOUBLE) / hi14)
          |  * (CAST(hi14 - close AS DOUBLE) / hi14) * 1e12 + 0.5) AS BIGINT)"""
          .stripMargin))
      .withColumn("sdd", sum(col("dd_fx")).over(wo.rowsBetween(-13, 0)).cast("long"))
      .filter(col("rn") >= 27)
      .withColumn("ulcer",
        round(sqrt(col("sdd").cast("double") / 14 / 1e12) * 100, 6))
      .withColumn("rpt", row_number().over(Window.orderBy(col("day").desc)))
      .filter(col("rpt") <= 60)
      .select(col("day"), round(col("close").cast("double") / 100, 6).as("close"),
        col("ulcer"))
      .orderBy("day")
  }
  val winUlcerIndexSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    arg_max(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT),
      |      l_orderkey * 100 + l_linenumber) AS close
      |  FROM lineitem GROUP BY 1),
      |h AS (
      |  SELECT day, close,
      |    row_number() OVER (ORDER BY day) AS rn,
      |    CAST(max(close) OVER (ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS hi14
      |  FROM daily),
      |dd AS (
      |  SELECT day, close, rn,
      |    CAST(floor(
      |      (CAST(hi14 - close AS DOUBLE) / hi14)
      |      * (CAST(hi14 - close AS DOUBLE) / hi14) * 1e12 + 0.5) AS BIGINT) AS dd_fx
      |  FROM h),
      |u AS (
      |  SELECT day, close, rn,
      |    CAST(sum(dd_fx) OVER (ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sdd
      |  FROM dd)
      |SELECT day, round(CAST(close AS DOUBLE) / 100, 6) AS close,
      |  round(sqrt(CAST(sdd AS DOUBLE) / 14 / 1e12) * 100, 6) AS ulcer
      |FROM (
      |  SELECT day, close, sdd,
      |    row_number() OVER (ORDER BY day DESC) AS rpt
      |  FROM u WHERE rn >= 27)
      |WHERE rpt <= 60
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_price_elasticity" -> (analyticsPriceElasticity _),
    "win_atr_bands" -> (winAtrBands _),
    "sample_systematic_every_k" -> (sampleSystematicEveryK _),
    "stat_bartlett" -> (statBartlett _),
    "text_burstiness" -> (textBurstiness _),
    "win_ulcer_index" -> (winUlcerIndex _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_price_elasticity" -> analyticsPriceElasticitySql,
    "win_atr_bands" -> winAtrBandsSql,
    "sample_systematic_every_k" -> sampleSystematicEveryKSql,
    "stat_bartlett" -> statBartlettSql,
    "text_burstiness" -> textBurstinessSql,
    "win_ulcer_index" -> winUlcerIndexSql,
  )
}
