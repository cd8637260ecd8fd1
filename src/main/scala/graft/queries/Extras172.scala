package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 72 (C692–C695): Ichimoku cloud, Wald's SPRT, negative-
  * binomial fit, vocabulary growth curve.
  */
object Extras172 {

  /** C692 win_ichimoku_cloud — the Ichimoku baseline system on daily
    * closes: Tenkan (9-bar) and Kijun (26-bar) midlines and the Senkou
    * A/B cloud (26-shifted), ALL in DOUBLED cents so the (H+L)/2
    * midlines stay exact integers; trailing extremes from rows-window
    * max/min over the bounded daily frame; census of days above /
    * below / inside the cloud plus TK-cross count — exact ints end to
    * end.
    */
  def winIchimokuCloud(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(max(col("p")).as("h"), min(col("p")).as("l"),
        max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"))
      .selectExpr("day", "h", "l", "lo.p AS c")
    def w(n: Int) = Window.orderBy("day").rowsBetween(-(n - 1), 0)
    val wd = Window.orderBy("day")
    val ich = bars
      .withColumn("tenkan2", max(col("h")).over(w(9)) + min(col("l")).over(w(9)))
      .withColumn("kijun2", max(col("h")).over(w(26)) + min(col("l")).over(w(26)))
      .withColumn("senkou_a4", lag(expr("tenkan2 + kijun2"), 26).over(wd))
      .withColumn("senkou_b2", lag(
        max(col("h")).over(w(52)) + min(col("l")).over(w(52)), 26).over(wd))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") >= 78) // full 52-bar history + 26 shift
      // cloud bounds in x4 units: a4 vs 2*senkou_b2
      .withColumn("top4", greatest(col("senkou_a4"), expr("2 * senkou_b2")))
      .withColumn("bot4", least(col("senkou_a4"), expr("2 * senkou_b2")))
      .withColumn("tkx", expr(
        """CASE WHEN (tenkan2 - kijun2) * (lag(tenkan2, 1) OVER (ORDER BY day)
          |  - lag(kijun2, 1) OVER (ORDER BY day)) < 0 THEN 1L ELSE 0L END""".stripMargin))
    ich.agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CASE WHEN 4 * c > top4 THEN 1L ELSE 0L END")).cast("long").as("n_above_cloud"),
        sum(expr("CASE WHEN 4 * c < bot4 THEN 1L ELSE 0L END")).cast("long").as("n_below_cloud"),
        sum(expr("CASE WHEN 4 * c <= top4 AND 4 * c >= bot4 THEN 1L ELSE 0L END")).cast("long").as("n_in_cloud"),
        sum(col("tkx")).cast("long").as("tk_crosses"))
  }
  val winIchimokuCloudSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day, max(p) AS h, min(p) AS l,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c
      |  FROM px GROUP BY day),
      |ich0 AS (
      |  SELECT day, c,
      |    max(h) OVER w9 + min(l) OVER w9 AS tenkan2,
      |    max(h) OVER w26 + min(l) OVER w26 AS kijun2,
      |    max(h) OVER w52 + min(l) OVER w52 AS span_b2,
      |    row_number() OVER (ORDER BY day) AS rn
      |  FROM bars
      |  WINDOW w9 AS (ORDER BY day ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
      |    w26 AS (ORDER BY day ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
      |    w52 AS (ORDER BY day ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)),
      |ich AS (
      |  SELECT day, c, rn, tenkan2, kijun2,
      |    lag(tenkan2 + kijun2, 26) OVER (ORDER BY day) AS senkou_a4,
      |    lag(span_b2, 26) OVER (ORDER BY day) AS senkou_b2,
      |    lag(tenkan2, 1) OVER (ORDER BY day) AS pt,
      |    lag(kijun2, 1) OVER (ORDER BY day) AS pk
      |  FROM ich0),
      |f AS (
      |  SELECT c,
      |    greatest(senkou_a4, 2 * senkou_b2) AS top4,
      |    least(senkou_a4, 2 * senkou_b2) AS bot4,
      |    CASE WHEN (tenkan2 - kijun2) * (pt - pk) < 0 THEN 1 ELSE 0 END AS tkx
      |  FROM ich WHERE rn >= 78)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN 4 * c > top4 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_cloud,
      |  CAST(sum(CASE WHEN 4 * c < bot4 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_cloud,
      |  CAST(sum(CASE WHEN 4 * c <= top4 AND 4 * c >= bot4 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_cloud,
      |  CAST(sum(tkx) AS BIGINT) AS tk_crosses
      |FROM f""".stripMargin

  /** C693 stat_wald_sprt — Wald's sequential probability ratio test
    * walked over the daily up-move sequence (H₀: p = 0.45 vs H₁:
    * p = 0.55, boundaries ±ln19 for α = β = 0.05): per-day LLR
    * increments are one of TWO constants, nano-quantized ONCE so the
    * cumulative walk is an exact integer prefix sum over the bounded
    * frame; the first boundary crossing and the decision are exact
    * integer comparisons.
    */
  def statWaldSprt(s: SparkSession, d: String): DataFrame = {
    val up = math.floor(math.log(0.55 / 0.45) * 1e9 + 0.5).toLong
    val dn = math.floor(math.log(0.45 / 0.55) * 1e9 + 0.5).toLong
    val bound = math.floor(math.log(19.0) * 1e9 + 0.5).toLong
    val bars = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day")
    val wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val walk = bars
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("pc").isNotNull && col("c") =!= col("pc"))
      .withColumn("llr", expr(s"CASE WHEN c > pc THEN ${up}L ELSE ${dn}L END"))
      .withColumn("cum", sum(col("llr")).over(wp))
      .withColumn("t", row_number().over(w).cast("long"))
    val crossed = walk.filter(expr(s"abs(cum) >= ${bound}L"))
      .agg(min(col("t")).as("first_cross_t"))
    walk.agg(count(lit(1)).cast("long").as("n_steps"),
        max(struct(col("t"), col("cum"))).as("last"))
      .crossJoin(broadcast(crossed))
      .selectExpr("n_steps", "first_cross_t",
        "round(CAST(last.cum AS DOUBLE) / 1e9, 6) AS final_llr",
        s"""CASE WHEN first_cross_t IS NULL THEN 'continue'
           |  WHEN CAST(last.cum AS DOUBLE) >= 0 THEN 'accept_h1'
           |  ELSE 'accept_h0' END AS decision_hint""".stripMargin)
  }
  val statWaldSprtSql: String = {
    val up = math.floor(math.log(0.55 / 0.45) * 1e9 + 0.5).toLong
    val dn = math.floor(math.log(0.45 / 0.55) * 1e9 + 0.5).toLong
    val bound = math.floor(math.log(19.0) * 1e9 + 0.5).toLong
    s"""WITH bars AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |moves AS (
       |  SELECT day, c, lag(c, 1) OVER (ORDER BY day) AS pc
       |  FROM bars QUALIFY pc IS NOT NULL AND c <> pc),
       |walk AS (
       |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
       |    sum(CASE WHEN c > pc THEN $up ELSE $dn END)
       |      OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM moves),
       |crossed AS (
       |  SELECT min(t) AS first_cross_t FROM walk WHERE abs(cum) >= $bound),
       |fin AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_steps,
       |    (max(struct_pack(t := t, cum := cum))).cum AS last_cum
       |  FROM walk)
       |SELECT n_steps, first_cross_t,
       |  round(CAST(last_cum AS DOUBLE) / 1e9, 6) AS final_llr,
       |  CASE WHEN first_cross_t IS NULL THEN 'continue'
       |    WHEN CAST(last_cum AS DOUBLE) >= 0 THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS decision_hint
       |FROM fin, crossed""".stripMargin
  }

  /** C694 stat_negbin_fit — negative-binomial method-of-moments fit to
    * the per-order item counts, GUARDED: m and v from exact integer
    * moments, the dispersion index v/m diagnosed first, and the NB
    * parameters r = m²/(v−m), p = m/v reported ONLY when v > m (this
    * corpus is mildly UNDERdispersed — DI ≈ 0.93 — so the honest
    * output is the diagnosis with NULL params and a false flag; the
    * spec asserts the guard fires consistently with the moments).
    */
  def statNegbinFit(s: SparkSession, d: String): DataFrame = {
    val counts = lineitem(s, d).groupBy("l_orderkey")
      .agg(count(lit(1)).cast("long").as("k"))
    counts.agg(count(lit(1)).cast("long").as("n"),
        sum(col("k")).cast("decimal(38,0)").as("sk"),
        sum(expr("k * k")).cast("decimal(38,0)").as("qk"))
      .selectExpr("n",
        "CAST(sk AS DOUBLE) / n AS m",
        "CAST(CAST(n AS DECIMAL(38,0)) * qk - sk * sk AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS v")
      .selectExpr("n",
        "round(m, 6) AS mean_items",
        "round(v / m, 6) AS dispersion_index",
        "v > m AS nb_applicable",
        "CASE WHEN v > m THEN round(m * m / (v - m), 6) END AS nb_r",
        "CASE WHEN v > m THEN round(m / v, 6) END AS nb_p")
  }
  val statNegbinFitSql: String =
    """WITH counts AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
      |  FROM lineitem GROUP BY 1),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(k) AS DECIMAL(38,0)) AS sk,
      |    CAST(sum(k * k) AS DECIMAL(38,0)) AS qk
      |  FROM counts),
      |p AS (
      |  SELECT n, CAST(sk AS DOUBLE) / n AS m,
      |    CAST(CAST(n AS DECIMAL(38,0)) * qk - sk * sk AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n) AS v
      |  FROM m)
      |SELECT n,
      |  round(m, 6) AS mean_items,
      |  round(v / m, 6) AS dispersion_index,
      |  v > m AS nb_applicable,
      |  CASE WHEN v > m THEN round(m * m / (v - m), 6) END AS nb_r,
      |  CASE WHEN v > m THEN round(m / v, 6) END AS nb_p
      |FROM p""".stripMargin

  /** C695 text_vocab_growth_curve — the vocabulary growth curve (the
    * empirical Heaps trajectory, not just its fitted exponent): each
    * type's FIRST document (min doc_id over the token group — one
    * corpus pass), new types bucketed by corpus-position decile
    * (doc_id div (N/10)), cumulative vocabulary per decile from the
    * bounded prefix — exact integers throughout.
    */
  def textVocabGrowthCurve(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).count()
    val firstDoc = documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok")
      .agg(min(col("doc_id")).as("first_doc"))
    // full clamp (greatest is a no-op: first_doc >= 0) so the plan
    // gate can PROVE the decile domain ⊆ [0, 9] — bounded frame below
    // the cumulative window
    val perBucket = firstDoc
      .groupBy(expr(s"least(greatest(first_doc * 10 div $nDocs, 0L), 9L)").as("decile"))
      .agg(count(lit(1)).cast("long").as("new_types"))
    val wp = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("cum_vocab", sum(col("new_types")).over(wp).cast("long"))
      .orderBy("decile")
      .selectExpr("CAST(decile AS BIGINT) AS decile", "new_types", "cum_vocab")
  }
  val textVocabGrowthCurveSql: String =
    """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |toks AS (
      |  SELECT doc_id, t.tok FROM documents,
      |    LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS tok) t
      |  WHERE strlen(t.tok) > 0),
      |firstdoc AS (
      |  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY 1),
      |perbucket AS (
      |  SELECT least(greatest(first_doc * 10 // n, 0), 9) AS decile,
      |    CAST(count(*) AS BIGINT) AS new_types
      |  FROM firstdoc, nd GROUP BY 1)
      |SELECT CAST(decile AS BIGINT) AS decile, new_types,
      |  CAST(sum(new_types) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
      |FROM perbucket ORDER BY decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_ichimoku_cloud" -> (winIchimokuCloud _),
    "stat_wald_sprt" -> (statWaldSprt _),
    "stat_negbin_fit" -> (statNegbinFit _),
    "text_vocab_growth_curve" -> (textVocabGrowthCurve _),
  )

  val oracle: Map[String, String] = Map(
    "win_ichimoku_cloud" -> winIchimokuCloudSql,
    "stat_wald_sprt" -> statWaldSprtSql,
    "stat_negbin_fit" -> statNegbinFitSql,
    "text_vocab_growth_curve" -> textVocabGrowthCurveSql,
  )
}
