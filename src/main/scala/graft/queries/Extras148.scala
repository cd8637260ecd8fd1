package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 48 (C596–C599): Page–Hinkley drift, MATTR lexical diversity,
  * candlestick patterns, successive-halving source selection.
  */
object Extras148 {

  /** C596 stat_page_hinkley — the Page–Hinkley downward-drift
    * statistic against the global mean, denominator-cleared: with
    * U_t = Σ_{i≤t}(n·cᵢ − Σc) (exact DECIMAL prefix sums over the
    * bounded daily frame), PH = max_t(runmax(U)_t − U_t)/n is exact
    * until ONE final division, and the alarm day is the argmax (tie →
    * earliest). The sequential-monitoring sibling of C***'s CUSUM,
    * reported with the day it would have fired.
    */
  def statPageHinkley(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val tot = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(c AS DECIMAL(38,0))")).as("sc"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("u", sum(expr(
        "CAST(c AS DECIMAL(38,0)) * n - sc")).over(w))
      .withColumn("rmu", max(col("u")).over(w))
      .selectExpr("day", "n", "rmu - u AS ph")
      .agg(max(col("n")).as("n"),
        min(struct(expr("-ph").as("np"), col("day"))).as("m"))
      .selectExpr("n AS n_days", "m.day AS alarm_day",
        "round(CAST(-m.np AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6) AS ph_max")
  }
  val statPageHinkleySql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(c AS DECIMAL(38,0))) AS sc
      |  FROM daily),
      |pre AS (
      |  SELECT day, n,
      |    sum(CAST(c AS DECIMAL(38,0)) * n - sc) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
      |  FROM daily, tot),
      |ph AS (
      |  SELECT day, n,
      |    max(u) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - u AS ph
      |  FROM pre),
      |pick AS (SELECT * FROM ph ORDER BY ph DESC, day LIMIT 1)
      |SELECT n AS n_days, day AS alarm_day,
      |  round(CAST(ph AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6) AS ph_max
      |FROM pick""".stripMargin

  /** C597 text_mattr_diversity — Moving-Average Type–Token Ratio
    * (Covington's MATTR, the length-robust lexical-diversity metric
    * beside C*'s Yule/hapax/Heaps): 50-token sliding windows per doc
    * via ONE HOF pass (slice + array_distinct — O(n·w) inside the
    * row, no explode), per-window TTR and the per-doc mean both as
    * exact ppm integer divisions, per-lang mean as one final
    * division. Short docs (<50 tokens) use their single full window.
    */
  def textMattrDiversity(s: SparkSession, d: String): DataFrame = {
    val perDoc = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .selectExpr("lang",
        """CASE WHEN n <= 50 THEN
          |  (CAST(size(array_distinct(toks)) AS BIGINT) * 1000000) div n
          |ELSE
          |  aggregate(
          |    transform(sequence(1, CAST(n - 49 AS INT)),
          |      i -> (CAST(size(array_distinct(slice(toks, i, 50))) AS BIGINT)
          |            * 1000000) div 50),
          |    0L, (acc, x) -> acc + x) div (n - 49)
          |END AS mattr_ppm""".stripMargin)
    perDoc.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("mattr_ppm")).cast("long").as("sm"))
      .selectExpr("lang", "n_docs",
        "round(CAST(sm AS DOUBLE) / n_docs / 1000000, 6) AS mean_mattr")
      .orderBy("lang")
  }
  val textMattrDiversitySql: String =
    """WITH perdoc AS (
      |  SELECT lang,
      |    CASE WHEN len(string_split(text, ' ')) <= 50 THEN
      |      (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |        * 1000000) // len(string_split(text, ' '))
      |    ELSE
      |      list_aggregate(list_transform(
      |        generate_series(1, len(string_split(text, ' ')) - 49),
      |        i -> (CAST(len(list_distinct(string_split(text, ' ')[i:i+49]))
      |              AS BIGINT) * 1000000) // 50),
      |        'sum') // (len(string_split(text, ' ')) - 49)
      |    END AS mattr_ppm
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(CAST(sum(mattr_ppm) AS BIGINT) AS DOUBLE)
      |    / count(*) / 1000000, 6) AS mean_mattr
      |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin

  /** C598 win_candlestick_patterns — pattern census over daily OHLC
    * bars: open/close from struct-min/max over the deterministic
    * (orderkey, linenumber) order, high/low as plain extrema, all
    * exact cents; doji = 20·|O−C| ≤ (H−L) (cross-multiplied), bull/
    * bear engulfing against the lagged body. Counts only — the shapes
    * a charting engine would overlay, reduced to an exact census.
    */
  def winCandlestickPatterns(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(
        min(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("fo"),
        max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"),
        max(col("p")).cast("long").as("h"),
        min(col("p")).cast("long").as("l"))
      .selectExpr("day", "fo.p AS o", "lo.p AS c", "h", "l")
    val w = Window.orderBy("day")
    bars
      .withColumn("po", lag(col("o"), 1).over(w))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("po").isNotNull)
      .agg(
        count(lit(1)).cast("long").as("n_bars"),
        sum(expr("CASE WHEN 20 * abs(o - c) <= h - l THEN 1L ELSE 0L END"))
          .cast("long").as("n_doji"),
        sum(expr(
          """CASE WHEN pc < po AND c > o AND o <= pc AND c >= po
            |THEN 1L ELSE 0L END""".stripMargin)).cast("long").as("n_bull_engulf"),
        sum(expr(
          """CASE WHEN pc > po AND c < o AND o >= pc AND c <= po
            |THEN 1L ELSE 0L END""".stripMargin)).cast("long").as("n_bear_engulf"))
  }
  val winCandlestickPatternsSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day,
      |    (min(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS o,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c,
      |    CAST(max(p) AS BIGINT) AS h, CAST(min(p) AS BIGINT) AS l
      |  FROM px GROUP BY day),
      |lagged AS (
      |  SELECT o, c, h, l,
      |    lag(o, 1) OVER (ORDER BY day) AS po,
      |    lag(c, 1) OVER (ORDER BY day) AS pc
      |  FROM bars)
      |SELECT CAST(count(*) AS BIGINT) AS n_bars,
      |  CAST(sum(CASE WHEN 20 * abs(o - c) <= h - l THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_doji,
      |  CAST(sum(CASE WHEN pc < po AND c > o AND o <= pc AND c >= po
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
      |  CAST(sum(CASE WHEN pc > po AND c < o AND o >= pc AND c <= po
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf
      |FROM lagged WHERE po IS NOT NULL""".stripMargin

  /** C599 sample_successive_halving — bandit-style source selection
    * (the successive-halving schedule data-mixture tuning uses): 20
    * sources score by mean quality PPM, three elimination rounds keep
    * the top 10 → 5 → 2 (rank over the BOUNDED source frame by the
    * EXACT integer mean (Σq·10⁶) div n, tie → source). Reports each
    * source's elimination round — 0 for finalists. The whole schedule
    * is arithmetic on one 20-row aggregate; only the quality scan
    * touches the corpus.
    */
  def sampleSuccessiveHalving(s: SparkSession, d: String): DataFrame = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    val scored = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("tok", size(col("toks")).cast("long"))
      .withColumn("stop",
        size(expr(s"filter(toks, t -> t IN $stopSql)")).cast("long"))
      .selectExpr("source",
        "7000 * least(tok, 100L) + (300000 * stop) div tok AS q_ppm")
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("q_ppm")).cast("long").as("sq"))
      .selectExpr("source", "n_docs", "(sq * 1000000) div n_docs AS mean_fx")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("mean_fx").desc, col("source"))))
    scored.selectExpr("source", "n_docs",
        "round(CAST(mean_fx AS DOUBLE) / 1e12, 6) AS mean_quality",
        """CASE WHEN rk > 10 THEN 1L WHEN rk > 5 THEN 2L
          |  WHEN rk > 2 THEN 3L ELSE 0L END AS eliminated_round""".stripMargin)
      .orderBy("source")
  }
  val sampleSuccessiveHalvingSql: String = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    s"""WITH scored AS (
       |  SELECT source,
       |    7000 * least(CAST(len(string_split(text, ' ')) AS BIGINT), 100)
       |      + (300000 * CAST(len(list_filter(string_split(text, ' '),
       |          t -> t IN $stopSql)) AS BIGINT))
       |        // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_ppm
       |  FROM documents),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    (CAST(sum(q_ppm) AS BIGINT) * 1000000) // count(*) AS mean_fx
       |  FROM scored GROUP BY source),
       |rk AS (
       |  SELECT source, n_docs, mean_fx,
       |    row_number() OVER (ORDER BY mean_fx DESC, source) AS rk
       |  FROM agg)
       |SELECT source, n_docs,
       |  round(CAST(mean_fx AS DOUBLE) / 1e12, 6) AS mean_quality,
       |  CAST(CASE WHEN rk > 10 THEN 1 WHEN rk > 5 THEN 2
       |    WHEN rk > 2 THEN 3 ELSE 0 END AS BIGINT) AS eliminated_round
       |FROM rk ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_page_hinkley" -> (statPageHinkley _),
    "text_mattr_diversity" -> (textMattrDiversity _),
    "win_candlestick_patterns" -> (winCandlestickPatterns _),
    "sample_successive_halving" -> (sampleSuccessiveHalving _),
  )

  val oracle: Map[String, String] = Map(
    "stat_page_hinkley" -> statPageHinkleySql,
    "text_mattr_diversity" -> textMattrDiversitySql,
    "win_candlestick_patterns" -> winCandlestickPatternsSql,
    "sample_successive_halving" -> sampleSuccessiveHalvingSql,
  )
}
