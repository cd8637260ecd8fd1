package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 31 (C528–C531): Durbin–Watson residual autocorrelation,
  * per-month Hodges–Lehmann pseudo-median, Heaps'-law vocabulary
  * growth, and the seasonal (Hirsch–Slack) Mann–Kendall trend test.
  */
object Extras131 {

  /** C528 stat_durbin_watson — Durbin–Watson lag-1 autocorrelation
    * test on the residuals of the daily-revenue linear trend. The OLS
    * residual is made EXACT by clearing both rational denominators:
    * with Nb = n·Σtc − Σt·Σc, D = n·Σt² − (Σt)², A2 = Σc·D − Nb·Σt,
    * the scaled residual E_t = c·n·D − A2 − Nb·n·t is an exact
    * DECIMAL(38,0) integer and e_t = E_t/(n·D). Squaring E_t directly
    * would overflow 38 digits, so each residual is brought back to a
    * milli-cent grain by ONE IEEE division of the two exact integers
    * (identical operands in both engines ⇒ identical doubles ⇒
    * identical quantization — no float ACCUMULATION anywhere), then
    * DW = Σ(ê_t−ê_{t−1})²/Σê_t² in exact DECIMAL(38,0) sums with one
    * final IEEE ratio. The (n·D) scale cancels in the ratio.
    */
  def statDurbinWatson(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val fit = daily.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("t")).cast("long").as("st"),
        sum(col("c")).cast("long").as("sc"),
        sum(expr("t * t")).cast("long").as("stt"),
        sum(expr("t * c")).cast("long").as("stc"))
      .selectExpr("n",
        "CAST(n AS DECIMAL(38,0)) * stc - CAST(st AS DECIMAL(38,0)) * sc AS nb",
        "CAST(n AS DECIMAL(38,0)) * stt - CAST(st AS DECIMAL(38,0)) * st AS dd",
        "CAST(st AS DECIMAL(38,0)) AS std", "CAST(sc AS DECIMAL(38,0)) AS scd")
      .selectExpr("n", "nb", "dd",
        "scd * dd - nb * std AS a2",
        "CAST(n AS DECIMAL(38,0)) * dd AS nd")
    val eq = daily.crossJoin(broadcast(fit))
      .selectExpr("t",
        """CAST(floor(CAST(CAST(c AS DECIMAL(38,0)) * nd - a2
          |  - nb * CAST(n AS DECIMAL(38,0)) * t AS DOUBLE)
          |  / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e""".stripMargin)
      .withColumn("ep", lag(col("e"), 1).over(Window.orderBy("t")))
    eq.agg(
        count(lit(1)).cast("long").as("n_days"),
        sum(expr("CAST(e AS DECIMAL(38,0)) * e")).as("den"),
        sum(expr("CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          "ELSE CAST(e - ep AS DECIMAL(38,0)) * (e - ep) END")).as("num"))
      .selectExpr("n_days",
        "round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw")
      .selectExpr("n_days", "dw", "round(1.0 - dw / 2, 6) AS rho_lag1")
  }
  val statDurbinWatsonSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |sums AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS sc,
      |    CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * c) AS BIGINT) AS stc
      |  FROM td),
      |fit0 AS (
      |  SELECT n,
      |    CAST(n AS DECIMAL(38,0)) * stc - CAST(st AS DECIMAL(38,0)) * sc AS nb,
      |    CAST(n AS DECIMAL(38,0)) * stt - CAST(st AS DECIMAL(38,0)) * st AS dd,
      |    CAST(st AS DECIMAL(38,0)) AS std, CAST(sc AS DECIMAL(38,0)) AS scd
      |  FROM sums),
      |fit AS (
      |  SELECT n, nb, dd, scd * dd - nb * std AS a2,
      |    CAST(n AS DECIMAL(38,0)) * dd AS nd
      |  FROM fit0),
      |eq AS (
      |  SELECT t,
      |    CAST(floor(CAST(CAST(c AS DECIMAL(38,0)) * nd - a2
      |      - nb * CAST(n AS DECIMAL(38,0)) * t AS DOUBLE)
      |      / CAST(nd AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS e
      |  FROM td, fit),
      |lagged AS (
      |  SELECT e, lag(e, 1) OVER (ORDER BY t) AS ep FROM eq),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    sum(CAST(e AS DECIMAL(38,0)) * e) AS den,
      |    sum(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0))
      |      ELSE CAST(e - ep AS DECIMAL(38,0)) * (e - ep) END) AS num
      |  FROM lagged),
      |dwv AS (
      |  SELECT n_days,
      |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw
      |  FROM agg)
      |SELECT n_days, dw, round(1.0 - dw / 2, 6) AS rho_lag1 FROM dwv""".stripMargin

  /** C529 stat_hodges_lehmann — per-calendar-month Hodges–Lehmann
    * pseudo-median of daily revenue: the median of all Walsh averages
    * (c_i+c_j)/2, i ≤ j, within the month. Pairs stay EXACT by
    * carrying the DOUBLED Walsh sum (c_i+c_j) as BIGINT cents; the
    * month-bounded self-join emits ≤ 31·32/2 = 496 pairs per month
    * (O(1) per group at any corpus scale — the corpus only adds
    * months, not days-per-month). The lower median is selected by
    * rank (no interpolation ⇒ no float), then ONE division by 200
    * converts doubled cents to dollars.
    */
  def statHodgesLehmann(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"),
        date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val l = daily.select(col("month"), col("day").as("d1"), col("c").as("c1"))
    val r = daily.select(col("month"), col("day").as("d2"), col("c").as("c2"))
    val pairs = l.join(r, Seq("month")).filter(col("d1") <= col("d2"))
      .select(col("month"), (col("c1") + col("c2")).as("w"),
        col("d1"), col("d2"))
    val ranked = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy("month").orderBy(col("w"), col("d1"), col("d2"))))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("month")))
    ranked.filter(expr("rk = (np + 1) div 2"))
      .groupBy("month")
      .agg(max(col("np")).cast("long").as("n_pairs"),
        max(col("w")).as("w_med"))
      .selectExpr("month", "n_pairs",
        "round(CAST(w_med AS DOUBLE) / 200, 6) AS hl_dollars")
      .orderBy("month")
  }
  val statHodgesLehmannSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('month', l_shipdate) AS month,
      |    date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |pairs AS (
      |  SELECT l.month, l.c + r.c AS w, l.day AS d1, r.day AS d2
      |  FROM daily l JOIN daily r
      |    ON l.month = r.month AND l.day <= r.day),
      |ranked AS (
      |  SELECT month, w,
      |    row_number() OVER (PARTITION BY month ORDER BY w, d1, d2) AS rk,
      |    count(*) OVER (PARTITION BY month) AS np
      |  FROM pairs)
      |SELECT month, CAST(max(np) AS BIGINT) AS n_pairs,
      |  round(CAST(max(w) AS DOUBLE) / 200, 6) AS hl_dollars
      |FROM ranked WHERE rk = (np + 1) // 2
      |GROUP BY month ORDER BY month""".stripMargin

  /** C530 text_heaps_law — Heaps'-law vocabulary-growth curve and
    * exponent over word-TRIGRAM types: V(N) ≈ K·N^β measured at 10
    * corpus-prefix deciles in doc_id order. Unigram vocabulary is the
    * wrong unit on this corpus (31 distinct tokens total — it
    * saturates inside decile 1, β ≡ 0), so the type unit is the
    * 3-token shingle, whose growth curve is the standard n-gram
    * novelty diagnostic. doc position p = doc_id+1 (dense ids,
    * verified); decile(p) = ⌈10p/N⌉ so NO global row_number touches
    * the corpus — per-decile token sums and first-occurrence type
    * counts are plain group-bys, the cumulative pass is a 10-row
    * window. β is the log–log OLS slope over the 10 checkpoints:
    * ln() of identical exact BIGINTs → identical doubles, quantized
    * at a 1e-9 grain, exact DECIMAL(38,0) normal equations, ONE
    * final IEEE division.
    */
  def textHeapsLaw(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select((col("doc_id") + 1).cast("long").as("p"), col("text"))
    val nRow = docs.agg(max(col("p")).as("nn"))
    val bucketed = docs.crossJoin(broadcast(nRow))
      .selectExpr("(10 * p + nn - 1) div nn AS dec",
        "size(split(text, ' ')) AS tok", "p", "text")
    val docAgg = bucketed.groupBy("dec")
      .agg(count(lit(1)).cast("long").as("docs"),
        sum(col("tok")).cast("long").as("toks"))
    val firstPos = bucketed
      .selectExpr("p", "split(text, ' ') AS w")
      .selectExpr("p",
        """explode(CASE WHEN size(w) >= 3
          |  THEN transform(sequence(1, size(w) - 2),
          |    i -> concat_ws(' ', w[i-1], w[i], w[i+1]))
          |  ELSE array() END) AS term""".stripMargin)
      .groupBy("term").agg(min(col("p")).as("fp"))
    val typeAgg = firstPos.crossJoin(broadcast(nRow))
      .selectExpr("(10 * fp + nn - 1) div nn AS dec")
      .groupBy("dec").agg(count(lit(1)).cast("long").as("typs"))
    val frame = nRow.select(explode(expr("sequence(1, 10)")).as("dec"))
      .join(docAgg, Seq("dec"), "left").join(typeAgg, Seq("dec"), "left")
      .na.fill(0L, Seq("docs", "toks", "typs"))
      .withColumn("n_docs", sum(col("docs")).over(
        Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_tokens", sum(col("toks")).over(
        Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_types", sum(col("typs")).over(
        Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("dec").cast("long").as("decile"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_types").cast("long").as("n_types"))
    val fit = frame.selectExpr(
        "CAST(floor(ln(n_tokens) * 1e9 + 0.5) AS BIGINT) AS x",
        "CAST(floor(ln(n_types) * 1e9 + 0.5) AS BIGINT) AS y")
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .selectExpr(
        """round(CAST(k * sxy - sx * sy AS DOUBLE)
          |  / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta""".stripMargin)
    frame.crossJoin(broadcast(fit)).orderBy("decile")
  }
  val textHeapsLawSql: String =
    """WITH docs AS (
      |  SELECT CAST(doc_id + 1 AS BIGINT) AS p, text FROM documents),
      |nr AS (SELECT max(p) AS nn FROM docs),
      |bucketed AS (
      |  SELECT (10 * p + nn - 1) // nn AS dec,
      |    len(string_split(text, ' ')) AS tok, p, text
      |  FROM docs, nr),
      |doc_agg AS (
      |  SELECT dec, CAST(count(*) AS BIGINT) AS docs,
      |    CAST(sum(tok) AS BIGINT) AS toks
      |  FROM bucketed GROUP BY 1),
      |first_pos AS (
      |  SELECT term, min(p) AS fp FROM (
      |    SELECT p, unnest(list_transform(
      |      generate_series(1, len(string_split(text, ' ')) - 2),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |        string_split(text, ' ')[i+1] || ' ' ||
      |        string_split(text, ' ')[i+2])) AS term
      |    FROM bucketed) t
      |  GROUP BY 1),
      |type_agg AS (
      |  SELECT (10 * fp + nn - 1) // nn AS dec,
      |    CAST(count(*) AS BIGINT) AS typs
      |  FROM first_pos, nr GROUP BY 1),
      |frame AS (
      |  SELECT CAST(g.dec AS BIGINT) AS decile,
      |    CAST(sum(coalesce(docs, 0)) OVER w AS BIGINT) AS n_docs,
      |    CAST(sum(coalesce(toks, 0)) OVER w AS BIGINT) AS n_tokens,
      |    CAST(sum(coalesce(typs, 0)) OVER w AS BIGINT) AS n_types
      |  FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) g(dec)
      |  LEFT JOIN doc_agg ON g.dec = doc_agg.dec
      |  LEFT JOIN type_agg ON g.dec = type_agg.dec
      |  WINDOW w AS (ORDER BY g.dec ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |quant AS (
      |  SELECT CAST(floor(ln(n_tokens) * 1e9 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(n_types) * 1e9 + 0.5) AS BIGINT) AS y
      |  FROM frame),
      |fit AS (
      |  SELECT round(CAST(k * sxy - sx * sy AS DOUBLE)
      |      / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta
      |  FROM (
      |    SELECT CAST(count(*) AS BIGINT) AS k,
      |      CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |      CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |      CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |      CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      |    FROM quant) t)
      |SELECT decile, n_docs, n_tokens, n_types, heaps_beta
      |FROM frame, fit ORDER BY decile""".stripMargin

  /** C531 stat_seasonal_mann_kendall — the Hirsch–Slack seasonal
    * Mann–Kendall trend test on daily revenue: the MK statistic runs
    * independently inside each month-of-year season (pairs only
    * compare January days with January days, …), then S and the
    * tie-corrected variance SUM across the 12 seasons — immune to the
    * annual cycle that inflates plain MK. All integer until the final
    * z: Var·18 stays exact BIGINT, one IEEE sqrt+division. The
    * self-join is season-bucketed (12 equi-join groups), never
    * all-pairs across seasons.
    */
  def statSeasonalMannKendall(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(month(col("l_shipdate")).cast("long").as("g"),
        date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val l = daily.select(col("g"), col("day").as("d1"), col("c").as("c1"))
    val r = daily.select(col("g"), col("day").as("d2"), col("c").as("c2"))
    val sBySeason = l.join(r, Seq("g")).filter(col("d1") < col("d2"))
      .groupBy("g")
      .agg(sum(when(col("c2") > col("c1"), 1L)
        .when(col("c2") < col("c1"), -1L).otherwise(0L)).as("sg"))
    val nBySeason = daily.groupBy("g").agg(count(lit(1)).as("n"))
    val ties = daily.groupBy("g", "c").agg(count(lit(1)).as("tg"))
      .filter(col("tg") > 1)
      .groupBy("g")
      .agg(sum(col("tg") * (col("tg") - 1) * (lit(2) * col("tg") + 5))
        .as("tie_term"))
    sBySeason.join(nBySeason, "g")
      .join(ties, Seq("g"), "left")
      .withColumn("tie_term", coalesce(col("tie_term"), lit(0L)))
      .agg(
        count(lit(1)).cast("long").as("n_seasons"),
        sum(col("n")).cast("long").as("n_days"),
        sum(col("sg")).cast("long").as("s"),
        sum(col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
          - col("tie_term")).cast("long").as("var18"))
      .selectExpr("n_seasons", "n_days", "s",
        """round(CASE WHEN s > 0
          |    THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
          |  WHEN s < 0
          |    THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
          |  ELSE 0.0 END, 6) AS z""".stripMargin)
      .selectExpr("n_seasons", "n_days", "s", "z",
        "CASE WHEN z > 1.96 THEN 'increasing' WHEN z < -1.96 " +
          "THEN 'decreasing' ELSE 'none' END AS trend")
  }
  val statSeasonalMannKendallSql: String =
    """WITH daily AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS g,
      |    date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |sg AS (
      |  SELECT l.g, CAST(sum(CASE WHEN r.c > l.c THEN 1
      |    WHEN r.c < l.c THEN -1 ELSE 0 END) AS BIGINT) AS sg
      |  FROM daily l JOIN daily r ON l.g = r.g AND l.day < r.day
      |  GROUP BY 1),
      |nd AS (SELECT g, count(*) AS n FROM daily GROUP BY 1),
      |ties AS (
      |  SELECT g, CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT g, c, count(*) AS tg FROM daily GROUP BY 1, 2) t
      |  WHERE tg > 1 GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_seasons,
      |    CAST(sum(n) AS BIGINT) AS n_days,
      |    CAST(sum(sg.sg) AS BIGINT) AS s,
      |    CAST(sum(n * (n - 1) * (2 * n + 5) - coalesce(tie_term, 0))
      |      AS BIGINT) AS var18
      |  FROM sg JOIN nd ON sg.g = nd.g
      |  LEFT JOIN ties ON sg.g = ties.g),
      |zc AS (
      |  SELECT n_seasons, n_days, s,
      |    round(CASE WHEN s > 0
      |        THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
      |      WHEN s < 0
      |        THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
      |      ELSE 0.0 END, 6) AS z
      |  FROM tot)
      |SELECT n_seasons, n_days, s, z,
      |  CASE WHEN z > 1.96 THEN 'increasing' WHEN z < -1.96
      |    THEN 'decreasing' ELSE 'none' END AS trend
      |FROM zc""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_durbin_watson" -> (statDurbinWatson _),
    "stat_hodges_lehmann" -> (statHodgesLehmann _),
    "text_heaps_law" -> (textHeapsLaw _),
    "stat_seasonal_mann_kendall" -> (statSeasonalMannKendall _),
  )

  val oracle: Map[String, String] = Map(
    "stat_durbin_watson" -> statDurbinWatsonSql,
    "stat_hodges_lehmann" -> statHodgesLehmannSql,
    "text_heaps_law" -> textHeapsLawSql,
    "stat_seasonal_mann_kendall" -> statSeasonalMannKendallSql,
  )
}
