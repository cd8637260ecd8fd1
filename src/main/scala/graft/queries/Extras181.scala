package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 81 (C728–C731): corpus readability/affect scoring + classic
  * outlier identifiers — LIX, lexicon sentiment, Dixon's Q, and
  * Tietjen–Moore.
  *
  * Shared discipline: tokenization is ONE regexp ([A-Za-z]+, then
  * lambda filters) evaluated identically in both engines; per-doc
  * rationals are quantized (·10⁶) before the distributed sum; the
  * outlier tests run on the calendar-bounded day frame with exact
  * cent arithmetic and cross-multiplied centring.
  */
object Extras181 {

  /** C728 text_lix_readability — LIX = words/sentences +
    * 100·longwords/words per language (long = ≥7 letters; sentences =
    * terminal punctuation count, min 1): the Scandinavian readability
    * index that needs NO syllable model, complementing the
    * Flesch–Kincaid row. Exact integer counts per doc, one division
    * pair per doc quantized before the per-lang mean.
    */
  def textLixReadability(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      .select(col("lang"),
        expr("regexp_extract_all(text, '[A-Za-z]+', 0)").as("toks"),
        expr("greatest(length(text) - length(regexp_replace(text, '[.!?]', '')), 1L)").as("sent"))
      .select(col("lang"), col("sent"),
        expr("size(toks)").cast("long").as("w"),
        expr("size(filter(toks, t -> length(t) >= 7))").cast("long").as("lw"))
      .filter(col("w") > 0)
      .select(col("lang"),
        expr("CAST(floor((CAST(w AS DOUBLE) / sent + 100.0 * lw / w) * 1e6 + 0.5) AS BIGINT)")
          .as("lixq"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("lixq")).cast("decimal(38,0)").as("sl"))
      .selectExpr("lang", "n_docs",
        "round(CAST(sl AS DOUBLE) / n_docs / 1e6, 4) AS mean_lix")
      .orderBy("lang")
  }
  val textLixReadabilitySql: String =
    """WITH t AS (
      |  SELECT lang,
      |    regexp_extract_all(text, '[A-Za-z]+') AS toks,
      |    greatest(length(text) - length(regexp_replace(text, '[.!?]', '', 'g')), 1) AS sent
      |  FROM documents),
      |c AS (
      |  SELECT lang, sent, CAST(len(toks) AS BIGINT) AS w,
      |    CAST(len(list_filter(toks, t -> length(t) >= 7)) AS BIGINT) AS lw
      |  FROM t),
      |q AS (
      |  SELECT lang,
      |    CAST(floor((CAST(w AS DOUBLE) / sent + 100.0 * lw / w) * 1e6 + 0.5) AS BIGINT) AS lixq
      |  FROM c WHERE w > 0)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(CAST(sum(lixq) AS DECIMAL(38,0)) AS DOUBLE) / count(*) / 1e6, 4) AS mean_lix
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  /** C729 text_lexicon_sentiment — deterministic lexicon affect: an
    * embedded ±8-word lexicon, per-doc score (pos−neg)/(pos+neg+1)
    * over lowercased letter tokens, per-source mean (quantized) and
    * the share of positive docs. The no-model affect screen a corpus
    * card reports.
    */
  def textLexiconSentiment(s: SparkSession, d: String): DataFrame = {
    val posL = "('good','great','excellent','happy','love','best','nice','win')"
    val negL = "('bad','terrible','awful','sad','hate','worst','poor','lose')"
    documents(s, d)
      .select(col("source"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("toks"))
      .select(col("source"),
        expr(s"size(filter(toks, t -> t IN $posL))").cast("long").as("p"),
        expr(s"size(filter(toks, t -> t IN $negL))").cast("long").as("ng"))
      .select(col("source"), col("p"), col("ng"),
        expr("CAST(floor(CAST(p - ng AS DOUBLE) / (p + ng + 1) * 1e6 + 0.5) AS BIGINT)").as("sq"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("sq")).cast("decimal(38,0)").as("ss"),
        sum(expr("CASE WHEN p > ng THEN 1L ELSE 0L END")).cast("long").as("n_pos"))
      .orderBy(col("n_docs").desc, col("source").asc).limit(5)
      .selectExpr("source", "n_docs",
        "round(CAST(ss AS DOUBLE) / n_docs / 1e6, 6) AS mean_sentiment",
        "round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS positive_share")
      .orderBy(col("n_docs").desc, col("source").asc)
  }
  val textLexiconSentimentSql: String =
    """WITH t AS (
      |  SELECT source, regexp_extract_all(lower(text), '[a-z]+') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT source,
      |    CAST(len(list_filter(toks, x -> x IN ('good','great','excellent','happy','love','best','nice','win'))) AS BIGINT) AS p,
      |    CAST(len(list_filter(toks, x -> x IN ('bad','terrible','awful','sad','hate','worst','poor','lose'))) AS BIGINT) AS ng
      |  FROM t),
      |q AS (
      |  SELECT source, p, ng,
      |    CAST(floor(CAST(p - ng AS DOUBLE) / (p + ng + 1) * 1e6 + 0.5) AS BIGINT) AS sq
      |  FROM c),
      |g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(sq) AS DECIMAL(38,0)) AS ss,
      |    CAST(sum(CASE WHEN p > ng THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |  FROM q GROUP BY 1
      |  ORDER BY n_docs DESC, source LIMIT 5)
      |SELECT source, n_docs,
      |  round(CAST(ss AS DOUBLE) / n_docs / 1e6, 6) AS mean_sentiment,
      |  round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS positive_share
      |FROM g ORDER BY n_docs DESC, source""".stripMargin

  /** C730 stat_dixon_q — Dixon's Q at both tails of the daily-revenue
    * distribution: Q_high = (max − 2nd max)/range, Q_low =
    * (2nd min − min)/range, from exact cent order statistics of the
    * bounded day frame. The two-glance outlier screen run before the
    * heavier Grubbs/ESD rows.
    */
  def statDixonQ(s: SparkSession, d: String): DataFrame = {
    val f = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wAsc = Window.orderBy(col("c").asc, col("day").asc)
    val wDesc = Window.orderBy(col("c").desc, col("day").desc)
    f.withColumn("ra", row_number().over(wAsc))
      .withColumn("rd", row_number().over(wDesc))
      .agg(count(lit(1)).cast("long").as("n"),
        max(expr("CASE WHEN ra = 1 THEN c END")).as("x_min"),
        max(expr("CASE WHEN ra = 2 THEN c END")).as("x_min2"),
        max(expr("CASE WHEN rd = 2 THEN c END")).as("x_max2"),
        max(expr("CASE WHEN rd = 1 THEN c END")).as("x_max"))
      .selectExpr("n",
        "round(CAST(x_min AS DOUBLE) / 100, 2) AS x_min",
        "round(CAST(x_max AS DOUBLE) / 100, 2) AS x_max",
        "round(CAST(x_max - x_max2 AS DOUBLE) / (x_max - x_min), 6) AS q_high",
        "round(CAST(x_min2 - x_min AS DOUBLE) / (x_max - x_min), 6) AS q_low")
  }
  val statDixonQSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT c,
      |    row_number() OVER (ORDER BY c, day) AS ra,
      |    row_number() OVER (ORDER BY c DESC, day DESC) AS rd
      |  FROM bars)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(max(CASE WHEN ra = 1 THEN c END) AS DOUBLE) / 100, 2) AS x_min,
      |  round(CAST(max(CASE WHEN rd = 1 THEN c END) AS DOUBLE) / 100, 2) AS x_max,
      |  round(CAST(max(CASE WHEN rd = 1 THEN c END) - max(CASE WHEN rd = 2 THEN c END) AS DOUBLE)
      |    / (max(CASE WHEN rd = 1 THEN c END) - max(CASE WHEN ra = 1 THEN c END)), 6) AS q_high,
      |  round(CAST(max(CASE WHEN ra = 2 THEN c END) - max(CASE WHEN ra = 1 THEN c END) AS DOUBLE)
      |    / (max(CASE WHEN rd = 1 THEN c END) - max(CASE WHEN ra = 1 THEN c END)), 6) AS q_low
      |FROM r""".stripMargin

  /** C731 stat_tietjen_moore — the k = 3 multiple-outlier statistic
    * E₃ = SS_trimmed/SS_full on daily revenue: the 3 days most
    * deviant from the mean (|c·n − S| ranked, exact cross-multiplied
    * centring) are dropped, both sums of squares exact via the
    * n·Σx² − (Σx)² form. E near 1 = no outlier cluster; small E = the
    * trio really is aberrant — the test Grubbs (one outlier at a
    * time) masks on.
    */
  def statTietjenMoore(s: SparkSession, d: String): DataFrame = {
    val f = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("c"))
    val tot = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    val ranked = f.crossJoin(broadcast(tot))
      .withColumn("dev", expr("abs(c * n - sc)"))
      .withColumn("rk", row_number().over(Window.orderBy(col("dev").desc, col("day").asc)))
    ranked.agg(max(col("n")).as("n"), max(col("sc")).as("sc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qc"),
        sum(expr("CASE WHEN rk > 3 THEN c ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("sct"),
        sum(expr("CASE WHEN rk > 3 THEN CAST(c AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .cast("decimal(38,0)").as("qct"))
      .selectExpr("n",
        "CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE) / n AS ss_full",
        "CAST(CAST(n - 3 AS DECIMAL(38,0)) * qct - sct * sct AS DOUBLE) / (n - 3) AS ss_trim")
      .selectExpr("n", "3 AS k",
        "round(ss_trim / ss_full, 6) AS e_k")
  }
  val statTietjenMooreSql: String =
    """WITH bars AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS DECIMAL(38,0)) AS sc FROM bars),
      |ranked AS (
      |  SELECT b.c, t.n, t.sc,
      |    row_number() OVER (ORDER BY abs(b.c * t.n - t.sc) DESC, b.day) AS rk
      |  FROM bars b, tot t),
      |agg AS (
      |  SELECT max(n) AS n, max(sc) AS sc,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS qc,
      |    CAST(sum(CASE WHEN rk > 3 THEN c ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS sct,
      |    CAST(sum(CASE WHEN rk > 3 THEN CAST(c AS DECIMAL(38,0)) * c ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS qct
      |  FROM ranked),
      |m AS (
      |  SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * qc - sc * sc AS DOUBLE) / n AS ss_full,
      |    CAST(CAST(n - 3 AS DECIMAL(38,0)) * qct - sct * sct AS DOUBLE) / (n - 3) AS ss_trim
      |  FROM agg)
      |SELECT n, 3 AS k, round(ss_trim / ss_full, 6) AS e_k
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_lix_readability" -> (textLixReadability _),
    "text_lexicon_sentiment" -> (textLexiconSentiment _),
    "stat_dixon_q" -> (statDixonQ _),
    "stat_tietjen_moore" -> (statTietjenMoore _),
  )

  val oracle: Map[String, String] = Map(
    "text_lix_readability" -> textLixReadabilitySql,
    "text_lexicon_sentiment" -> textLexiconSentimentSql,
    "stat_dixon_q" -> statDixonQSql,
    "stat_tietjen_moore" -> statTietjenMooreSql,
  )
}
