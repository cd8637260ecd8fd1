package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 21 (C479–C484): link prediction, normality testing, market
  * concentration, lexical-richness profiling, G-test independence, and
  * the RSI momentum indicator.
  */
object Extras121 {

  /** C479 graph_adamic_adar — Adamic–Adar link prediction over the
    * supplier–customer bipartite projection: candidate supplier pair
    * score = Σ_{common customer c} 1/ln(deg(c)) (rare shared neighbors
    * count more). Same scale shape as C291 neighbor-Jaccard: distinct
    * edges, hub cap (quadratic blowup guard shared via
    * [[Extras63.GraphHubCap]]), pair generation by equi-join ON the
    * shared customer. Determinism: the per-neighbor weight rounds to a
    * 1e-9 fixed-point BIGINT and the pair score is an EXACT integer
    * sum; top-5 per anchor ranks on (fx DESC, sb) — an integer sort
    * key, so no float-tie hazard reaches row_number. deg(c) ≥ 2 for
    * any common neighbor, so ln(deg) > 0 always.
    */
  def graphAdamicAdar(s: SparkSession, d: String): DataFrame = {
    // the pair table (with the exact fixed-point weight sum, cdeg ≥ 2
    // so ln never sees 1 — the sf0.1 ANSI divide-by-zero) comes from
    // the shared once-per-corpus CoPurchaseStage (r9)
    val pairs = CoPurchaseStage.pairStats(s, d)
      .select(col("sa"), col("sb"), col("wfx_sum").as("fx"))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("sa").orderBy(col("fx").desc, col("sb"))))
      .filter(col("rn") <= 5)
      .select(col("sa"), col("sb"),
        round(col("fx").cast("double") / 1e9, 6).as("aa_score"))
      .orderBy("sa", "sb")
  }
  val graphAdamicAdarSql: String =
    s"""WITH e AS (
      |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |wdeg AS (
      |  SELECT sk, ck,
      |    CAST(floor(1e9 / ln(cdeg) + 0.5) AS BIGINT) AS wfx
      |  FROM (SELECT sk, ck, count(*) OVER (PARTITION BY ck) AS cdeg FROM e)
      |  WHERE cdeg >= 2 AND cdeg <= ${Extras63.GraphHubCap}),
      |pairs AS (
      |  SELECT a.sk AS sa, b.sk AS sb, CAST(sum(a.wfx) AS BIGINT) AS fx
      |  FROM wdeg a JOIN wdeg b ON a.ck = b.ck AND a.sk < b.sk
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT sa, sb, fx,
      |    row_number() OVER (PARTITION BY sa ORDER BY fx DESC, sb) AS rn
      |  FROM pairs)
      |SELECT sa, sb, round(CAST(fx AS DOUBLE) / 1e9, 6) AS aa_score
      |FROM ranked WHERE rn <= 5
      |ORDER BY sa, sb""".stripMargin

  /** C480 stat_jarque_bera — Jarque–Bera normality test per event
    * type: JB = n/6·(S² + (K−3)²/4) from skewness S and kurtosis K.
    * Determinism: the four raw power sums Σc..Σc⁴ accumulate in EXACT
    * decimal cents (per-row c⁴ ≈ 1e24 needs DECIMAL(38,0) products —
    * a BIGINT would overflow per row); the central-moment / S / K / JB
    * chain is then ONE identical IEEE formula per group over identical
    * exact inputs. JB > 5.99 = reject normality at α=0.05 (2 dof).
    */
  def statJarqueBera(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0))").as("c"))
    c.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("c")).cast("decimal(38,0)").as("s1"),
        sum(expr("c * c")).cast("decimal(38,0)").as("s2"),
        sum(expr("c * c * c")).cast("decimal(38,0)").as("s3"),
        sum(expr("c * c * c * c")).cast("decimal(38,0)").as("s4"))
      .selectExpr("event_type", "n",
        "CAST(s1 AS DOUBLE) / n / 100 AS mean",
        """round(CAST(n AS DOUBLE) / 6 * (
          |  pow((CAST(s3 AS DOUBLE)/n - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2*pow(CAST(s1 AS DOUBLE)/n, 3))
          |      / pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2), 1.5), 2)
          |  + pow((CAST(s4 AS DOUBLE)/n - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
          |         + 6*pow(CAST(s1 AS DOUBLE)/n, 2)*(CAST(s2 AS DOUBLE)/n) - 3*pow(CAST(s1 AS DOUBLE)/n, 4))
          |        / pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2), 2) - 3, 2) / 4
          |), 4) AS jb_stat""".stripMargin)
      .selectExpr("event_type", "n", "round(mean / 100, 6) AS mean_value",
        "jb_stat", "jb_stat > 5.99 AS reject_normal")
      .orderBy("event_type")
  }
  val statJarqueBeraSql: String =
    """WITH cents AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0)) AS c
      |  FROM events),
      |sums AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS s1,
      |    CAST(sum(c * c) AS DECIMAL(38,0)) AS s2,
      |    CAST(sum(c * c * c) AS DECIMAL(38,0)) AS s3,
      |    CAST(sum(c * c * c * c) AS DECIMAL(38,0)) AS s4
      |  FROM cents GROUP BY event_type),
      |jb AS (
      |  SELECT event_type, n, CAST(s1 AS DOUBLE) / n / 100 AS mean,
      |    round(CAST(n AS DOUBLE) / 6 * (
      |      pow((CAST(s3 AS DOUBLE)/n - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2*pow(CAST(s1 AS DOUBLE)/n, 3))
      |          / pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2), 1.5), 2)
      |      + pow((CAST(s4 AS DOUBLE)/n - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
      |             + 6*pow(CAST(s1 AS DOUBLE)/n, 2)*(CAST(s2 AS DOUBLE)/n) - 3*pow(CAST(s1 AS DOUBLE)/n, 4))
      |            / pow(CAST(s2 AS DOUBLE)/n - pow(CAST(s1 AS DOUBLE)/n, 2), 2) - 3, 2) / 4
      |    ), 4) AS jb_stat
      |  FROM sums)
      |SELECT event_type, n, round(mean / 100, 6) AS mean_value,
      |  jb_stat, jb_stat > 5.99 AS reject_normal
      |FROM jb ORDER BY event_type""".stripMargin

  /** C481 analytics_hhi_concentration — Herfindahl–Hirschman market
    * concentration of supplier revenue within each nation: HHI =
    * 10000·Σ share² = 10000·Σrev²/(Σrev)². Per-supplier revenue in
    * exact decimal cents (one keyed aggregate riding the l_suppkey
    * shuffle), squared as DECIMAL(38,0) (rev² ≈ 1e18 at sf1 — BIGINT
    * would be borderline), nation rollup over the tiny supplier
    * dimension with a broadcast nation join, ONE IEEE division per
    * nation. DOJ bands: <1500 competitive, 1500–2500 moderate,
    * >2500 concentrated.
    */
  def analyticsHhiConcentration(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0))"))
        .cast("decimal(38,0)").as("rev_c"))
    rev
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(expr("rev_c * rev_c")).cast("decimal(38,0)").as("ssq"),
        sum(col("rev_c")).cast("decimal(38,0)").as("tot"))
      .selectExpr("n_name", "n_suppliers",
        "round(10000 * CAST(ssq AS DOUBLE) / CAST(tot AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS hhi")
      .selectExpr("n_name", "n_suppliers", "hhi",
        "CASE WHEN hhi < 1500 THEN 'competitive' WHEN hhi <= 2500 THEN 'moderate' ELSE 'concentrated' END AS band")
      .orderBy("n_name")
  }
  val analyticsHhiConcentrationSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS rev_c
      |  FROM lineitem GROUP BY l_suppkey),
      |pern AS (
      |  SELECT n_name, count(*) AS n_suppliers,
      |    CAST(sum(rev_c * rev_c) AS DECIMAL(38,0)) AS ssq,
      |    CAST(sum(rev_c) AS DECIMAL(38,0)) AS tot
      |  FROM rev
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name),
      |h AS (
      |  SELECT n_name, n_suppliers,
      |    round(10000 * CAST(ssq AS DOUBLE) / CAST(tot AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS hhi
      |  FROM pern)
      |SELECT n_name, n_suppliers, hhi,
      |  CASE WHEN hhi < 1500 THEN 'competitive'
      |       WHEN hhi <= 2500 THEN 'moderate'
      |       ELSE 'concentrated' END AS band
      |FROM h ORDER BY n_name""".stripMargin

  /** C482 text_hapax_ratio — lexical-richness profile per language:
    * vocabulary size, hapax legomena (terms occurring exactly once —
    * the OOV-pressure signal for tokenizer design), hapax share of
    * vocab, and type–token ratio. One explode, one (lang, term)
    * aggregate, one per-lang rollup — both keyed aggregates share the
    * lang-prefixed shuffle; everything exact ints until two final IEEE
    * divisions.
    */
  def textHapaxRatio(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("c"))
    tf.groupBy("lang")
      .agg(
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("hapax"),
        sum(col("c")).cast("long").as("tokens"))
      .withColumn("hapax_share",
        round(col("hapax").cast("double") / col("vocab"), 6))
      .withColumn("type_token_ratio",
        round(col("vocab").cast("double") / col("tokens"), 6))
      .orderBy("lang")
  }
  val textHapaxRatioSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT lang, term, count(*) AS c
      |  FROM tok GROUP BY 1, 2)
      |SELECT lang, count(*) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  CAST(sum(c) AS BIGINT) AS tokens,
      |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
      |    AS hapax_share,
      |  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6)
      |    AS type_token_ratio
      |FROM tf GROUP BY lang ORDER BY lang""".stripMargin

  /** C483 stat_g_test — G-test of independence (likelihood-ratio χ²)
    * on the lang × source contingency: G = 2·Σ O·ln(O·N/(R·C)),
    * asymptotically χ²_{(r−1)(c−1)} like Pearson but additive across
    * partitions. The contingency table is bounded (langs × sources),
    * so R/C/N come from window sums over the tiny cell aggregate; the
    * per-cell IEEE ln term rounds to a 1e-9 fixed-point BIGINT and the
    * total is an EXACT integer sum (a float Σ over cells would be
    * shuffle-order sensitive). O·N and R·C stay in exact BIGINTs.
    */
  def statGTest(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy("lang")).cast("long"))
      .withColumn("ccol", sum(col("o")).over(Window.partitionBy("source")).cast("long"))
      .withColumn("n", sum(col("o")).over(
        Window.partitionBy()).cast("long"))
      .withColumn("fx", expr(
        "CAST(floor(o * ln(CAST(o * n AS DOUBLE) / CAST(r * ccol AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"))
      .agg(
        round(lit(2) * sum(col("fx")).cast("double") / 1e9, 6).as("g_stat"),
        ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1))
          .cast("long").as("dof"),
        count(lit(1)).as("n_cells"))
  }
  val statGTestSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o
      |  FROM documents GROUP BY 1, 2),
      |m AS (
      |  SELECT o,
      |    CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
      |    CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS ccol,
      |    CAST(sum(o) OVER () AS BIGINT) AS n,
      |    lang, source
      |  FROM cells),
      |fx AS (
      |  SELECT lang, source,
      |    CAST(floor(o * ln(CAST(o * n AS DOUBLE) / CAST(r * ccol AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS fx
      |  FROM m)
      |SELECT round(2 * CAST(sum(fx) AS DOUBLE) / 1e9, 6) AS g_stat,
      |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
      |  count(*) AS n_cells
      |FROM fx""".stripMargin

  /** C484 win_cutler_rsi — 14-day Cutler RSI (simple-average variant:
    * rolling mean gain / rolling mean loss — unlike Wilder's recursive
    * EWMA it is frame-expressible and path-independent) over the daily
    * revenue series. Deltas, gains, and losses stay in exact decimal
    * cents; the two 14-row frame sums are exact; ONE IEEE division per
    * row inside the nullif guard (flat fortnight → NULL, not NaN). The
    * window runs over the O(days) daily aggregate; NULL until 14 rows
    * of history. Report = last 60 days.
    */
  def winCutlerRsi(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0))"))
        .cast("decimal(38,0)").as("rev_c"))
    val wo = Window.orderBy("day")
    val wf = wo.rowsBetween(-13, 0)
    daily
      .withColumn("delta", (col("rev_c") - lag(col("rev_c"), 1).over(wo))
        .cast("decimal(38,0)"))
      .withColumn("gain", when(col("delta") > 0, col("delta")).otherwise(lit(0))
        .cast("decimal(38,0)"))
      .withColumn("loss", when(col("delta") < 0, -col("delta")).otherwise(lit(0))
        .cast("decimal(38,0)"))
      .withColumn("nhist", count(col("delta")).over(wf))
      .withColumn("sgain", sum(col("gain")).over(wf).cast("decimal(38,0)"))
      .withColumn("sloss", sum(col("loss")).over(wf).cast("decimal(38,0)"))
      .withColumn("rsi", when(col("nhist") < 14, lit(null).cast("double"))
        .otherwise(round(lit(100.0) - lit(100.0)
          / (lit(1.0) + col("sgain").cast("double")
            / nullif(col("sloss").cast("double"), lit(0.0))), 6)))
      .withColumn("rn", row_number().over(Window.orderBy(col("day").desc)))
      .filter(col("rn") <= 60)
      .select(col("day"), col("rsi"))
      .orderBy("day")
  }
  val winCutlerRsiSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |d2 AS (
      |  SELECT day,
      |    CAST(rev_c - lag(rev_c, 1) OVER (ORDER BY day) AS DECIMAL(38,0)) AS delta
      |  FROM daily),
      |gl AS (
      |  SELECT day, delta,
      |    CAST(CASE WHEN delta > 0 THEN delta ELSE 0 END AS DECIMAL(38,0)) AS gain,
      |    CAST(CASE WHEN delta < 0 THEN -delta ELSE 0 END AS DECIMAL(38,0)) AS loss
      |  FROM d2),
      |fr AS (
      |  SELECT day,
      |    count(delta) OVER w AS nhist,
      |    CAST(sum(gain) OVER w AS DECIMAL(38,0)) AS sgain,
      |    CAST(sum(loss) OVER w AS DECIMAL(38,0)) AS sloss,
      |    row_number() OVER (ORDER BY day DESC) AS rn
      |  FROM gl
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      |r AS (
      |  SELECT day, rn,
      |    CASE WHEN nhist < 14 THEN NULL
      |         ELSE round(100.0 - 100.0 / (1.0 + CAST(sgain AS DOUBLE)
      |           / nullif(CAST(sloss AS DOUBLE), 0.0)), 6) END AS rsi
      |  FROM fr)
      |SELECT day, rsi FROM r WHERE rn <= 60
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_adamic_adar" -> (graphAdamicAdar _),
    "stat_jarque_bera" -> (statJarqueBera _),
    "analytics_hhi_concentration" -> (analyticsHhiConcentration _),
    "text_hapax_ratio" -> (textHapaxRatio _),
    "stat_g_test" -> (statGTest _),
    "win_cutler_rsi" -> (winCutlerRsi _),
  )

  val oracle: Map[String, String] = Map(
    "graph_adamic_adar" -> graphAdamicAdarSql,
    "stat_jarque_bera" -> statJarqueBeraSql,
    "analytics_hhi_concentration" -> analyticsHhiConcentrationSql,
    "text_hapax_ratio" -> textHapaxRatioSql,
    "stat_g_test" -> statGTestSql,
    "win_cutler_rsi" -> winCutlerRsiSql,
  )
}
