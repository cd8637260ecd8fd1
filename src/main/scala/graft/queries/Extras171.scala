package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 71 (C688–C691): demand classification, Jonckheere–Terpstra,
  * FPC sampling interval, quality-prune curve.
  */
object Extras171 {

  /** C688 analytics_demand_classification — the Syntetos–Boylan
    * demand quadrants (smooth / intermittent / erratic / lumpy — the
    * forecast-method router of supply chains, pairing with ABC/XYZ):
    * per-part ADI (mean inter-demand interval in days) and demand-size
    * CV², BOTH classified by exact cross-multiplication (ADI vs 33/25,
    * CV² as 100·(nΣq²−S²) vs 49·S² — no float at the boundary),
    * quadrant census over the bounded class frame.
    */
  def analyticsDemandClassification(s: SparkSession, d: String): DataFrame = {
    val parts = lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("sq"),
        sum(expr("CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)"))
          .cast("long").as("qq"),
        datediff(max(col("l_shipdate")), min(col("l_shipdate"))).cast("long").as("span"))
      .filter(col("n") >= 2)
      // ADI > 1.32 <=> span*25 > 33*(n-1); CV^2 > 0.49 <=> 100*(n*qq-sq^2) > 49*sq^2
      .withColumn("intermittent", expr("span * 25 > 33 * (n - 1)"))
      .withColumn("erratic", expr(
        "100 * (CAST(n AS DECIMAL(38,0)) * qq - CAST(sq AS DECIMAL(38,0)) * sq) > 49 * CAST(sq AS DECIMAL(38,0)) * sq"))
      .withColumn("cls", expr(
        """CASE WHEN intermittent AND erratic THEN 'lumpy'
          |     WHEN intermittent THEN 'intermittent'
          |     WHEN erratic THEN 'erratic'
          |     ELSE 'smooth' END""".stripMargin))
    parts.groupBy("cls")
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum(col("sq")).cast("long").as("total_demand"))
      .orderBy("cls")
  }
  val analyticsDemandClassificationSql: String =
    """WITH parts AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
      |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS qq,
      |    CAST(datediff('day', min(l_shipdate), max(l_shipdate)) AS BIGINT) AS span
      |  FROM lineitem GROUP BY 1 HAVING count(*) >= 2),
      |cls AS (
      |  SELECT sq,
      |    CASE WHEN (span * 25 > 33 * (n - 1))
      |          AND (100 * (CAST(n AS HUGEINT) * qq - CAST(sq AS HUGEINT) * sq) > 49 * CAST(sq AS HUGEINT) * sq) THEN 'lumpy'
      |         WHEN span * 25 > 33 * (n - 1) THEN 'intermittent'
      |         WHEN 100 * (CAST(n AS HUGEINT) * qq - CAST(sq AS HUGEINT) * sq) > 49 * CAST(sq AS HUGEINT) * sq THEN 'erratic'
      |         ELSE 'smooth' END AS cls
      |  FROM parts)
      |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(sq) AS BIGINT) AS total_demand
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin

  /** C689 stat_jonckheere_terpstra — the ordered-alternative trend
    * test across the 5 priority groups on quantity (the nonparametric
    * Cochran–Armitage sibling for continuous outcomes): the BOUNDED
    * quantity domain collapses every group-pair's Mann–Whitney count
    * to histogram prefix sums — J = ΣΣ cnt₂·cum₁(<v) + ½ties EXACT —
    * with the closed-form no-ties moments (approximation documented),
    * z = (J−E)/√V.
    */
  def statJonckheereTerpstra(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g")),
        Seq("l_orderkey"))
      .groupBy(col("g"), expr("CAST(l_quantity AS BIGINT)").as("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val wp = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = hist.withColumn("cumlt", coalesce(sum(col("cnt")).over(wp), lit(0L)))
    val pairs = withCum.as("a")
      .join(hist.selectExpr("g AS g2", "v", "cnt AS cnt2").as("b"), Seq("v"))
      .filter(expr("g < g2"))
      .agg(sum(expr("CAST(cnt2 AS DECIMAL(38,0)) * cumlt")).cast("decimal(38,0)").as("p"),
        sum(expr("CAST(cnt2 AS DECIMAL(38,0)) * cnt")).cast("decimal(38,0)").as("t"))
    val sizes = hist.groupBy("g").agg(sum(col("cnt")).cast("long").as("ng"))
      .agg(sum(col("ng")).cast("long").as("n"),
        sum(expr("ng * ng")).cast("decimal(38,0)").as("n2"),
        sum(expr("CAST(ng AS DECIMAL(38,0)) * ng * (2 * ng + 3)")).cast("decimal(38,0)").as("nv"))
    pairs.crossJoin(broadcast(sizes))
      .selectExpr(
        "CAST(p AS DOUBLE) + 0.5 * CAST(t AS DOUBLE) AS j",
        "(CAST(n AS DOUBLE) * n - CAST(n2 AS DOUBLE)) / 4 AS e",
        """(CAST(n AS DOUBLE) * n * (2 * n + 3) - CAST(nv AS DOUBLE)) / 72
          |  AS v""".stripMargin,
        "n")
      .selectExpr("n", "round(j, 1) AS jt_statistic",
        "round((j - e) / sqrt(v), 4) AS z_stat",
        "abs((j - e) / sqrt(v)) > 1.96 AS reject_no_trend")
  }
  val statJonckheereTerpstraSql: String =
    """WITH hist AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
      |    CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |wc AS (
      |  SELECT g, v, cnt,
      |    coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt
      |  FROM hist),
      |pairs AS (
      |  SELECT CAST(sum(CAST(b.cnt AS DECIMAL(38,0)) * a.cumlt) AS DECIMAL(38,0)) AS p,
      |    CAST(sum(CAST(b.cnt AS DECIMAL(38,0)) * a.cnt) AS DECIMAL(38,0)) AS t
      |  FROM wc a JOIN hist b ON a.v = b.v AND a.g < b.g),
      |sizes AS (
      |  SELECT CAST(sum(ng) AS BIGINT) AS n,
      |    CAST(sum(ng * ng) AS DECIMAL(38,0)) AS n2,
      |    CAST(sum(CAST(ng AS DECIMAL(38,0)) * ng * (2 * ng + 3)) AS DECIMAL(38,0)) AS nv
      |  FROM (SELECT g, CAST(sum(cnt) AS BIGINT) AS ng FROM hist GROUP BY 1)),
      |m AS (
      |  SELECT CAST(p AS DOUBLE) + 0.5 * CAST(t AS DOUBLE) AS j,
      |    (CAST(n AS DOUBLE) * n - CAST(n2 AS DOUBLE)) / 4 AS e,
      |    (CAST(n AS DOUBLE) * n * (2 * n + 3) - CAST(nv AS DOUBLE)) / 72 AS v,
      |    n
      |  FROM pairs, sizes)
      |SELECT n, round(j, 1) AS jt_statistic,
      |  round((j - e) / sqrt(v), 4) AS z_stat,
      |  abs((j - e) / sqrt(v)) > 1.96 AS reject_no_trend
      |FROM m""".stripMargin

  /** C690 sample_fpc_interval — the survey-sampling estimator with
    * finite-population correction: a deterministic ~10% md5 sample of
    * orders (the cross-engine PRNG idiom), mean estimate from exact
    * sums, SE = s/√n·√(1−n/N) — the FPC factor that textbook
    * infinite-population CIs wrongly drop — and the exact population
    * mean beside it (the spec asserts the CI covers it here).
    */
  def sampleFpcInterval(s: SparkSession, d: String): DataFrame = {
    val pop = orders(s, d).select(
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"),
      expr("conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 2), 16, 10) < 26").as("inS"))
    val tot = pop.agg(count(lit(1)).cast("long").as("bign"),
      sum(col("c")).cast("decimal(38,0)").as("sc"))
    pop.filter(col("inS"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("ss"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("decimal(38,0)").as("qs"))
      .crossJoin(broadcast(tot))
      .selectExpr("n", "bign",
        "CAST(ss AS DOUBLE) / n AS ybar",
        """sqrt(CAST(CAST(n AS DECIMAL(38,0)) * qs - ss * ss AS DOUBLE))
          |  / sqrt(CAST(n AS DOUBLE)) / sqrt(CAST(n AS DOUBLE) - 1) AS sd""".stripMargin,
        "CAST(sc AS DOUBLE) / bign AS truemean")
      .selectExpr("n", "bign",
        "round(ybar / 100, 2) AS estimate",
        """round((ybar - 1.96 * sd / sqrt(CAST(n AS DOUBLE))
          |  * sqrt(1 - CAST(n AS DOUBLE) / bign)) / 100, 2) AS ci_lo""".stripMargin,
        """round((ybar + 1.96 * sd / sqrt(CAST(n AS DOUBLE))
          |  * sqrt(1 - CAST(n AS DOUBLE) / bign)) / 100, 2) AS ci_hi""".stripMargin,
        "round(truemean / 100, 2) AS true_mean")
  }
  val sampleFpcIntervalSql: String =
    """WITH pop AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c,
      |    CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS BIGINT) AS BIGINT) < 26 AS ins
      |  FROM orders),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS bign,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS sc
      |  FROM pop),
      |smp AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS DECIMAL(38,0)) AS ss,
      |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS qs
      |  FROM pop WHERE ins),
      |p AS (
      |  SELECT n, bign,
      |    CAST(ss AS DOUBLE) / n AS ybar,
      |    sqrt(CAST(CAST(n AS DECIMAL(38,0)) * qs - ss * ss AS DOUBLE))
      |      / sqrt(CAST(n AS DOUBLE)) / sqrt(CAST(n AS DOUBLE) - 1) AS sd,
      |    CAST(sc AS DOUBLE) / bign AS truemean
      |  FROM smp, tot)
      |SELECT n, bign,
      |  round(ybar / 100, 2) AS estimate,
      |  round((ybar - 1.96 * sd / sqrt(CAST(n AS DOUBLE))
      |    * sqrt(1 - CAST(n AS DOUBLE) / bign)) / 100, 2) AS ci_lo,
      |  round((ybar + 1.96 * sd / sqrt(CAST(n AS DOUBLE))
      |    * sqrt(1 - CAST(n AS DOUBLE) / bign)) / 100, 2) AS ci_hi,
      |  round(truemean / 100, 2) AS true_mean
      |FROM p""".stripMargin

  /** C691 pipeline_quality_prune_curve — the curation tradeoff curve:
    * per-doc quality = letters+space share (ppm-quantized EXACT via
    * translate-count, no regex dialect exposure), and for each of 7
    * thresholds the surviving doc/char share — bounded threshold
    * frame × exact integer counts. The "how much data does the
    * quality bar cost" headline of corpus curation.
    */
  def pipelineQualityPruneCurve(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d)
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("letters", expr(
        "CAST(length(text) - length(translate(lower(text), 'abcdefghijklmnopqrstuvwxyz ', '')) AS BIGINT)"))
      .withColumn("ppm", expr("letters * 1000000L div len"))
    val tot = scored.agg(count(lit(1)).cast("long").as("nd"),
      sum(col("len")).cast("long").as("nc"))
    scored.crossJoin(broadcast(tot))
      .select(col("ppm"), col("len"), col("nd"), col("nc"),
        explode(array((5 to 11).map(t => lit(t * 50000L)): _*)).as("thr"))
      .groupBy("thr")
      .agg(max(col("nd")).as("nd"), max(col("nc")).as("nc"),
        sum(expr("CASE WHEN ppm >= thr THEN 1L ELSE 0L END")).cast("long").as("docs_kept"),
        sum(expr("CASE WHEN ppm >= thr THEN len ELSE 0L END")).cast("long").as("chars_kept"))
      .selectExpr("thr AS threshold_ppm", "docs_kept",
        "round(CAST(docs_kept AS DOUBLE) / nd, 6) AS doc_share",
        "round(CAST(chars_kept AS DOUBLE) / nc, 6) AS char_share")
      .orderBy("threshold_ppm")
  }
  val pipelineQualityPruneCurveSql: String =
    """WITH scored AS (
      |  SELECT CAST(strlen(text) AS BIGINT) AS len,
      |    CAST(strlen(text) - strlen(translate(lower(text),
      |      'abcdefghijklmnopqrstuvwxyz ', '')) AS BIGINT) AS letters
      |  FROM documents),
      |q AS (SELECT len, letters * 1000000 // len AS ppm FROM scored),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(len) AS BIGINT) AS nc
      |  FROM q),
      |thr AS (SELECT unnest([250000, 300000, 350000, 400000, 450000, 500000, 550000]) AS thr)
      |SELECT CAST(thr.thr AS BIGINT) AS threshold_ppm,
      |  CAST(sum(CASE WHEN q.ppm >= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
      |  round(CAST(sum(CASE WHEN q.ppm >= thr.thr THEN 1 ELSE 0 END) AS DOUBLE)
      |    / max(tot.nd), 6) AS doc_share,
      |  round(CAST(sum(CASE WHEN q.ppm >= thr.thr THEN q.len ELSE 0 END) AS DOUBLE)
      |    / max(tot.nc), 6) AS char_share
      |FROM q, thr, tot GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_demand_classification" -> (analyticsDemandClassification _),
    "stat_jonckheere_terpstra" -> (statJonckheereTerpstra _),
    "sample_fpc_interval" -> (sampleFpcInterval _),
    "pipeline_quality_prune_curve" -> (pipelineQualityPruneCurve _),
  )

  val oracle: Map[String, String] = Map(
    "analytics_demand_classification" -> analyticsDemandClassificationSql,
    "stat_jonckheere_terpstra" -> statJonckheereTerpstraSql,
    "sample_fpc_interval" -> sampleFpcIntervalSql,
    "pipeline_quality_prune_curve" -> pipelineQualityPruneCurveSql,
  )
}
