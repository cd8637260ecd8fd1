package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 103 (C816–C819): regression-free survival covariates + a
  * modern rank test + catalog structure + corpus inequality — the Cox
  * partial-likelihood score test at β=0, the Baumgartner–Weiß–
  * Schindler two-sample statistic, the nation assortment-overlap
  * matrix, and the per-doc token-count Gini.
  *
  * Shared discipline: at-risk covariate moments are exact suffix sums
  * over the bounded lead-time frame with ·10⁶-quantized rational
  * divisions; BWS explodes tie blocks into exact rank positions and
  * quantizes each weighted term once; overlap and Gini are pure
  * integer set/prefix algebra.
  */
object Extras203 {

  /** C816 stat_cox_score — the Cox proportional-hazards SCORE test at
    * β=0 for discount as a continuous covariate of ship lead time (no
    * iteration — the score test needs only the null): per event time,
    * U += Σx_deaths − d·S_x/n over the at-risk set and
    * V += d·(n·S_xx − S_x²)(n−d)/(n²(n−1)), all from exact integer
    * suffix sums; χ² = U²/V. The hazard-covariate answer without
    * fitting a single Cox iteration — and it reduces to the log-rank
    * when x is binary.
    */
  def statCoxScore(s: SparkSession, d: String): DataFrame = {
    val ev = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("t"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)").as("x"))
      .filter(col("t") >= 1)
    val byT = ev.groupBy("t")
      .agg(count(lit(1)).cast("long").as("dt"),
        sum(col("x")).cast("long").as("sxd"),
        sum(expr("x * x")).cast("long").as("sxxd"))
    val wSuf = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = byT
      .withColumn("nr", sum(col("dt")).over(wSuf).cast("long"))
      .withColumn("sxr", sum(col("sxd")).over(wSuf).cast("long"))
      .withColumn("sxxr", sum(col("sxxd")).over(wSuf).cast("long"))
    risk
      .withColumn("u6", expr(
        "CAST(sxd AS DECIMAL(38,0)) * 1000000 - (CAST(dt AS DECIMAL(38,0)) * sxr * 1000000) div nr"))
      .withColumn("v6", expr(
        """CASE WHEN nr > 1 THEN
          |  (CAST(dt AS DECIMAL(38,0)) * (CAST(nr AS DECIMAL(38,0)) * sxxr - CAST(sxr AS DECIMAL(38,0)) * sxr)
          |   * (nr - dt) * 1000000)
          |  div (CAST(nr AS DECIMAL(38,0)) * nr * (nr - 1))
          |ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
      .agg(count(lit(1)).cast("long").as("n_times"),
        sum(col("u6")).cast("decimal(38,0)").as("su6"),
        sum(col("v6")).cast("decimal(38,0)").as("sv6"))
      .selectExpr("n_times",
        "round(CAST(su6 AS DOUBLE) / 1e6, 4) AS score_u",
        """round((CAST(su6 AS DOUBLE) / 1e6) * (CAST(su6 AS DOUBLE) / 1e6)
          |/ (CAST(sv6 AS DOUBLE) / 1e6), 4) AS cox_score_chi2""".stripMargin)
  }
  val statCoxScoreSql: String =
    """WITH ev AS (
      |  SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS t,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE datediff('day', o_orderdate, l_shipdate) >= 1),
      |byt AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS dt,
      |    CAST(sum(x) AS BIGINT) AS sxd, CAST(sum(x * x) AS BIGINT) AS sxxd
      |  FROM ev GROUP BY 1),
      |risk AS (
      |  SELECT t, dt, sxd, sxxd,
      |    sum(dt) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nr,
      |    sum(sxd) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sxr,
      |    sum(sxxd) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sxxr
      |  FROM byt),
      |q AS (
      |  SELECT
      |    CAST(sxd AS HUGEINT) * 1000000 - (CAST(dt AS HUGEINT) * sxr * 1000000) // nr AS u6,
      |    CASE WHEN nr > 1 THEN
      |      (CAST(dt AS HUGEINT) * (CAST(nr AS HUGEINT) * sxxr - CAST(sxr AS HUGEINT) * sxr)
      |       * (nr - dt) * 1000000)
      |      // (CAST(nr AS HUGEINT) * nr * (nr - 1))
      |    ELSE CAST(0 AS HUGEINT) END AS v6
      |  FROM risk),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_times,
      |    CAST(sum(u6) AS DECIMAL(38,0)) AS su6,
      |    CAST(sum(v6) AS DECIMAL(38,0)) AS sv6
      |  FROM q)
      |SELECT n_times,
      |  round(CAST(su6 AS DOUBLE) / 1e6, 4) AS score_u,
      |  round((CAST(su6 AS DOUBLE) / 1e6) * (CAST(su6 AS DOUBLE) / 1e6)
      |    / (CAST(sv6 AS DOUBLE) / 1e6), 4) AS cox_score_chi2
      |FROM m""".stripMargin

  /** C817 stat_baumgartner_ws — the Baumgartner–Weiß–Schindler B
    * statistic for A-vs-R quantities: tie blocks exploded into exact
    * per-observation rank positions i with block midranks R (×2
    * integers), per-position weighted terms
    * (R − (m+n)/n·i)² / (i/(n+1)(1−i/(n+1)) · m(m+n)/n) quantized ·10⁶
    * before summation, B = (B_X + B_Y)/2. Weights the distribution
    * ends — more power in the tails than KS/CvM at the same size.
    */
  def statBaumgartnerWs(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(l_quantity AS INT)").as("qv"))
      .agg(sum(expr("CASE WHEN l_returnflag = 'A' THEN 1L ELSE 0L END")).cast("long").as("l1"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).cast("long").as("l2"))
    val wref = org.apache.spark.sql.expressions.Window.orderBy(col("qv").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val blocks = hist
      .withColumn("c1", coalesce(sum(col("l1")).over(wref), lit(0L)).cast("long"))
      .withColumn("c2", coalesce(sum(col("l2")).over(wref), lit(0L)).cast("long"))
      .withColumn("cb", expr("c1 + c2"))
      .withColumn("r2", expr("2 * cb + l1 + l2 + 1")) // midrank ×2
    val tot = hist.agg(sum(col("l1")).cast("long").as("n1"), sum(col("l2")).cast("long").as("n2"))
    // per sample s: explode block into i = cs+1 .. cs+ls (own-sample index)
    def bTerm(cs: String, ls: String, ns: String, no: String): String =
      // i-th own-sample obs; R2 = midrank×2; term quantized ·1e6
      s"""CAST(floor(
        |  pow(CAST(r2 AS DOUBLE) / 2 - CAST($ns + $no AS DOUBLE) / $ns * i, 2)
        |  / ((CAST(i AS DOUBLE) / ($ns + 1)) * (1 - CAST(i AS DOUBLE) / ($ns + 1))
        |     * CAST($no AS DOUBLE) * ($ns + $no) / $ns)
        |  * 1e6 + 0.5) AS BIGINT)""".stripMargin
    // per-block position ranges are O(n/50) long at corpus scale —
    // generate them in ≤64k-element distributed chunks (ChunkedRange),
    // never one block-length array per row
    val b1 = graft.functions.ChunkedRange
      .explodeRange(
        blocks.crossJoin(broadcast(tot)).filter(col("l1") > 0)
          .select(col("r2"), col("n1"), col("n2"), col("c1"), col("l1")),
        expr("c1 + 1"), expr("c1 + l1"), "i")
      .select(expr(bTerm("c1", "l1", "n1", "n2")).as("tq"))
      .agg(sum(col("tq")).cast("long").as("s1"))
    val b2 = graft.functions.ChunkedRange
      .explodeRange(
        blocks.crossJoin(broadcast(tot)).filter(col("l2") > 0)
          .select(col("r2"), col("n1"), col("n2"), col("c2"), col("l2")),
        expr("c2 + 1"), expr("c2 + l2"), "i")
      .select(expr(bTerm("c2", "l2", "n2", "n1")).as("tq"))
      .agg(sum(col("tq")).cast("long").as("s2"))
    b1.crossJoin(broadcast(b2)).crossJoin(broadcast(tot))
      .selectExpr("n1", "n2",
        "round(CAST(s1 AS DOUBLE) / 1e6 / n1, 6) AS b_x",
        "round(CAST(s2 AS DOUBLE) / 1e6 / n2, 6) AS b_y",
        "round((CAST(s1 AS DOUBLE) / 1e6 / n1 + CAST(s2 AS DOUBLE) / 1e6 / n2) / 2, 6) AS b_bws")
  }
  val statBaumgartnerWsSql: String = {
    def bTerm(ns: String, no: String): String =
      s"""CAST(floor(
        |    pow(CAST(r2 AS DOUBLE) / 2 - CAST($ns + $no AS DOUBLE) / $ns * i, 2)
        |    / ((CAST(i AS DOUBLE) / ($ns + 1)) * (1 - CAST(i AS DOUBLE) / ($ns + 1))
        |       * CAST($no AS DOUBLE) * ($ns + $no) / $ns)
        |    * 1e6 + 0.5) AS BIGINT)""".stripMargin
    s"""WITH hist AS (
      |  SELECT CAST(l_quantity AS INT) AS qv,
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS l1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l2
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      |blocks AS (
      |  SELECT qv, l1, l2,
      |    COALESCE(sum(l1) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c1,
      |    COALESCE(sum(l2) OVER (ORDER BY qv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS c2
      |  FROM hist),
      |bl AS (SELECT *, 2 * (c1 + c2) + l1 + l2 + 1 AS r2 FROM blocks),
      |tot AS (SELECT CAST(sum(l1) AS BIGINT) AS n1, CAST(sum(l2) AS BIGINT) AS n2 FROM hist),
      |e1 AS (
      |  SELECT CAST(sum(${bTerm("t.n1", "t.n2")}) AS BIGINT) AS s1
      |  FROM (SELECT b.r2, unnest(generate_series(CAST(b.c1 + 1 AS BIGINT), CAST(b.c1 + b.l1 AS BIGINT))) AS i
      |        FROM bl b WHERE b.l1 > 0) u, tot t),
      |e2 AS (
      |  SELECT CAST(sum(${bTerm("t.n2", "t.n1")}) AS BIGINT) AS s2
      |  FROM (SELECT b.r2, unnest(generate_series(CAST(b.c2 + 1 AS BIGINT), CAST(b.c2 + b.l2 AS BIGINT))) AS i
      |        FROM bl b WHERE b.l2 > 0) u, tot t)
      |SELECT t.n1, t.n2,
      |  round(CAST(s1 AS DOUBLE) / 1e6 / t.n1, 6) AS b_x,
      |  round(CAST(s2 AS DOUBLE) / 1e6 / t.n2, 6) AS b_y,
      |  round((CAST(s1 AS DOUBLE) / 1e6 / t.n1 + CAST(s2 AS DOUBLE) / 1e6 / t.n2) / 2, 6) AS b_bws
      |FROM e1, e2, tot t""".stripMargin
  }

  /** C818 analytics_assortment_overlap — the supplier-nation catalog
    * overlap matrix: per nation the distinct part set shipped, per
    * pair the EXACT Jaccard via a partkey equi-join (co-occurrence
    * counts — never a cross join), emitted for every nation pair,
    * ordered. High overlap = substitutable supply bases; the
    * sourcing-risk complement to the RCA specialization matrix (C777).
    */
  def analyticsAssortmentOverlap(s: SparkSession, d: String): DataFrame = {
    val np = lineitem(s, d)
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nk"), col("l_partkey").as("pk")).distinct()
    val sizes = np.groupBy("nk").agg(count(lit(1)).cast("long").as("sz"))
    val co = np.join(np.select(col("nk").as("nk2"), col("pk")), Seq("pk"))
      .filter(col("nk") < col("nk2"))
      .groupBy("nk", "nk2").agg(count(lit(1)).cast("long").as("inter"))
    co.join(broadcast(sizes), Seq("nk"))
      .join(broadcast(sizes.select(col("nk").as("nk2"), col("sz").as("sz2"))), Seq("nk2"))
      .selectExpr("nk", "nk2", "inter",
        "round(CAST(inter AS DOUBLE) / (sz + sz2 - inter), 6) AS jaccard")
      .orderBy("nk", "nk2")
  }
  val analyticsAssortmentOverlapSql: String =
    """WITH np AS (
      |  SELECT DISTINCT s.s_nationkey AS nk, l.l_partkey AS pk
      |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey),
      |sizes AS (SELECT nk, CAST(count(*) AS BIGINT) AS sz FROM np GROUP BY 1),
      |co AS (
      |  SELECT a.nk, b.nk AS nk2, CAST(count(*) AS BIGINT) AS inter
      |  FROM np a JOIN np b ON b.pk = a.pk AND a.nk < b.nk
      |  GROUP BY 1, 2)
      |SELECT c.nk, c.nk2, c.inter,
      |  round(CAST(c.inter AS DOUBLE) / (s1.sz + s2.sz - c.inter), 6) AS jaccard
      |FROM co c
      |JOIN sizes s1 ON s1.nk = c.nk
      |JOIN sizes s2 ON s2.nk = c.nk2
      |ORDER BY c.nk, c.nk2""".stripMargin

  /** C819 pipeline_tokens_gini — inequality of per-document token
    * counts: Gini + the token-mass share of the longest 10% of
    * documents, via the two-pass global rank (corpus-scale safe).
    * A high Gini means a handful of long documents dominate the token
    * budget — the first thing to know before length-bucketed batching
    * or per-doc capping.
    */
  def pipelineTokensGini(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))
    val ranked = graft.plans.GlobalRank
      .withExclusivePrefixSum(docs.withColumn("one", lit(1L)), "i0", col("one"),
        Seq(col("tok").asc, col("doc_id").asc))
      .withColumn("i", expr("i0 + 1"))
    val tot = docs.agg(count(lit(1)).cast("long").as("n"),
      sum(col("tok")).cast("decimal(38,0)").as("st"))
    ranked.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("st")).as("st"),
        sum(expr("CAST(tok AS DECIMAL(38,0)) * (2 * i - n - 1)")).cast("decimal(38,0)").as("gnum"),
        sum(expr("CASE WHEN i > n - n div 10 THEN tok ELSE 0L END")).cast("decimal(38,0)").as("top_mass"))
      .selectExpr("n", "CAST(st AS DOUBLE) AS total_tokens",
        "round(CAST(gnum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(st AS DOUBLE)), 6) AS tokens_gini",
        "round(CAST(top_mass AS DOUBLE) / CAST(st AS DOUBLE), 6) AS top_decile_mass_share")
  }
  val pipelineTokensGiniSql: String =
    """WITH docs AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |ranked AS (
      |  SELECT tok, row_number() OVER (ORDER BY tok, doc_id) AS i FROM docs),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(tok) AS DECIMAL(38,0)) AS st
      |  FROM docs)
      |SELECT max(t.n) AS n, CAST(max(t.st) AS DOUBLE) AS total_tokens,
      |  round(CAST(CAST(sum(CAST(r.tok AS DECIMAL(38,0)) * (2 * r.i - t.n - 1)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / (CAST(max(t.n) AS DOUBLE) * CAST(max(t.st) AS DOUBLE)), 6) AS tokens_gini,
      |  round(CAST(CAST(sum(CASE WHEN r.i > t.n - t.n // 10 THEN r.tok ELSE 0 END) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(max(t.st) AS DOUBLE), 6) AS top_decile_mass_share
      |FROM ranked r, tot t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_cox_score" -> (statCoxScore _),
    "stat_baumgartner_ws" -> (statBaumgartnerWs _),
    "analytics_assortment_overlap" -> (analyticsAssortmentOverlap _),
    "pipeline_tokens_gini" -> (pipelineTokensGini _),
  )

  val oracle: Map[String, String] = Map(
    "stat_cox_score" -> statCoxScoreSql,
    "stat_baumgartner_ws" -> statBaumgartnerWsSql,
    "analytics_assortment_overlap" -> analyticsAssortmentOverlapSql,
    "pipeline_tokens_gini" -> pipelineTokensGiniSql,
  )
}
