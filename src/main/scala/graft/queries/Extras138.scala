package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 38 (C556–C559): rank fusion for retrieval, KPSS stationarity,
  * ordinal permutation entropy, and fixed-point HITS.
  */
object Extras138 {

  /** C556 text_rrf_fusion — reciprocal-rank fusion of two document
    * rankings (quality PPM desc, length desc), the standard way to
    * merge BM25-style and embedding retrieval lists. Each ranking is
    * the two-pass [[graft.plans.GlobalRank]] (never a single-partition
    * corpus window), and the RRF score is EXACT pico fixed-point —
    * 10¹² div (60+r), integer-summed — so fusion order is engine-
    * independent. Top-20 by fused score is a TakeOrdered.
    */
  def textRrfFusion(s: SparkSession, d: String): DataFrame = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    val scored = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("tok", size(col("toks")).cast("long"))
      .withColumn("stop",
        size(expr(s"filter(toks, t -> t IN $stopSql)")).cast("long"))
      .select(col("doc_id"), col("n_chars"),
        expr("7000 * least(tok, 100L) + (300000 * stop) div tok").as("q_ppm"))
    val r1 = graft.plans.GlobalRank.withGlobalRowNumber(
        scored.select(col("doc_id"), col("q_ppm")), "r1",
        Seq(col("q_ppm").desc, col("doc_id")))
      .select(col("doc_id"), col("r1"))
    val r2 = graft.plans.GlobalRank.withGlobalRowNumber(
        scored.select(col("doc_id"), col("n_chars")), "r2",
        Seq(col("n_chars").desc, col("doc_id")))
      .select(col("doc_id"), col("r2"))
    r1.join(r2, "doc_id")
      .selectExpr("doc_id", "r1", "r2",
        "1000000000000L div (60 + r1) + 1000000000000L div (60 + r2) AS rrf_fx")
      .orderBy(col("rrf_fx").desc, col("doc_id"))
      .limit(20)
      .selectExpr("doc_id", "r1 AS rank_quality", "r2 AS rank_length",
        "round(CAST(rrf_fx AS DOUBLE) / 1e12, 9) AS rrf_score")
  }
  val textRrfFusionSql: String = {
    val stopSql = "('the', 'a', 'of', 'and', 'in', 'on', 'to', 'is')"
    s"""WITH scored AS (
       |  SELECT doc_id, n_chars,
       |    7000 * least(CAST(len(string_split(text, ' ')) AS BIGINT), 100)
       |      + (300000 * CAST(len(list_filter(string_split(text, ' '),
       |          t -> t IN $stopSql)) AS BIGINT))
       |        // CAST(len(string_split(text, ' ')) AS BIGINT) AS q_ppm
       |  FROM documents),
       |ranks AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY q_ppm DESC, doc_id) AS r1,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r2
       |  FROM scored),
       |fused AS (
       |  SELECT doc_id, r1, r2,
       |    1000000000000 // (60 + r1) + 1000000000000 // (60 + r2) AS rrf_fx
       |  FROM ranks)
       |SELECT doc_id, r1 AS rank_quality, r2 AS rank_length,
       |  round(CAST(rrf_fx AS DOUBLE) / 1e12, 9) AS rrf_score
       |FROM fused ORDER BY rrf_fx DESC, doc_id LIMIT 20""".stripMargin
  }

  /** C557 stat_kpss_level — KPSS level-stationarity test (lag-0
    * long-run variance) on daily revenue, fully denominator-cleared:
    * with T_t = n·(prefix sum of c through t) − t·Σc (exact — the
    * n-scaled demeaned partial sum), the statistic is
    * KPSS = ΣT_t² / (n·(nΣc² − (Σc)²)) — exact DECIMAL(38,0) integers
    * end to end, ONE final IEEE division. Prefix sums ride a window
    * over the bounded daily frame; complements C552's Dickey–Fuller
    * (null hypotheses on opposite sides).
    */
  def statKpssLevel(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("pc", sum(expr("CAST(c AS DECIMAL(38,0))")).over(w))
      .withColumn("t", count(lit(1)).over(w))
    val tot = daily.agg(
      count(lit(1)).cast("long").as("n"),
      sum(expr("CAST(c AS DECIMAL(38,0))")).as("sc"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
    pre.crossJoin(broadcast(tot))
      .selectExpr("n", "sc", "scc",
        "CAST(n AS DECIMAL(38,0)) * pc - CAST(t AS DECIMAL(38,0)) * sc AS bigT")
      .agg(
        max(col("n")).as("n"),
        max(col("sc")).as("sc"),
        max(col("scc")).as("scc"),
        sum(expr("bigT * bigT")).as("stt"))
      .selectExpr("n AS n_days",
        """round(CAST(stt AS DOUBLE)
          |  / (CAST(n AS DOUBLE)
          |     * CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE)),
          |  6) AS kpss""".stripMargin,
        """CASE WHEN CAST(stt AS DOUBLE)
          |  / (CAST(n AS DOUBLE)
          |     * CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE))
          |  > 0.463 THEN 'reject_level_stationary'
          |  ELSE 'level_stationary_plausible' END AS verdict_5pct""".stripMargin)
  }
  val statKpssLevelSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |pre AS (
      |  SELECT c,
      |    sum(CAST(c AS DECIMAL(38,0))) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(c AS DECIMAL(38,0))) AS sc,
      |    sum(CAST(c AS DECIMAL(38,0)) * c) AS scc
      |  FROM daily),
      |tt AS (
      |  SELECT n, sc, scc,
      |    CAST(n AS DECIMAL(38,0)) * pc - CAST(t AS DECIMAL(38,0)) * sc AS bigT
      |  FROM pre, tot),
      |agg AS (
      |  SELECT max(n) AS n, max(sc) AS sc, max(scc) AS scc,
      |    sum(bigT * bigT) AS stt
      |  FROM tt)
      |SELECT n AS n_days,
      |  round(CAST(stt AS DOUBLE)
      |    / (CAST(n AS DOUBLE)
      |       * CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE)), 6)
      |    AS kpss,
      |  CASE WHEN CAST(stt AS DOUBLE)
      |    / (CAST(n AS DOUBLE)
      |       * CAST(CAST(n AS DECIMAL(38,0)) * scc - sc * sc AS DOUBLE))
      |    > 0.463 THEN 'reject_level_stationary'
      |    ELSE 'level_stationary_plausible' END AS verdict_5pct
      |FROM agg""".stripMargin

  /** C558 time_permutation_entropy — ordinal-pattern entropy of each
    * event stream's daily mean-value series (Bandt–Pompe order 3, tie
    * handling by the ≤/> comparison code). The 8 pattern counts pivot
    * into ONE row per stream (conditional aggregates — exact longs),
    * and the entropy assembles as one FIXED-ORDER expression over the
    * ≤8 terms — never a float sum in shuffle order. Daily means are
    * exact micro-cent fixed-point (cleared by the day's count before
    * comparison: compare a·nb vs b·na cross-multiplied — no division
    * at all).
    */
  def timePermutationEntropy(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .cast("long").as("sv"),
        count(lit(1)).cast("long").as("nv"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val coded = daily
      .withColumn("sv1", lead(col("sv"), 1).over(w))
      .withColumn("nv1", lead(col("nv"), 1).over(w))
      .withColumn("sv2", lead(col("sv"), 2).over(w))
      .withColumn("nv2", lead(col("nv"), 2).over(w))
      .filter(col("sv2").isNotNull)
      // mean comparisons cross-multiplied: sv1/nv1 > sv/nv ⇔ sv1·nv > sv·nv1
      .selectExpr("event_type",
        """CAST(CASE WHEN sv1 * nv > sv * nv1 THEN 4 ELSE 0 END
          |  + CASE WHEN sv2 * nv1 > sv1 * nv2 THEN 2 ELSE 0 END
          |  + CASE WHEN sv2 * nv > sv * nv2 THEN 1 ELSE 0 END
          |  AS BIGINT) AS code""".stripMargin)
    val counts = coded.groupBy("event_type")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN code = 0 THEN 1L ELSE 0L END")).cast("long").as("c0"),
        sum(expr("CASE WHEN code = 1 THEN 1L ELSE 0L END")).cast("long").as("c1"),
        sum(expr("CASE WHEN code = 2 THEN 1L ELSE 0L END")).cast("long").as("c2"),
        sum(expr("CASE WHEN code = 3 THEN 1L ELSE 0L END")).cast("long").as("c3"),
        sum(expr("CASE WHEN code = 4 THEN 1L ELSE 0L END")).cast("long").as("c4"),
        sum(expr("CASE WHEN code = 5 THEN 1L ELSE 0L END")).cast("long").as("c5"),
        sum(expr("CASE WHEN code = 6 THEN 1L ELSE 0L END")).cast("long").as("c6"),
        sum(expr("CASE WHEN code = 7 THEN 1L ELSE 0L END")).cast("long").as("c7"))
    val term = (i: Int) =>
      s"(CASE WHEN c$i > 0 THEN CAST(c$i AS DOUBLE) / n * ln(CAST(c$i AS DOUBLE) / n) ELSE 0.0 END)"
    counts.selectExpr("event_type", "n AS n_windows",
      s"""round(-(${(0 to 7).map(term).mkString(" + ")}), 6)
         |  AS perm_entropy""".stripMargin)
      .orderBy("event_type")
  }
  val timePermutationEntropySql: String = {
    val term = (i: Int) =>
      s"(CASE WHEN c$i > 0 THEN CAST(c$i AS DOUBLE) / n * ln(CAST(c$i AS DOUBLE) / n) ELSE 0.0 END)"
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS sv,
       |    CAST(count(*) AS BIGINT) AS nv
       |  FROM events GROUP BY 1, 2),
       |coded AS (
       |  SELECT event_type,
       |    CASE WHEN lead(sv, 1) OVER w * nv > sv * lead(nv, 1) OVER w
       |      THEN 4 ELSE 0 END
       |    + CASE WHEN lead(sv, 2) OVER w * lead(nv, 1) OVER w
       |        > lead(sv, 1) OVER w * lead(nv, 2) OVER w THEN 2 ELSE 0 END
       |    + CASE WHEN lead(sv, 2) OVER w * nv > sv * lead(nv, 2) OVER w
       |      THEN 1 ELSE 0 END AS code,
       |    lead(sv, 2) OVER w AS sv2
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |counts AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    ${(0 to 7).map(i =>
            s"CAST(sum(CASE WHEN code = $i THEN 1 ELSE 0 END) AS BIGINT) AS c$i")
            .mkString(",\n       |    ")}
       |  FROM coded WHERE sv2 IS NOT NULL GROUP BY 1)
       |SELECT event_type, n AS n_windows,
       |  round(-(${(0 to 7).map(term).mkString(" + ")}), 6) AS perm_entropy
       |FROM counts ORDER BY event_type""".stripMargin
  }

  private val HitsIters = 3

  /** C559 graph_hits_fixed — HITS hubs/authorities on the supplier→
    * customer bipartite graph in MAX-NORMALIZED integer micro-units
    * (the C115 PageRank fixed-point idiom: integer sums are shuffle-
    * order-independent, integer divisions are exact, so three
    * iterations land bit-identical on any cluster and in the oracle).
    * Per iteration: hub(s) = Σ auth(c) over edges, rescaled so
    * max = 10⁶ (scalar-broadcast max — never a global window), then
    * the mirror step for authorities. O(|E|) per round.
    */
  def graphHitsFixed(s: SparkSession, d: String): DataFrame = {
    // The edge set feeds SIX joins (2 per iteration) and each
    // iteration's scores feed the next: left lazy, Spark re-derives
    // the whole upstream DAG per reference (r10 bench: 13.4 s at
    // sf0.1). localCheckpoint pins each round's concrete RDD — every
    // join and aggregation executes exactly once (the GlobalRank
    // pinning rationale; values are exact integers, so pinning cannot
    // change results, only cut recomputation). 13.4 s → ~2 s.
    val edges = lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck")).distinct()
      .localCheckpoint()
    var auth = edges.select(col("ck")).distinct()
      .select(col("ck"), lit(1000000L).as("a_mu"))
    var hub: DataFrame = null
    for (_ <- 1 to HitsIters) {
      // r15: each half-iteration's join+aggregate used to execute TWICE
      // — once under the broadcast max subquery and again under the
      // scale projection (exact integers, so the pin cannot change
      // results, only cut the recompute; guide §1.2 "don't compute
      // things you throw away"). Pinning raw halves the per-iteration
      // join work: 12 edge joins per run → 6.
      val hraw = edges.join(auth, "ck")
        .groupBy("sk").agg(sum(col("a_mu")).cast("long").as("raw"))
        .localCheckpoint()
      val hmax = hraw.agg(max(col("raw")).cast("long").as("mx"))
      hub = hraw.crossJoin(broadcast(hmax))
        .selectExpr("sk", "(raw * 1000000L) div mx AS h_mu")
        .localCheckpoint()
      val araw = edges.join(hub, "sk")
        .groupBy("ck").agg(sum(col("h_mu")).cast("long").as("raw"))
        .localCheckpoint()
      val amax = araw.agg(max(col("raw")).cast("long").as("mx"))
      auth = araw.crossJoin(broadcast(amax))
        .selectExpr("ck", "(raw * 1000000L) div mx AS a_mu")
        .localCheckpoint()
    }
    val topHubs = hub.orderBy(col("h_mu").desc, col("sk")).limit(10)
      .selectExpr("'hub' AS kind", "sk AS node_id", "h_mu AS score_mu")
    val topAuth = auth.orderBy(col("a_mu").desc, col("ck")).limit(10)
      .selectExpr("'authority' AS kind", "ck AS node_id", "a_mu AS score_mu")
    topHubs.unionAll(topAuth)
      .orderBy(col("kind"), col("score_mu").desc, col("node_id"))
  }
  val graphHitsFixedSql: String = {
    // unrolled 3 iterations; each hub/auth step is join+group+max-scale
    """WITH edges AS (
      |  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |a0 AS (SELECT DISTINCT ck, CAST(1000000 AS BIGINT) AS a_mu FROM edges),
      |h1r AS (SELECT sk, CAST(sum(a_mu) AS BIGINT) AS raw
      |  FROM edges JOIN a0 USING (ck) GROUP BY sk),
      |h1 AS (SELECT sk, raw * 1000000 // (SELECT max(raw) FROM h1r) AS h_mu FROM h1r),
      |a1r AS (SELECT ck, CAST(sum(h_mu) AS BIGINT) AS raw
      |  FROM edges JOIN h1 USING (sk) GROUP BY ck),
      |a1 AS (SELECT ck, raw * 1000000 // (SELECT max(raw) FROM a1r) AS a_mu FROM a1r),
      |h2r AS (SELECT sk, CAST(sum(a_mu) AS BIGINT) AS raw
      |  FROM edges JOIN a1 USING (ck) GROUP BY sk),
      |h2 AS (SELECT sk, raw * 1000000 // (SELECT max(raw) FROM h2r) AS h_mu FROM h2r),
      |a2r AS (SELECT ck, CAST(sum(h_mu) AS BIGINT) AS raw
      |  FROM edges JOIN h2 USING (sk) GROUP BY ck),
      |a2 AS (SELECT ck, raw * 1000000 // (SELECT max(raw) FROM a2r) AS a_mu FROM a2r),
      |h3r AS (SELECT sk, CAST(sum(a_mu) AS BIGINT) AS raw
      |  FROM edges JOIN a2 USING (ck) GROUP BY sk),
      |h3 AS (SELECT sk, raw * 1000000 // (SELECT max(raw) FROM h3r) AS h_mu FROM h3r),
      |a3r AS (SELECT ck, CAST(sum(h_mu) AS BIGINT) AS raw
      |  FROM edges JOIN h3 USING (sk) GROUP BY ck),
      |a3 AS (SELECT ck, raw * 1000000 // (SELECT max(raw) FROM a3r) AS a_mu FROM a3r),
      |th AS (SELECT 'hub' AS kind, sk AS node_id, h_mu AS score_mu
      |  FROM h3 ORDER BY h_mu DESC, sk LIMIT 10),
      |ta AS (SELECT 'authority' AS kind, ck AS node_id, a_mu AS score_mu
      |  FROM a3 ORDER BY a_mu DESC, ck LIMIT 10)
      |SELECT * FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
      |ORDER BY kind, score_mu DESC, node_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rrf_fusion" -> (textRrfFusion _),
    "stat_kpss_level" -> (statKpssLevel _),
    "time_permutation_entropy" -> (timePermutationEntropy _),
    "graph_hits_fixed" -> (graphHitsFixed _),
  )

  val oracle: Map[String, String] = Map(
    "text_rrf_fusion" -> textRrfFusionSql,
    "stat_kpss_level" -> statKpssLevelSql,
    "time_permutation_entropy" -> timePermutationEntropySql,
    "graph_hits_fixed" -> graphHitsFixedSql,
  )
}
