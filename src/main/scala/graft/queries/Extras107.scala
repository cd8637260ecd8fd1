package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** 107th wave — the near-dup threshold tuning curve (what does moving
  * the Jaccard cutoff cost/buy?) and difference-in-differences, the
  * workhorse quasi-experimental estimator the analytics family lacked.
  */
object Extras107 {

  /** Sweep thresholds in integer percent. All ≥ 60 because the staged
    * pair artifact ([[NgramPairStage]]) mines with the τ=0.6 prefix
    * filter — its recall guarantee does not extend below the mining
    * threshold, so a sweep below 0.6 would silently undercount (the
    * "no silent caps" rule; documented here instead of discovered
    * later).
    */
  val SweepTaus = Seq(60L, 70L, 80L, 90L)

  /** dedup_threshold_sweep — the TUNING CURVE for near-dup removal:
    * for τ ∈ {0.6, 0.7, 0.8, 0.9}, how many exact-Jaccard pairs
    * survive, how many documents they touch, and what fraction of the
    * corpus that is. This is the number a curator reads before picking
    * a cutoff — the dedup counterpart of C440's ANN curve. Reads the
    * ONE staged pair table (mined once per corpus, the r7 staging
    * discipline) and thresholds it four ways: O(pairs) work after the
    * stage, no re-mining per τ. Threshold compare is
    * `jaccard >= τ/100.0` with the SAME double on both sides in both
    * engines (60/100.0 parses/computes to the identical IEEE value as
    * the 0.6 the miner used).
    */
  def dedupThresholdSweep(s: SparkSession, d: String): DataFrame = {
    val pairs = NgramPairStage.pairs(s, d)
    val nDocs = documents(s, d).count()
    val sel = pairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(typedLit(SweepTaus)).as("tau"))
      .filter(col("jaccard") >= col("tau").cast("double") / lit(100.0))
      .localCheckpoint(true) // 2 consumers: pair counts + doc counts
    val np = sel.groupBy("tau").agg(count(lit(1)).as("n_pairs"))
    val nd = sel
      .select(col("tau"), explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("tau").agg(countDistinct(col("doc")).as("n_docs"))
    np.join(nd, "tau")
      .select(col("tau"), col("n_pairs"), col("n_docs"),
        round(col("n_docs").cast("double") / lit(nDocs.toDouble), 6)
          .as("frac_docs"))
      .orderBy("tau")
  }
  val dedupThresholdSweepSql: String = {
    val taus = SweepTaus.mkString(", ")
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
       |  FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.6),
       |sel AS (
       |  SELECT doc_a, doc_b, jaccard, tau
       |  FROM pairs CROSS JOIN (SELECT unnest([$taus]) AS tau) t
       |  WHERE jaccard >= CAST(tau AS DOUBLE) / 100.0),
       |np AS (
       |  SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM sel GROUP BY 1),
       |nd AS (
       |  SELECT tau, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM (
       |    SELECT tau, doc_a AS doc FROM sel
       |    UNION ALL SELECT tau, doc_b FROM sel) u
       |  GROUP BY 1)
       |SELECT CAST(np.tau AS BIGINT) AS tau, np.n_pairs, nd.n_docs,
       |  round(CAST(nd.n_docs AS DOUBLE)
       |    / (SELECT count(*) FROM documents), 6) AS frac_docs
       |FROM np JOIN nd ON nd.tau = np.tau
       |ORDER BY tau""".stripMargin
  }

  /** Treatment/period split for [[analyticsDiffInDiff]] — rule-derived
    * and shared: treatment = even nation key, post = orders from
    * 1996-01-01.
    */
  val DidCutoff = "1996-01-01"

  /** analytics_diff_in_diff — DIFFERENCE-IN-DIFFERENCES, the standard
    * quasi-experimental estimator: did the "treated" group's average
    * order value move differently across the cutoff than the control
    * group's? One aggregation pass with four conditional exact-decimal
    * cells (the dsum discipline: sums are DECIMAL(14,2)-exact, the
    * only doubles are the four cell means and their closing
    * arithmetic, written as the same IEEE expression tree in both
    * engines). On a rule-derived split of generator data the estimate
    * must sit near zero — which is itself the property the spec pins
    * (a placebo test, in the econometrics sense). Scale: single
    * streaming pass, O(1) state, map-side combinable.
    */
  def analyticsDiffInDiff(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .join(broadcast(customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select((col("c_nationkey") % 2 === 0).as("treat"),
        (col("o_orderdate") >= lit(DidCutoff).cast("date")).as("post"),
        col("o_totalprice").cast("decimal(14,2)").as("v"))
    def cellSum(t: Boolean, p: Boolean) =
      sum(when(col("treat") === t && col("post") === p, col("v")))
    def cellN(t: Boolean, p: Boolean) =
      sum(when(col("treat") === t && col("post") === p, 1L).otherwise(0L))
    val m = base.agg(
      cellSum(true, false).as("s_t0"), cellN(true, false).as("n_t0"),
      cellSum(true, true).as("s_t1"), cellN(true, true).as("n_t1"),
      cellSum(false, false).as("s_c0"), cellN(false, false).as("n_c0"),
      cellSum(false, true).as("s_c1"), cellN(false, true).as("n_c1"))
    def avg(sc: String, nc: String) = col(sc).cast("double") / col(nc)
    m.select(
        round(avg("s_t0", "n_t0"), 6).as("treat_pre"),
        round(avg("s_t1", "n_t1"), 6).as("treat_post"),
        round(avg("s_c0", "n_c0"), 6).as("ctrl_pre"),
        round(avg("s_c1", "n_c1"), 6).as("ctrl_post"),
        round((avg("s_t1", "n_t1") - avg("s_t0", "n_t0"))
          - (avg("s_c1", "n_c1") - avg("s_c0", "n_c0")), 6).as("did"))
  }
  val analyticsDiffInDiffSql: String =
    s"""WITH base AS (
       |  SELECT (c.c_nationkey % 2 = 0) AS treat,
       |    (o.o_orderdate >= DATE '$DidCutoff') AS post,
       |    CAST(o.o_totalprice AS DECIMAL(14,2)) AS v
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
       |m AS (
       |  SELECT
       |    sum(CASE WHEN treat AND NOT post THEN v END) AS s_t0,
       |    sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS n_t0,
       |    sum(CASE WHEN treat AND post THEN v END) AS s_t1,
       |    sum(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS n_t1,
       |    sum(CASE WHEN NOT treat AND NOT post THEN v END) AS s_c0,
       |    sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS n_c0,
       |    sum(CASE WHEN NOT treat AND post THEN v END) AS s_c1,
       |    sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS n_c1
       |  FROM base)
       |SELECT
       |  round(CAST(s_t0 AS DOUBLE) / n_t0, 6) AS treat_pre,
       |  round(CAST(s_t1 AS DOUBLE) / n_t1, 6) AS treat_post,
       |  round(CAST(s_c0 AS DOUBLE) / n_c0, 6) AS ctrl_pre,
       |  round(CAST(s_c1 AS DOUBLE) / n_c1, 6) AS ctrl_post,
       |  round((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)
       |    - (CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0), 6)
       |    AS did
       |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_threshold_sweep" -> (dedupThresholdSweep _),
    "analytics_diff_in_diff" -> (analyticsDiffInDiff _))

  val oracle: Map[String, String] = Map(
    "dedup_threshold_sweep" -> dedupThresholdSweepSql,
    "analytics_diff_in_diff" -> analyticsDiffInDiffSql)
}
