package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-ninth wave: late-interaction MaxSim scoring, hypothetical-set
  * rank, and day-of-week seasonal indices.
  */
object Extras89 {

  /** The late-interaction QUERY-TOKEN budget: label-0 vectors with
    * `vec_id < MaxsimQueryBudget` form the query's token set. A ColBERT
    * query has a FIXED token count — it never grows with the corpus —
    * so the budget is a semantic constant, not an approximation. It is
    * also the scale guard: without it the query side is every label-0
    * vector (a corpus fraction) and the |Q|·|D| pair frame goes
    * quadratic — MEASURED at the 10× upsampled fixture: exponent +1.37
    * (62 s from 2.7 s) before this budget, the one super-linear row of
    * the r8 scale validation. One constant interpolated into plan AND
    * oracle (the Extras98 kNN pattern).
    */
  val MaxsimQueryBudget = 600

  /** embed_maxsim_late_interaction — ColBERT-style late-interaction
    * scoring: a budget-bounded query token set ([[MaxsimQueryBudget]])
    * against every candidate document token; token dots are
    * EXACT integers through the dim-keyed join of quantized
    * components (the C343 scheme), per-(query-token, doc) maxima are
    * order-independent, and the final Σ over query tokens — the only
    * order-sensitive IEEE sum — folds qid-sorted per document. Scale:
    * the query component table is ≤ budget×64 rows → broadcast, the
    * corpus side STREAMS map-side into the (qid,tid) partial
    * aggregation (no pre-join shuffle of the corpus) — O(|Q|·n·d)
    * with constant |Q|, linear in corpus size. The corpus-side norm
    * join is deliberately NOT hinted: norms is one row per corpus
    * vector, so AQE broadcasts it at small scale and shuffle-joins
    * co-partitioned at 100 TB.
    */
  def embedMaxsimLateInteraction(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
        floor(col("col").cast("double") * 1000000d + 0.5d).as("fx"))
    val norms = comp.groupBy("vec_id")
      .agg(sum(col("fx") * col("fx")).as("n2"))
    val q = comp.filter(col("label") === 0 && col("vec_id") < MaxsimQueryBudget)
      .select(col("vec_id").as("qid"), col("dim"), col("fx").as("fq"))
    val t = comp.filter(col("label") =!= 0)
      .select(col("vec_id").as("tid"), col("label"), col("dim"),
        col("fx").as("ft"))
    val dots = broadcast(q).join(t, "dim")
      .groupBy("qid", "tid", "label")
      .agg(sum(col("fq") * col("ft")).as("dot"))
    // qid-side norms filter BEFORE the broadcast: qid only takes values
    // < MaxsimQueryBudget, so ship ≤ budget rows — a bare
    // broadcast(norms) here would collect one row per CORPUS vector to
    // the driver, the exact unbounded-broadcast shape the tid side
    // deliberately leaves to AQE (the inner join on qid discards the
    // few non-query rows the id-only filter lets through)
    val qNorms = norms.filter(col("vec_id") < MaxsimQueryBudget)
      .select(col("vec_id").as("qid"), col("n2").as("nq"))
    val cos = dots
      .join(broadcast(qNorms), "qid")
      .join(norms.select(col("vec_id").as("tid"),
        col("n2").as("nt")), "tid")
      .select(col("qid"), col("label"),
        (col("dot").cast("double")
          / sqrt(col("nq").cast("double") * col("nt").cast("double")))
          .as("c"))
    cos.groupBy("qid", "label").agg(max(col("c")).as("mx"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_q"),
        sort_array(collect_list(struct(col("qid"), col("mx")))).as("ql"))
      .select(col("label"), col("n_q"),
        round(expr("aggregate(ql, 0D, (acc, t) -> acc + t.mx)"), 6)
          .as("maxsim"))
      .orderBy("label")
  }
  val embedMaxsimLateInteractionSql: String =
    s"""WITH comp AS (
      |  SELECT vec_id, label, dim,
      |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000 + 0.5)
      |      AS BIGINT) AS fx
      |  FROM embeddings, generate_series(1, 64) AS g(dim)),
      |norms AS (
      |  SELECT vec_id, sum(fx * fx) AS n2 FROM comp GROUP BY 1),
      |dots AS (
      |  SELECT q.vec_id AS qid, t.vec_id AS tid, t.label,
      |    sum(q.fx * t.fx) AS dot
      |  FROM comp q JOIN comp t ON q.dim = t.dim
      |  WHERE q.label = 0 AND q.vec_id < $MaxsimQueryBudget AND t.label <> 0
      |  GROUP BY 1, 2, 3),
      |cos AS (
      |  SELECT qid, label,
      |    CAST(dot AS DOUBLE)
      |      / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nt.n2 AS DOUBLE)) AS c
      |  FROM dots JOIN norms nq ON dots.qid = nq.vec_id
      |    JOIN norms nt ON dots.tid = nt.vec_id),
      |mx AS (
      |  SELECT qid, label, max(c) AS mx FROM cos GROUP BY 1, 2),
      |fold AS (
      |  SELECT label, count(*) AS n_q,
      |    list_sort(list(struct_pack(qid := qid, mx := mx))) AS ql
      |  FROM mx GROUP BY 1)
      |SELECT label, n_q,
      |  round(list_reduce(list_prepend(0.0, list_transform(ql, t -> t.mx)),
      |    (a, b) -> a + b), 6) AS maxsim
      |FROM fold ORDER BY label""".stripMargin

  /** agg_hypothetical_rank — the hypothetical-set functions (SQL's
    * `rank(v) WITHIN GROUP`): for three probe values, the rank and
    * percentile the value WOULD take in each stream's distribution,
    * as pure conditional counting in ONE fact pass (probes fan out as
    * a 3-literal explode, the comparisons ride the scan).
    */
  def aggHypotheticalRank(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), dec(col("value")).as("v"),
        explode(array(lit(100.0d), lit(500.0d), lit(900.0d))).as("probe"))
      .groupBy("event_type", "probe")
      .agg(count(lit(1)).as("n"),
        (sum(when(col("v") < col("probe").cast(M), 1L).otherwise(0L)) + 1L)
          .as("hyp_rank"),
        round(sum(when(col("v") <= col("probe").cast(M), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6)
          .as("hyp_percentile"))
      .orderBy("event_type", "probe")
  val aggHypotheticalRankSql: String =
    """SELECT event_type, CAST(probe AS DOUBLE) AS probe, count(*) AS n,
      |  CAST(sum(CASE WHEN v < CAST(probe AS DECIMAL(14,2)) THEN 1 ELSE 0 END)
      |    + 1 AS BIGINT) AS hyp_rank,
      |  round(CAST(sum(CASE WHEN v <= CAST(probe AS DECIMAL(14,2))
      |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hyp_percentile
      |FROM (
      |  SELECT event_type, CAST(value AS DECIMAL(14,2)) AS v, probe
      |  FROM events CROSS JOIN (VALUES (100.0), (500.0), (900.0)) AS p(probe))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** win_seasonal_dow_index — day-of-week seasonal indices via
    * centered-MA decomposition: the 7-day centered trend is exact
    * decimal window sums over the O(days) frame, detrending is one
    * IEEE op per row, and each dow's mean detrended value folds
    * day-sorted (7 bounded folds). The classic STL-lite readout for
    * weekly seasonality strength.
    */
  def winSeasonalDowIndex(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("tsum", sum(col("rev")).over(w))
      .filter(col("cnt") === 7)
      .select(col("day"), dayofweek(col("day")).cast("long").as("dow"),
        (col("rev").cast("double")
          - col("tsum").cast("double") / 7.0d).as("det"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("det")))).as("dl"))
      .select(col("dow"), col("n_days"),
        round(expr("aggregate(dl, 0D, (acc, t) -> acc + t.det)")
          / col("n_days").cast("double"), 6).as("seasonal_idx"))
      .orderBy("dow")
  }
  val winSeasonalDowIndexSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, rev,
      |    count(*) OVER win AS cnt, sum(rev) OVER win AS tsum
      |  FROM daily
      |  WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |det AS (
      |  SELECT dayofweek(day) + 1 AS dow, day,
      |    CAST(rev AS DOUBLE) - CAST(tsum AS DOUBLE) / 7.0 AS det
      |  FROM t WHERE cnt = 7),
      |fold AS (
      |  SELECT dow, count(*) AS n_days,
      |    list_sort(list(struct_pack(day := day, det := det))) AS dl
      |  FROM det GROUP BY 1)
      |SELECT CAST(dow AS BIGINT) AS dow, n_days,
      |  round(list_reduce(list_prepend(0.0, list_transform(dl, t -> t.det)),
      |    (a, b) -> a + b) / n_days, 6) AS seasonal_idx
      |FROM fold ORDER BY dow""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_maxsim_late_interaction" -> (embedMaxsimLateInteraction _),
    "agg_hypothetical_rank" -> (aggHypotheticalRank _),
    "win_seasonal_dow_index" -> (winSeasonalDowIndex _))

  val oracle: Map[String, String] = Map(
    "embed_maxsim_late_interaction" -> embedMaxsimLateInteractionSql,
    "agg_hypothetical_rank" -> aggHypotheticalRankSql,
    "win_seasonal_dow_index" -> winSeasonalDowIndexSql)
}
