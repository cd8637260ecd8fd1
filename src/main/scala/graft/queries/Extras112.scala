package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** 112th wave — distribution-drift metrics: PSI (the model-monitoring
  * standard for "did the feature distribution move?") and
  * Jensen–Shannon divergence. Both follow the agg_entropy discipline:
  * probabilities are exact rationals of integer counts, the transcend
  * is log2 (parity proven by C-entropy since round 4), and the sum
  * folds a SORTED collected list so both engines add in bin order.
  */
object Extras112 {

  val PsiCutoff = "1998-01-01"
  val PsiBinCents = 5000000L // 50k-dollar bins
  val PsiBins = 10L

  /** stat_psi_drift — POPULATION STABILITY INDEX of the order-value
    * distribution across the 1998 cutoff, in bits (log2; the
    * conventional ln-PSI is this × ln 2): PSI = Σ (p−q)·log2(p/q)
    * over 10 fixed absolute cent-bins, with +1 Laplace smoothing so
    * an empty bin contributes a finite, identically-computed term in
    * both engines (and the metric stays defined at any sf). Counts
    * are one conditional-sum pass; the fold walks bins ascending.
    * PSI < 0.1 ⇒ stable — which is what a placebo split of generator
    * data must show (spec-pinned).
    */
  def statPsiDrift(s: SparkSession, d: String): DataFrame = {
    // NB: Scala-side `/` on long columns is TRUE division (double);
    // integral binning must go through SQL `div`
    val binned = orders(s, d).select(
      expr(s"least(cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)" +
        s" div $PsiBinCents, ${PsiBins - 1}L)").as("bin"),
      (col("o_orderdate") < lit(PsiCutoff).cast("date")).as("pre"))
    val counts = binned.groupBy("bin")
      .agg(sum(when(col("pre"), 1L).otherwise(0L)).as("c0"),
        sum(when(!col("pre"), 1L).otherwise(0L)).as("c1"))
    counts.agg(
        sort_array(collect_list(struct(col("bin"), col("c0"), col("c1"))))
          .as("bl"),
        sum(col("c0")).as("t0"), sum(col("c1")).as("t1"))
      .select(col("t0").as("n_pre"), col("t1").as("n_post"),
        round(expr(
          s"""aggregate(bl, 0D, (acc, b) ->
             |  acc + ((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $PsiBins AS DOUBLE))
             |       - (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $PsiBins AS DOUBLE)))
             |      * log2((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $PsiBins AS DOUBLE))
             |           / (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $PsiBins AS DOUBLE))))"""
            .stripMargin), 8).as("psi_bits"))
  }
  val statPsiDriftSql: String =
    s"""WITH binned AS (
       |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
       |      // $PsiBinCents, ${PsiBins - 1}) AS bin,
       |    (o_orderdate < DATE '$PsiCutoff') AS pre
       |  FROM orders),
       |counts AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |    CAST(sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS BIGINT) AS c1
       |  FROM binned GROUP BY 1),
       |g AS (
       |  SELECT list_sort(list(struct_pack(bin := bin, c0 := c0, c1 := c1)))
       |      AS bl,
       |    CAST(sum(c0) AS BIGINT) AS t0, CAST(sum(c1) AS BIGINT) AS t1
       |  FROM counts)
       |SELECT t0 AS n_pre, t1 AS n_post,
       |  round(list_reduce(list_prepend(0.0, list_transform(bl, b ->
       |    ((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $PsiBins AS DOUBLE))
       |     - (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $PsiBins AS DOUBLE)))
       |    * log2((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $PsiBins AS DOUBLE))
       |         / (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $PsiBins AS DOUBLE))))),
       |    (x, y) -> x + y), 8) AS psi_bits
       |FROM g""".stripMargin

  /** stat_js_divergence — JENSEN–SHANNON divergence (bits) between the
    * WEEKDAY and WEEKEND event-type mixes: JS = ½Σp·log2(p/m) +
    * ½Σq·log2(q/m), m = (p+q)/2 — symmetric, bounded [0,1], the
    * drift metric for categorical mixes. Same discipline as PSI:
    * exact-count rationals with +1 smoothing over the observed type
    * set, type-sorted fold. JS ≈ 0 expected (event types don't depend
    * on weekday in generator data) — spec-pinned.
    */
  def statJsDivergence(s: SparkSession, d: String): DataFrame = {
    val typed = events(s, d).select(col("event_type"),
      (dayofweek(col("ts").cast("date")).isin(1, 7)).as("wkend"))
    val counts = typed.groupBy("event_type")
      .agg(sum(when(!col("wkend"), 1L).otherwise(0L)).as("c0"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("c1"))
    val k = "size(bl)"
    counts.agg(
        sort_array(collect_list(struct(col("event_type"), col("c0"), col("c1"))))
          .as("bl"),
        sum(col("c0")).as("t0"), sum(col("c1")).as("t1"))
      .select(col("t0").as("n_weekday"), col("t1").as("n_weekend"),
        round(expr(
          s"""aggregate(bl, 0D, (acc, b) ->
             |  acc + 0.5D * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
             |      * log2((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
             |        / (0.5D * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
             |         + 0.5D * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))))
             |      + 0.5D * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))
             |      * log2((CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))
             |        / (0.5D * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
             |         + 0.5D * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE)))))"""
            .stripMargin), 8).as("js_bits"))
  }
  val statJsDivergenceSql: String = {
    val k = "len(bl)"
    s"""WITH counts AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
       |      THEN 0 ELSE 1 END) AS BIGINT) AS c0,
       |    CAST(sum(CASE WHEN dayofweek(CAST(ts AS DATE)) + 1 IN (1, 7)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
       |  FROM events GROUP BY 1),
       |g AS (
       |  SELECT list_sort(list(struct_pack(event_type := event_type,
       |      c0 := c0, c1 := c1))) AS bl,
       |    CAST(sum(c0) AS BIGINT) AS t0, CAST(sum(c1) AS BIGINT) AS t1
       |  FROM counts)
       |SELECT t0 AS n_weekday, t1 AS n_weekend,
       |  round(list_reduce(list_prepend(0.0, list_transform(bl, b ->
       |    0.5 * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
       |      * log2((CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
       |        / (0.5 * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
       |         + 0.5 * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))))
       |    + 0.5 * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))
       |      * log2((CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE))
       |        / (0.5 * (CAST(b.c0 + 1 AS DOUBLE) / CAST(t0 + $k AS DOUBLE))
       |         + 0.5 * (CAST(b.c1 + 1 AS DOUBLE) / CAST(t1 + $k AS DOUBLE)))))),
       |    (x, y) -> x + y), 8) AS js_bits
       |FROM g""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_psi_drift" -> (statPsiDrift _),
    "stat_js_divergence" -> (statJsDivergence _))

  val oracle: Map[String, String] = Map(
    "stat_psi_drift" -> statPsiDriftSql,
    "stat_js_divergence" -> statJsDivergenceSql)
}
