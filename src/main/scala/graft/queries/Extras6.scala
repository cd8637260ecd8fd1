package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sixth wave of coverage operators: VARIANT semi-structured access,
  * offset tumbling windows, exact higher-moment statistics, the
  * sorted-neighborhood dedup method, deterministic set aggregation,
  * and discrete percentiles — each with a DuckDB oracle.
  */
object Extras6 {

  /** variant_funcs — the VARIANT semi-structured type (Spark 4):
    * `parse_json` ingests the raw props string into the binary
    * variant encoding once, then `variant_get` path extraction runs
    * typed access without re-parsing — the schema-on-read shape that
    * replaces repeated `get_json_object` string parsing at scale
    * (variant decode is columnar/codegen'd; JSON text parse is not).
    * try_variant_get nulls on a missing path instead of failing.
    */
  def variantFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), expr("parse_json(props)").as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k_num"),
        expr("try_variant_get(v, '$.missing', 'string')").as("missing_str"),
        expr("is_variant_null(try_variant_get(v, '$.k'))").as("k_is_null"))
      .orderBy("event_id")
  val variantFuncsSql: String =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
      |  CAST(NULL AS VARCHAR) AS missing_str,
      |  false AS k_is_null
      |FROM events ORDER BY event_id""".stripMargin

  /** win_tumbling_offset — the batch `window()` function with a
    * non-midnight phase: 1-day tumbling windows that START at 06:00
    * (startTime offset), the ops-day/billing-day convention. Exhibits
    * the streaming window-assignment machinery running in a plain
    * batch group-by; the oracle reproduces the assignment with pure
    * date arithmetic (truncate the shifted time, shift back). One
    * partial-aggregable shuffle on the window key.
    */
  def winTumblingOffset(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 day", "1 day", "6 hours"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("day6_start"),
        col("n"), col("sum_value"))
      .orderBy("day6_start")
  val winTumblingOffsetSql: String =
    s"""SELECT date_trunc('day', ts - INTERVAL 6 HOUR) + INTERVAL 6 HOUR AS day6_start,
       |  count(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY day6_start""".stripMargin

  /** agg_skew_kurtosis — skewness and excess kurtosis from EXACT
    * integer power sums (the C30/C78 determinism pattern extended to
    * 3rd/4th moments): quantity is integral ≤ 50, so Σq..Σq⁴ stay
    * well inside int64 even at 100 TB row counts per group, each sum
    * is cast to double once, and the closed forms run in one fixed
    * IEEE sequence on both engines. The built-in skewness/kurtosis
    * aggregates accumulate doubles in shuffle order (and engines
    * disagree on sample-vs-population correction); this formulation is
    * bit-reproducible and pins population semantics explicitly.
    */
  def aggSkewKurtosis(s: SparkSession, d: String): DataFrame = {
    val q = round(col("l_quantity")).cast("long")
    lineitem(s, d)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("q")).cast("double").as("s1"),
        sum(col("q") * col("q")).cast("double").as("s2"),
        sum(col("q") * col("q") * col("q")).cast("double").as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).cast("double").as("s4"))
      .select(
        col("l_returnflag"), col("n").cast("long").as("n"),
        round((col("s3") / col("n") -
            lit(3d) * (col("s1") / col("n")) * (col("s2") / col("n")) +
            lit(2d) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n"))) /
          pow(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), 1.5), 6)
          .as("skewness"),
        round((col("s4") / col("n") -
            lit(4d) * (col("s1") / col("n")) * (col("s3") / col("n")) +
            lit(6d) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s2") / col("n")) -
            lit(3d) * (col("s1") / col("n")) * (col("s1") / col("n")) *
              (col("s1") / col("n")) * (col("s1") / col("n"))) /
          ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) *
           (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))) - lit(3d), 6)
          .as("kurtosis_excess"))
      .orderBy("l_returnflag")
  }
  val aggSkewKurtosisSql: String =
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round((s3 / n - 3 * (s1 / n) * (s2 / n)
      |        + 2 * (s1 / n) * (s1 / n) * (s1 / n))
      |    / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
      |  round((s4 / n - 4 * (s1 / n) * (s3 / n)
      |        + 6 * (s1 / n) * (s1 / n) * (s2 / n)
      |        - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
      |    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6)
      |    AS kurtosis_excess
      |FROM (
      |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(q) AS DOUBLE) AS s1,
      |    CAST(sum(q * q) AS DOUBLE) AS s2,
      |    CAST(sum(q * q * q) AS DOUBLE) AS s3,
      |    CAST(sum(q * q * q * q) AS DOUBLE) AS s4
      |  FROM (SELECT l_returnflag,
      |          CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem) t
      |  GROUP BY l_returnflag) m
      |ORDER BY l_returnflag""".stripMargin

  /** dedup_sorted_neighborhood — the sorted-neighborhood dedup method
    * beside C80's blocking: ONE global sort by the comparison key
    * (p_name, tie-broken by key), then each record is compared only to
    * its immediate successors via lead() — O(n·w) comparisons instead
    * of O(n²/blocks), no block-size skew. The sort is realized as
    * [[graft.plans.GlobalRank.withGlobalRowNumber]]'s two-pass
    * range-partitioned rank (NOT a global `Window.orderBy`, which
    * executes as a single-partition sort); each record's w=2 successors
    * are then fetched by dense-row-number equi-joins — hash shuffles on
    * a dense long key, balanced by construction, partition-boundary-
    * safe (a successor is found by rank arithmetic, never by physical
    * adjacency). Per-brand census of close neighbors (edit distance
    * ≤ 6).
    */
  def dedupSortedNeighborhood(s: SparkSession, d: String): DataFrame = {
    val keys = Seq(col("p_name").asc, col("p_partkey").asc)
    val ranked = graft.plans.GlobalRank.withGlobalRowNumber(
      part(s, d).select(col("p_partkey"), col("p_brand"), col("p_name")),
      "_rn", keys)
    val nbr = ranked.select(col("_rn").as("_nrn"), col("p_name").as("_nname"))
    ranked
      .join(nbr.select(col("_nrn"), col("_nname").as("next1")),
        col("_nrn") === col("_rn") + 1, "left")
      .drop("_nrn")
      .join(nbr.select(col("_nrn"), col("_nname").as("next2")),
        col("_nrn") === col("_rn") + 2, "left")
      .select(col("p_brand"),
        when(col("next1").isNotNull &&
          levenshtein(col("p_name"), col("next1")) <= 6, 1L).otherwise(0L).as("c1"),
        when(col("next2").isNotNull &&
          levenshtein(col("p_name"), col("next2")) <= 6, 1L).otherwise(0L).as("c2"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("c1") + col("c2")).as("n_close_neighbors"))
      .orderBy("p_brand")
  }
  val dedupSortedNeighborhoodSql: String =
    """WITH s AS (
      |  SELECT p_partkey, p_brand, p_name,
      |    lead(p_name, 1) OVER (ORDER BY p_name ASC, p_partkey ASC) AS next1,
      |    lead(p_name, 2) OVER (ORDER BY p_name ASC, p_partkey ASC) AS next2
      |  FROM part)
      |SELECT p_brand, count(*) AS n_parts,
      |  CAST(sum(
      |    (CASE WHEN next1 IS NOT NULL AND levenshtein(p_name, next1) <= 6
      |          THEN 1 ELSE 0 END) +
      |    (CASE WHEN next2 IS NOT NULL AND levenshtein(p_name, next2) <= 6
      |          THEN 1 ELSE 0 END)) AS BIGINT) AS n_close_neighbors
      |FROM s GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** agg_collect_set_sorted — deterministic SET aggregation: the
    * distinct statuses per priority as a SORTED csv (C25's list twin,
    * with distinctness). collect_set order is engine/partition
    * defined, so the sort-then-join canonicalization is what makes a
    * set-valued column comparable and reproducible; cardinality rides
    * the same pass. Distinct-agg state is bounded by the value domain.
    */
  def aggCollectSetSorted(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy("o_orderpriority")
  val aggCollectSetSortedSql: String =
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      |  count(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** win_percentile_disc — DISCRETE percentiles (the element-selection
    * semantics, vs C23's interpolating `percentile`): the group median
    * is the value at row ⌈n/2⌉ of the (value, id)-sorted group —
    * always an actual data value, never an interpolation, and the
    * unique tie-break makes the selection total-order deterministic.
    * Built from row_number + count over the same window partitioning
    * (one shuffle); engines disagree on built-in percentile_disc
    * interpolation edge rules, construction-by-rank does not.
    */
  def winPercentileDisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value").asc, col("event_id").asc)
    val wc = Window.partitionBy("event_type")
    events(s, d)
      .select(col("event_type"), col("value"), col("event_id"),
        row_number().over(w).as("rn"), count(lit(1)).over(wc).as("n"))
      .filter(expr("rn = (n + 1) div 2")) // div: integer division (/ on longs is double)
      .select(col("event_type"), col("value").as("median_disc"),
        col("n").as("n_rows"))
      .orderBy("event_type")
  }
  val winPercentileDiscSql: String =
    """SELECT event_type, value AS median_disc, n AS n_rows FROM (
      |  SELECT event_type, value, event_id,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value ASC, event_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events) t
      |WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "variant_funcs" -> (variantFuncs _),
    "win_tumbling_offset" -> (winTumblingOffset _),
    "agg_skew_kurtosis" -> (aggSkewKurtosis _),
    "dedup_sorted_neighborhood" -> (dedupSortedNeighborhood _),
    "agg_collect_set_sorted" -> (aggCollectSetSorted _),
    "win_percentile_disc" -> (winPercentileDisc _),
  )

  val oracle: Map[String, String] = Map(
    "variant_funcs" -> variantFuncsSql,
    "win_tumbling_offset" -> winTumblingOffsetSql,
    "agg_skew_kurtosis" -> aggSkewKurtosisSql,
    "dedup_sorted_neighborhood" -> dedupSortedNeighborhoodSql,
    "agg_collect_set_sorted" -> aggCollectSetSortedSql,
    "win_percentile_disc" -> winPercentileDiscSql,
  )
}
