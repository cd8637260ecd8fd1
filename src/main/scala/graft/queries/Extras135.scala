package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 35 (C544–C547): time-weighted averaging, contrastive pair
  * sampling, gap-limited forward fill, and the Hampel outlier filter.
  */
object Extras135 {

  /** C544 time_weighted_average — TWA of the event value per stream
    * (the correct mean for IRREGULARLY sampled series — plain AVG
    * overweights bursts): each event's value is weighted by its
    * holding duration (microseconds to the next event, exact BIGINT
    * from epoch-micros), the last event carries no interval. Σv·Δt
    * runs in DECIMAL(38,0); ONE IEEE division per stream. The lead
    * window partitions on event_type.
    */
  def timeWeightedAverage(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"),
        // ts is TIMESTAMP_NTZ; session TZ is pinned UTC, so the cast is
        // the identity on the wall-clock value and matches epoch_us
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
      // event_id tie-break: duplicate timestamps within a stream would
      // otherwise make the dt→value assignment order-dependent (a
      // legal Spark/DuckDB divergence even though Σdt is tie-invariant)
      .withColumn("dt", lead(col("us"), 1).over(
        Window.partitionBy("event_type").orderBy("us", "event_id")) - col("us"))
      .filter(col("dt").isNotNull)
    ev.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_intervals"),
        sum(col("dt")).cast("long").as("span_us"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * dt")).as("svdt"),
        sum(col("c")).cast("long").as("sv"))
      .selectExpr("event_type", "n_intervals",
        "round(CAST(span_us AS DOUBLE) / 1e6 / 86400, 6) AS span_days",
        """round(CAST(svdt AS DOUBLE) / CAST(span_us AS DOUBLE) / 100, 6)
          |  AS time_weighted_avg""".stripMargin,
        "round(CAST(sv AS DOUBLE) / n_intervals / 100, 6) AS plain_avg")
      .orderBy("event_type")
  }
  val timeWeightedAverageSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |iv AS (
      |  SELECT event_type, c,
      |    lead(us, 1) OVER (PARTITION BY event_type ORDER BY us, event_id)
      |      - us AS dt
      |  FROM ev)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
      |  round(CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) / 1e6 / 86400, 6)
      |    AS span_days,
      |  round(CAST(CAST(sum(CAST(c AS DECIMAL(38,0)) * dt) AS DECIMAL(38,0))
      |      AS DOUBLE)
      |    / CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE) / 100, 6)
      |    AS time_weighted_avg,
      |  round(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / count(*) / 100, 6)
      |    AS plain_avg
      |FROM iv WHERE dt IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** C545 sample_contrastive_pairs — contrastive-training pair
    * construction over the embedding corpus: each anchor gets ONE
    * positive (the next vec_id inside its label partition — a
    * label-partitioned lead window, parallel at any scale) and ONE
    * candidate negative (its vec_id^1 "buddy" — an equi self-join on
    * a computed key, no windows over the corpus), kept only when the
    * buddy's label differs. Emits the pair list plus kind; fully
    * deterministic, no RNG.
    */
  def sampleContrastivePairs(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("label"))
    val pos = e
      .withColumn("pair_id", lead(col("vec_id"), 1).over(
        Window.partitionBy("label").orderBy("vec_id")))
      .filter(col("pair_id").isNotNull)
      .select(col("vec_id").as("anchor_id"), col("pair_id"),
        col("label").as("anchor_label"), col("label").as("pair_label"),
        lit("pos").as("kind"))
    val buddies = e.select(col("vec_id").as("pair_id"),
      col("label").as("pair_label"))
    val neg = e
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        expr("CAST(vec_id ^ 1 AS BIGINT)").as("pair_id"))
      .join(buddies, "pair_id")
      .filter(col("pair_label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("pair_id"), col("anchor_label"),
        col("pair_label"), lit("neg").as("kind"))
    pos.unionByName(neg).orderBy("anchor_id", "kind", "pair_id")
  }
  val sampleContrastivePairsSql: String =
    """WITH e AS (SELECT vec_id, label FROM embeddings),
      |pos AS (
      |  SELECT vec_id AS anchor_id,
      |    lead(vec_id, 1) OVER (PARTITION BY label ORDER BY vec_id) AS pair_id,
      |    label AS anchor_label, label AS pair_label, 'pos' AS kind
      |  FROM e),
      |neg AS (
      |  SELECT a.vec_id AS anchor_id, b.vec_id AS pair_id,
      |    a.label AS anchor_label, b.label AS pair_label, 'neg' AS kind
      |  FROM e a JOIN e b ON xor(a.vec_id, 1) = b.vec_id
      |  WHERE a.label <> b.label)
      |SELECT anchor_id, pair_id, anchor_label, pair_label, kind
      |FROM (SELECT * FROM pos WHERE pair_id IS NOT NULL
      |      UNION ALL SELECT * FROM neg) t
      |ORDER BY anchor_id, kind, pair_id""".stripMargin

  /** C546 time_locf_gap_limit — gap-limited forward fill (LOCF) of
    * the per-stream daily value series: the day spine comes from a
    * per-stream sequence explode (never a corpus join), the carried
    * value and its source day ride ONE IGNORE-NULLS window pair, and
    * a fill only stands when the gap to the last observation is ≤ 7
    * days — the sensor-data convention that distinguishes "recently
    * stale" from "dead". Reports the census per stream plus the exact
    * filled-cents checksum.
    */
  def timeLocfGapLimit(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val spine = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("lv", last(col("c"), ignoreNulls = true).over(w))
      .withColumn("ld", last(when(col("c").isNotNull, col("day")), ignoreNulls = true).over(w))
      .withColumn("gap", datediff(col("day"), col("ld")))
      .withColumn("fill",
        when(col("c").isNotNull, col("c"))
          .when(col("gap") <= 7, col("lv")))
    filled.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).cast("long").as("n_observed"),
        sum(when(col("c").isNull && col("fill").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_filled"),
        sum(when(col("fill").isNull, 1L).otherwise(0L)).cast("long").as("n_unfillable"),
        sum(when(col("c").isNull, col("fill")).otherwise(0L)).cast("long")
          .as("filled_cents"))
      .orderBy("event_type")
  }
  val timeLocfGapLimitSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type,
      |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1) g),
      |joined AS (
      |  SELECT s.event_type, s.day, daily.c FROM spine s
      |  LEFT JOIN daily ON s.event_type = daily.event_type
      |    AND s.day = daily.day),
      |f AS (
      |  SELECT event_type, day, c,
      |    last_value(c IGNORE NULLS) OVER w AS lv,
      |    last_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER w AS ld
      |  FROM joined
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |filled AS (
      |  SELECT event_type, c,
      |    CASE WHEN c IS NOT NULL THEN c
      |      WHEN day - ld <= 7 THEN lv END AS fill
      |  FROM f)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_observed,
      |  CAST(sum(CASE WHEN c IS NULL AND fill IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_filled,
      |  CAST(sum(CASE WHEN fill IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unfillable,
      |  CAST(sum(CASE WHEN c IS NULL THEN coalesce(fill, 0) ELSE 0 END)
      |    AS BIGINT) AS filled_cents
      |FROM filled GROUP BY event_type ORDER BY event_type""".stripMargin

  /** C547 win_hampel_filter — Hampel robust outlier detection on
    * daily revenue: each day compares against the median and MAD of
    * its ±5-day neighborhood. The neighborhood is materialized by the
    * C173 banded-join pattern (band = t div 5, each row probes 3
    * bands — an EQUI join, never a range nested loop); median and MAD
    * are rank-selected lower medians (exact integers). The outlier
    * test |c−med|·10000 > 44478·mad (3·1.4826 scaled) is EXACT
    * integer arithmetic; the reported deviation is the only IEEE op.
    */
  def winHampelFilter(s: SparkSession, d: String): DataFrame = {
    val daily = lineitem(s, d)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
    val probes = daily.select(col("t").as("t1"), col("day"), col("c").as("c1"),
        explode(expr("array(t div 5 - 1, t div 5, t div 5 + 1)")).as("band"))
    val cands = daily.select(expr("t div 5").as("band"), col("t").as("t2"),
      col("c").as("c2"))
    // each (t1,t2) pair matches in exactly one band (the 3 probe bands
    // are distinct and t2 carries one) — no dedup needed
    val hood = probes.join(cands, "band")
      .filter(expr("abs(t2 - t1) <= 5"))
      .select(col("t1"), col("day"), col("c1"), col("t2"), col("c2"))
    val med = hood
      .withColumn("rn", row_number().over(
        Window.partitionBy("t1").orderBy("c2", "t2")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("t1")))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("t1"), col("c2").as("med"))
    val mad = hood.join(med, "t1")
      .withColumn("ad", abs(col("c2") - col("med")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("t1").orderBy("ad", "t2")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("t1")))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("t1"), col("med"), col("ad").as("mad"))
    daily.join(mad, col("t") === col("t1"))
      .filter(expr("abs(c - med) * 10000 > 44478 * mad AND mad > 0"))
      .selectExpr("day", "round(CAST(c AS DOUBLE) / 100, 6) AS revenue",
        "round(CAST(med AS DOUBLE) / 100, 6) AS window_median",
        """round(CAST(abs(c - med) AS DOUBLE) / (1.4826 * mad), 6)
          |  AS deviation_sigmas""".stripMargin)
      .orderBy("day")
  }
  val winHampelFilterSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |hood AS (
      |  SELECT a.t AS t1, a.day, a.c AS c1, b.t AS t2, b.c AS c2
      |  FROM td a JOIN td b ON abs(b.t - a.t) <= 5),
      |med AS (
      |  SELECT t1, c2 AS med FROM (
      |    SELECT t1, c2,
      |      row_number() OVER (PARTITION BY t1 ORDER BY c2, t2) AS rn,
      |      count(*) OVER (PARTITION BY t1) AS cnt
      |    FROM hood) x
      |  WHERE rn = (cnt + 1) // 2),
      |mad AS (
      |  SELECT t1, med, ad AS mad FROM (
      |    SELECT h.t1, med, abs(c2 - med) AS ad,
      |      row_number() OVER (PARTITION BY h.t1 ORDER BY abs(c2 - med), t2)
      |        AS rn,
      |      count(*) OVER (PARTITION BY h.t1) AS cnt
      |    FROM hood h JOIN med ON h.t1 = med.t1) x
      |  WHERE rn = (cnt + 1) // 2)
      |SELECT day, round(CAST(c AS DOUBLE) / 100, 6) AS revenue,
      |  round(CAST(med AS DOUBLE) / 100, 6) AS window_median,
      |  round(CAST(abs(c - med) AS DOUBLE) / (1.4826 * mad), 6)
      |    AS deviation_sigmas
      |FROM td JOIN mad ON td.t = mad.t1
      |WHERE abs(c - med) * 10000 > 44478 * mad AND mad > 0
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_weighted_average" -> (timeWeightedAverage _),
    "sample_contrastive_pairs" -> (sampleContrastivePairs _),
    "time_locf_gap_limit" -> (timeLocfGapLimit _),
    "win_hampel_filter" -> (winHampelFilter _),
  )

  val oracle: Map[String, String] = Map(
    "time_weighted_average" -> timeWeightedAverageSql,
    "sample_contrastive_pairs" -> sampleContrastivePairsSql,
    "time_locf_gap_limit" -> timeLocfGapLimitSql,
    "win_hampel_filter" -> winHampelFilterSql,
  )
}
