package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Eighty-first wave: RFM customer segmentation, Kendall tau-b trend
  * concordance, and interval max-concurrency sweep.
  */
object Extras81 {

  /** analytics_rfm_segments — the marketing-analytics RFM cube:
    * per-customer recency/frequency/monetary off one orders pass
    * (monetary in EXACT decimal), quartile boundaries by
    * percentile_disc ELEMENT selection on the O(customers) frame,
    * broadcast back as one row; scores are pure comparisons, and the
    * output is the bounded ≤4³ segment grid. Scale: the fact table is
    * touched once; everything after lives on the customer frame.
    */
  def analyticsRfmSegments(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(dec(col("o_totalprice"))).as("mon"))
    val mx = o.agg(max(col("o_orderdate").cast("date")).as("gmax"))
    val c = cust.crossJoin(broadcast(mx))
      .select(col("o_custkey"), datediff(col("gmax"), col("last_d")).as("rec"),
        col("freq"), col("mon"))
    val b = c.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY rec)").as("r1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rec)").as("r2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY rec)").as("r3"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY freq)").as("f1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY freq)").as("f2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY freq)").as("f3"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY mon)").as("m1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY mon)").as("m2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY mon)").as("m3"))
    def score(x: String, q1: String, q2: String, q3: String) =
      (lit(1) + when(col(x) > col(q1), 1).otherwise(0)
        + when(col(x) > col(q2), 1).otherwise(0)
        + when(col(x) > col(q3), 1).otherwise(0))
    c.crossJoin(broadcast(b))
      .select(col("mon"),
        score("rec", "r1", "r2", "r3").as("r_score"),
        score("freq", "f1", "f2", "f3").as("f_score"),
        score("mon", "m1", "m2", "m3").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), dsumx(col("mon")).as("total_mon"))
      .orderBy("r_score", "f_score", "m_score")
  }
  val analyticsRfmSegmentsSql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    date_diff('day', max(CAST(o_orderdate AS DATE)),
      |      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS rec,
      |    count(*) AS freq,
      |    sum(CAST(o_totalprice AS DECIMAL(14,2))) AS mon
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY rec) AS r1,
      |    percentile_disc(0.5)  WITHIN GROUP (ORDER BY rec) AS r2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY rec) AS r3,
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY freq) AS f1,
      |    percentile_disc(0.5)  WITHIN GROUP (ORDER BY freq) AS f2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY freq) AS f3,
      |    percentile_disc(0.25) WITHIN GROUP (ORDER BY mon) AS m1,
      |    percentile_disc(0.5)  WITHIN GROUP (ORDER BY mon) AS m2,
      |    percentile_disc(0.75) WITHIN GROUP (ORDER BY mon) AS m3
      |  FROM c)
      |SELECT
      |  1 + CASE WHEN rec > r1 THEN 1 ELSE 0 END
      |    + CASE WHEN rec > r2 THEN 1 ELSE 0 END
      |    + CASE WHEN rec > r3 THEN 1 ELSE 0 END AS r_score,
      |  1 + CASE WHEN freq > f1 THEN 1 ELSE 0 END
      |    + CASE WHEN freq > f2 THEN 1 ELSE 0 END
      |    + CASE WHEN freq > f3 THEN 1 ELSE 0 END AS f_score,
      |  1 + CASE WHEN mon > m1 THEN 1 ELSE 0 END
      |    + CASE WHEN mon > m2 THEN 1 ELSE 0 END
      |    + CASE WHEN mon > m3 THEN 1 ELSE 0 END AS m_score,
      |  count(*) AS n_customers,
      |  CAST(sum(mon) AS DOUBLE) AS total_mon
      |FROM c, b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** stat_kendall_tau — Kendall tau-b rank concordance between day and
    * daily revenue per event stream (the nonparametric companion to
    * C364's Theil–Sen): daily totals in EXACT decimal so every
    * pairwise comparison is exact, concordant/discordant/tied counted
    * as integers over the calendar²-bounded day-pair self-join (day
    * order filter halves it), one IEEE tau per stream at the end. No
    * ties in x (days are distinct), so tau-b = (C−D)/√(n0·(n0−ty)).
    */
  def statKendallTau(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).as("v"))
    val l = daily.select(col("event_type"), col("day").as("d1"), col("v").as("v1"))
    val r = daily.select(col("event_type"), col("day").as("d2"), col("v").as("v2"))
    l.join(r, Seq("event_type")).filter(col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n0"),
        sum(when(col("v2") > col("v1"), 1L).otherwise(0L)).as("c"),
        sum(when(col("v2") < col("v1"), 1L).otherwise(0L)).as("dd"),
        sum(when(col("v2") === col("v1"), 1L).otherwise(0L)).as("ty"))
      .select(col("event_type"), col("n0"), col("c"), col("dd"), col("ty"),
        round((col("c") - col("dd")).cast("double")
          / sqrt(col("n0").cast("double")
            * (col("n0") - col("ty")).cast("double")), 6).as("tau_b"))
      .orderBy("event_type")
  }
  val statKendallTauSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(14,2))) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT l.event_type,
      |  count(*) AS n0,
      |  CAST(sum(CASE WHEN r.v > l.v THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |  CAST(sum(CASE WHEN r.v < l.v THEN 1 ELSE 0 END) AS BIGINT) AS dd,
      |  CAST(sum(CASE WHEN r.v = l.v THEN 1 ELSE 0 END) AS BIGINT) AS ty,
      |  round((sum(CASE WHEN r.v > l.v THEN 1 ELSE 0 END)
      |       - sum(CASE WHEN r.v < l.v THEN 1 ELSE 0 END))
      |    / sqrt(CAST(count(*) AS DOUBLE) *
      |        CAST(count(*) - sum(CASE WHEN r.v = l.v THEN 1 ELSE 0 END)
      |          AS DOUBLE)), 6) AS tau_b
      |FROM daily l JOIN daily r
      |  ON l.event_type = r.event_type AND l.day < r.day
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** time_max_concurrency — peak concurrent activity per user (the
    * capacity-planning sweep): each event opens a 30-minute interval,
    * boundaries become ±1 deltas, and the classic sweep-line is a
    * user-partitioned cumulative sum ordered (t, delta DESC) — starts
    * sort before ends at the same instant, so touching intervals
    * overlap. Peak time is the EARLIEST instant achieving the max,
    * selected by min over a (−conc, t) struct — no second window, no
    * self-join. State per user is O(its boundaries); the shuffle is one
    * keyed exchange.
    */
  def timeMaxConcurrency(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val bounds = e.select(col("user_id"), col("ts").as("t"), lit(1L).as("delta"))
      .unionAll(e.select(col("user_id"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("conc", sum(col("delta")).over(w))
      .groupBy("user_id")
      .agg(min(struct((-col("conc")).as("nc"), col("t"))).as("pk"))
      .select(col("user_id"), (-col("pk.nc")).as("max_conc"),
        col("pk.t").as("peak_t"))
      .orderBy("user_id")
  }
  val timeMaxConcurrencySql: String =
    """WITH b AS (
      |  SELECT user_id, ts AS t, 1 AS delta FROM events
      |  UNION ALL
      |  SELECT user_id, ts + INTERVAL 30 MINUTE, -1 FROM events),
      |c AS (
      |  SELECT user_id, t,
      |    sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM b)
      |SELECT user_id,
      |  CAST(-(min(struct_pack(nc := -conc, t := t)).nc) AS BIGINT) AS max_conc,
      |  min(struct_pack(nc := -conc, t := t)).t AS peak_t
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "analytics_rfm_segments" -> (analyticsRfmSegments _),
    "stat_kendall_tau" -> (statKendallTau _),
    "time_max_concurrency" -> (timeMaxConcurrency _))

  val oracle: Map[String, String] = Map(
    "analytics_rfm_segments" -> analyticsRfmSegmentsSql,
    "stat_kendall_tau" -> statKendallTauSql,
    "time_max_concurrency" -> timeMaxConcurrencySql)
}
