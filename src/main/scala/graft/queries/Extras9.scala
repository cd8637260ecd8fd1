package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Ninth wave of coverage operators: typed cogroup, piggyback observed
  * metrics, numeric RANGE frames, and tolerance-bounded ASOF joins —
  * each with a DuckDB oracle.
  */
object Extras9 {

  /** typed_cogroup — `KeyValueGroupedDataset.cogroup`: both inputs
    * grouped by the same key, one imperative function per key over the
    * two iterators (the typed API's full-outer "join and fold in one
    * pass" — C54's two-sided sibling). Physically a single CoGroup
    * exchange pair: each side shuffles once on the key, zero joins.
    * The fold here is order-insensitive (counts + exact cent sums), so
    * iterator order — which Spark does not define — cannot leak into
    * results. Oracle = full outer join of the two keyed aggregates.
    */
  def typedCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
      .select(col("o_custkey").as("k"),
        (round(col("o_totalprice") * 100)).cast("long").as("cents"))
      .as[(Long, Long)].groupByKey(_._1)
    val e = events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"),
        (round(col("value") * 100)).cast("long").as("cents"))
      .as[(Long, Long)].groupByKey(_._1)
    o.cogroup(e) { (k, os, es) =>
      var no = 0L; var co = 0L; var ne = 0L; var ce = 0L
      os.foreach { t => no += 1; co += t._2 }
      es.foreach { t => ne += 1; ce += t._2 }
      Iterator((k, no, co / 100.0, ne, ce / 100.0))
    }.toDF("key", "n_orders", "order_revenue", "n_purchases", "purchase_value")
      .orderBy("key")
  }
  val typedCogroupSql: String =
    """WITH o AS (
      |  SELECT o_custkey AS k, count(*) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS order_revenue
      |  FROM orders GROUP BY o_custkey),
      |e AS (
      |  SELECT user_id AS k, count(*) AS n_purchases,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT COALESCE(o.k, e.k) AS key,
      |  COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
      |  COALESCE(order_revenue, 0.0) AS order_revenue,
      |  COALESCE(n_purchases, CAST(0 AS BIGINT)) AS n_purchases,
      |  COALESCE(purchase_value, 0.0) AS purchase_value
      |FROM o FULL OUTER JOIN e ON o.k = e.k
      |ORDER BY key""".stripMargin

  /** observe_metrics — `Dataset.observe` (CollectMetrics): data-quality
    * aggregates accumulated DURING another query's execution — zero
    * extra scan, the metrics ride the main pass as accumulators. The
    * main query here is a simple filtered count; the observation
    * collects row count, exact revenue and null census over EVERYTHING
    * scanned. The observed row is surfaced as the result; the oracle
    * recomputes the same aggregates directly. At 100 TB this is how
    * ingest QA avoids doubling the read.
    */
  def observeMetrics(s: SparkSession, d: String): DataFrame = {
    val observed = orders(s, d).observe("qa",
      count(lit(1)).as("n_scanned"),
      dsum(col("o_totalprice")).as("revenue"),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_status"))
      .filter(col("o_orderstatus") === "O")
      .select(lit(1).as("one"))
    // drive THIS dataset's own queryExecution — metrics live on the
    // execution that actually ran (Dataset.count() would plan a fresh
    // execution whose metrics never populate). RDD-level count keeps
    // the row counting distributed: only the per-partition counts come
    // back to the driver, not the rows themselves.
    val mainCount = observed.queryExecution.toRdd.count()
    val row = observed.queryExecution.observedMetrics("qa")
    import s.implicits._
    Seq((mainCount, row.getAs[Long]("n_scanned"),
      row.getAs[Double]("revenue"), row.getAs[Long]("null_status")))
      .toDF("n_open", "n_scanned", "revenue", "null_status")
  }
  val observeMetricsSql: String =
    s"""SELECT
       |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS n_open,
       |  count(*) AS n_scanned,
       |  ${dsumSql("o_totalprice")} AS revenue,
       |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS null_status
       |FROM orders""".stripMargin

  /** win_range_numeric — RANGE frame over a NUMERIC ordering (C24's
    * interval sibling): for each event, aggregate all same-type events
    * whose value lies within 50 units below its own. RANGE frames are
    * peer-inclusive — every row with equal value joins the frame
    * regardless of physical order — so the result is tie-order free by
    * definition. Frame sums use the exact-decimal pattern; one window
    * shuffle on the 5-value type key.
    */
  def winRangeNumeric(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value").asc)
      .rangeBetween(-50L, Window.currentRow)
    events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        count(lit(1)).over(w).as("n_in_band"),
        sum(dec(col("value"))).over(w).cast("double").as("band_sum"))
      .orderBy("event_id")
  }
  val winRangeNumericSql: String =
    """SELECT event_id, event_type, value,
      |  count(*) OVER w AS n_in_band,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE) AS band_sum
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC
      |             RANGE BETWEEN 50 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** join_asof_tolerance — ASOF with a max-staleness bound (the sensor-
    * fusion contract: a match older than 10 minutes is no match): the
    * backward as-of pairing composed with a tolerance predicate that
    * NULLs out stale matches while keeping the left row. Same
    * single-window shape as B11 — the tolerance is a row-local
    * post-filter, no extra shuffle. The oracle nulls the same pairs.
    */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("v_user"),
        col("ts").as("vts"))
    val w = Window.partitionBy("pid")
      .orderBy(col("vts").desc, col("vid").desc)
    val paired = p.join(v,
        col("user_id") === col("v_user") && col("vts") <= col("pts"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val fresh = col("vts") >= col("pts") - expr("INTERVAL 10 MINUTES")
    paired.select(col("pid"), col("user_id"), col("pts"),
        when(fresh, col("vid")).as("recent_view_id"),
        when(fresh, col("vts")).as("recent_view_ts"))
      .orderBy("pid")
  }
  val joinAsofToleranceSql: String =
    """SELECT pid, user_id, pts,
      |  CASE WHEN vts >= pts - INTERVAL 10 MINUTE THEN vid END AS recent_view_id,
      |  CASE WHEN vts >= pts - INTERVAL 10 MINUTE THEN vts END AS recent_view_ts
      |FROM (
      |  SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
      |    v.event_id AS vid, v.ts AS vts,
      |    row_number() OVER (PARTITION BY p.event_id
      |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |    ON p.user_id = v.user_id AND v.ts <= p.ts) t
      |WHERE rn = 1
      |ORDER BY pid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_cogroup" -> (typedCogroup _),
    "observe_metrics" -> (observeMetrics _),
    "win_range_numeric" -> (winRangeNumeric _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
  )

  val oracle: Map[String, String] = Map(
    "typed_cogroup" -> typedCogroupSql,
    "observe_metrics" -> observeMetricsSql,
    "win_range_numeric" -> winRangeNumericSql,
    "join_asof_tolerance" -> joinAsofToleranceSql,
  )
}
