package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** 110th wave — overdispersion testing for event counts (is user
  * activity Poisson or bursty?) and the RFM segment MIGRATION matrix
  * (which customers moved between value segments across the cutoff —
  * the longitudinal counterpart of the static RFM segmentation).
  */
object Extras110 {

  /** stat_poisson_dispersion — the variance-to-mean ratio (index of
    * dispersion) of per-user-day event counts: VMR ≈ 1 ⇒ Poisson
    * arrivals, VMR > 1 ⇒ bursty/overdispersed — the standard first
    * question about an activity stream. Exact formulation: with
    * n cells, Σc and Σc² as exact longs, population
    * VMR = (n·Σc² − (Σc)²) / (n·Σc) — ONE division of exact integers
    * (the C438/C439 discipline: no float summation anywhere). Counts
    * are over OBSERVED (user, day) cells — zero cells carry no
    * evidence about burstiness within active days and would make the
    * metric corpus-span-dependent. Scale: one count aggregation + one
    * O(1)-state moment pass, map-side combinable.
    */
  def statPoissonDispersion(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
    cells.agg(
        count(lit(1)).as("n_cells"),
        sum(col("c")).as("sum_events"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("n_cells"), col("sum_events"),
        round((col("n_cells") * col("sc2")
            - col("sum_events") * col("sum_events")).cast("double")
          / (col("n_cells") * col("sum_events")).cast("double"), 6)
          .as("vmr"))
  }
  val statPoissonDispersionSql: String =
    """WITH cells AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |    CAST(sum(c) AS BIGINT) AS sum_events,
      |    CAST(sum(c * c) AS BIGINT) AS sc2
      |  FROM cells)
      |SELECT n_cells, sum_events,
      |  round(CAST(n_cells * sc2 - sum_events * sum_events AS DOUBLE)
      |    / CAST(n_cells * sum_events AS DOUBLE), 6) AS vmr
      |FROM m""".stripMargin

  /** Period cutoff and absolute bucket edges for
    * [[analyticsRfmMigration]] — absolute (not quantile) edges keep
    * the segmentation corpus-size-independent and exactly mirrored.
    */
  val RfmCutoff = "1998-01-01"         // mid-span of the 1995–2001 dates
  val RfmFreqEdges = (3L, 5L)          // orders: <3 low, <5 mid, else high
  val RfmSpendEdgesCents = (50000000L, 100000000L) // cents: 500k, 1M

  /** analytics_rfm_migration — the customer-value TRANSITION MATRIX:
    * segment every customer by (order frequency × total spend) in the
    * pre-/post-RfmCutoff (1998-01-01) periods, then count every (from, to)
    * movement, with customers absent from a period entering as 'new'
    * or leaving as 'churned'. Spend sums use the exact-decimal cents
    * path (the C441 cast lesson); segments are absolute-edge labels so
    * both engines bucket identically; the matrix is a full-outer join
    * of two per-period aggregates — two corpus passes + one
    * customer-keyed join, no windows, map-side combinable throughout.
    */
  def analyticsRfmMigration(s: SparkSession, d: String): DataFrame = {
    val (f1, f2) = RfmFreqEdges
    val (m1, m2) = RfmSpendEdgesCents
    def period(post: Boolean, segName: String): DataFrame =
      orders(s, d)
        .filter(if (post) col("o_orderdate") >= lit(RfmCutoff).cast("date")
                else col("o_orderdate") < lit(RfmCutoff).cast("date"))
        .groupBy(col("o_custkey").as("cust"))
        .agg(count(lit(1)).as("f"),
          sum((col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("long")).as("cents"))
        .select(col("cust"), concat(
          when(col("f") < f1, "F0").when(col("f") < f2, "F1").otherwise("F2"),
          when(col("cents") < m1, "M0").when(col("cents") < m2, "M1")
            .otherwise("M2")).as(segName))
    period(post = false, "seg_a")
      .join(period(post = true, "seg_b"), Seq("cust"), "full_outer")
      .select(coalesce(col("seg_a"), lit("new")).as("seg_from"),
        coalesce(col("seg_b"), lit("churned")).as("seg_to"))
      .groupBy("seg_from", "seg_to")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("seg_from", "seg_to")
  }
  val analyticsRfmMigrationSql: String = {
    val (f1, f2) = RfmFreqEdges
    val (m1, m2) = RfmSpendEdgesCents
    def period(cond: String) =
      s"""SELECT o_custkey AS cust,
         |    concat(CASE WHEN count(*) < $f1 THEN 'F0'
         |                WHEN count(*) < $f2 THEN 'F1' ELSE 'F2' END,
         |           CASE WHEN sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
         |                    * 100 AS BIGINT)) < $m1 THEN 'M0'
         |                WHEN sum(CAST(CAST(o_totalprice AS DECIMAL(14,2))
         |                    * 100 AS BIGINT)) < $m2 THEN 'M1'
         |                ELSE 'M2' END) AS seg
         |  FROM orders WHERE $cond GROUP BY 1""".stripMargin
    s"""WITH pa AS (
       |  ${period(s"o_orderdate < DATE '$RfmCutoff'")}),
       |pb AS (
       |  ${period(s"o_orderdate >= DATE '$RfmCutoff'")})
       |SELECT coalesce(pa.seg, 'new') AS seg_from,
       |  coalesce(pb.seg, 'churned') AS seg_to,
       |  CAST(count(*) AS BIGINT) AS n_customers
       |FROM pa FULL OUTER JOIN pb ON pb.cust = pa.cust
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_poisson_dispersion" -> (statPoissonDispersion _),
    "analytics_rfm_migration" -> (analyticsRfmMigration _))

  val oracle: Map[String, String] = Map(
    "stat_poisson_dispersion" -> statPoissonDispersionSql,
    "analytics_rfm_migration" -> analyticsRfmMigrationSql)
}
