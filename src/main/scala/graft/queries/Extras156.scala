package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 56 (C628–C631): Page's trend test, PPS systematic sampling,
  * count(*) metadata pushdown exhibit, pivot-point census.
  */
object Extras156 {

  /** C628 stat_page_trend_l — Page's L test for an ordered trend in
    * repeated measures (blocks = ship years, treatments = quarters):
    * quarterly revenue ranks WITHIN each year run over the bounded
    * year×quarter frame (28 cells — rank by exact cents, quarter
    * tie-break), L = Σ q·R_q exact integers, z from the closed-form
    * moments E = bk(k+1)²/4, Var = b·k²(k+1)(k²−1)/144.
    */
  def statPageTrendL(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
    val wr = Window.partitionBy("y").orderBy(col("c").asc, col("q").asc)
    val ranked = cells.withColumn("r", rank().over(wr).cast("long"))
    ranked.agg(countDistinct(col("y")).cast("long").as("b"),
        countDistinct(col("q")).cast("long").as("k"),
        sum(expr("q * r")).cast("long").as("l"))
      .selectExpr("b", "k", "l",
        """round((CAST(l AS DOUBLE) - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
          |/ sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k * k - 1) / 144), 4)
          |  AS z_stat""".stripMargin,
        """abs((CAST(l AS DOUBLE) - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
          |/ sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k * k - 1) / 144)) > 1.96
          |  AS reject_no_trend""".stripMargin)
  }
  val statPageTrendLSql: String =
    """WITH cells AS (
      |  SELECT EXTRACT(year FROM l_shipdate) AS y,
      |    EXTRACT(quarter FROM l_shipdate) AS q,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT y, q, CAST(rank() OVER (PARTITION BY y ORDER BY c, q) AS BIGINT) AS r
      |  FROM cells),
      |m AS (
      |  SELECT CAST(count(DISTINCT y) AS BIGINT) AS b,
      |    CAST(count(DISTINCT q) AS BIGINT) AS k,
      |    CAST(sum(q * r) AS BIGINT) AS l
      |  FROM ranked)
      |SELECT b, k, l,
      |  round((CAST(l AS DOUBLE) - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
      |    / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k * k - 1) / 144), 4) AS z_stat,
      |  abs((CAST(l AS DOUBLE) - CAST(b AS DOUBLE) * k * (k + 1) * (k + 1) / 4)
      |    / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1) * (k * k - 1) / 144)) > 1.96
      |    AS reject_no_trend
      |FROM m""".stripMargin

  /** C629 sample_pps_systematic — systematic probability-proportional-
    * to-size sampling of parts by revenue weight (the classic survey /
    * data-mixture design): cumulative weights via GlobalRank's two-
    * pass exclusive prefix sum in partkey order, an item's hit count
    * is (cum_incl·m) div W − (cum_excl·m) div W — EXACT cross-
    * multiplied integers, no step float anywhere — so Σhits = m
    * identically (the design's defining invariant, spec-asserted).
    * Census: selected items, multi-hit (certainty) items, weight share.
    */
  def samplePpsSystematic(s: SparkSession, d: String): DataFrame = {
    val m = 100L
    val rev = lineitem(s, d).groupBy("l_partkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("rc"))
    val tot = rev.agg(sum(col("rc")).cast("decimal(38,0)").as("w"))
    val pre = graft.plans.GlobalRank.withExclusivePrefixSum(
      rev, "before", col("rc"), Seq(col("l_partkey").asc))
    val hits = pre.crossJoin(broadcast(tot))
      .withColumn("h", expr(
        s"CAST((CAST(before + rc AS DECIMAL(38,0)) * $m) div w AS BIGINT)" +
        s" - CAST((CAST(before AS DECIMAL(38,0)) * $m) div w AS BIGINT)"))
    hits.agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("h")).cast("long").as("total_hits"),
        sum(expr("CASE WHEN h > 0 THEN 1L ELSE 0L END")).cast("long").as("n_selected"),
        sum(expr("CASE WHEN h > 1 THEN 1L ELSE 0L END")).cast("long").as("n_certainty"),
        sum(expr("CASE WHEN h > 0 THEN rc ELSE 0L END")).cast("long").as("sel_w"),
        max(col("w")).as("w"))
      .selectExpr("n_items", "total_hits", "n_selected", "n_certainty",
        "round(CAST(sel_w AS DOUBLE) / CAST(w AS DOUBLE), 6) AS selected_weight_share")
  }
  val samplePpsSystematicSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS rc
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(rc) AS DECIMAL(38,0)) AS w FROM rev),
      |pre AS (
      |  SELECT l_partkey, rc,
      |    coalesce(sum(rc) OVER (ORDER BY l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |  FROM rev),
      |hits AS (
      |  SELECT rc,
      |    CAST(CAST(before + rc AS DECIMAL(38,0)) * 100 AS HUGEINT) // CAST(w AS HUGEINT)
      |      - CAST(CAST(before AS DECIMAL(38,0)) * 100 AS HUGEINT) // CAST(w AS HUGEINT)
      |      AS h,
      |    w
      |  FROM pre, tot)
      |SELECT CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(h) AS BIGINT) AS total_hits,
      |  CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
      |  CAST(sum(CASE WHEN h > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_certainty,
      |  round(CAST(sum(CASE WHEN h > 0 THEN rc ELSE 0 END) AS DOUBLE)
      |    / CAST(max(w) AS DOUBLE), 6) AS selected_weight_share
      |FROM hits""".stripMargin

  /** C630 scan_count_star_pushdown — the metadata-only scan exhibit:
    * count(*) over three tables with NO data columns read (the plan's
    * parquet scan shows ReadSchema: struct<> — row counts come from
    * footer metadata; the spec asserts the empty read schema). The
    * 100 TB story: a count over a petabyte table does no column IO.
    */
  def scanCountStarPushdown(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).agg(count(lit(1)).cast("long").as("n_rows"))
      .selectExpr("'lineitem' AS tbl", "n_rows")
    val o = orders(s, d).agg(count(lit(1)).cast("long").as("n_rows"))
      .selectExpr("'orders' AS tbl", "n_rows")
    val c = customer(s, d).agg(count(lit(1)).cast("long").as("n_rows"))
      .selectExpr("'customer' AS tbl", "n_rows")
    l.unionAll(o).unionAll(c).orderBy("tbl")
  }
  val scanCountStarPushdownSql: String =
    """SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows FROM customer
      |UNION ALL
      |SELECT 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
      |UNION ALL
      |SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
      |ORDER BY tbl""".stripMargin

  /** C631 win_pivot_points — floor-trader pivots on daily OHLC: P =
    * (H+L+C)/3 from the PREVIOUS day (one lag over the bounded daily
    * frame), all comparisons CROSS-MULTIPLIED (3·close vs H+L+C,
    * 3·close vs 2(H+L+C)−3L for R1, vs 2(H+L+C)−3H for S1) so the
    * census is exact integers; the mean |close−P| is the single final
    * division (of an exact Σ|3c−s| by 3n).
    */
  def winPivotPoints(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .groupBy("day")
      .agg(max(col("p")).as("h"), min(col("p")).as("l"),
        max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"))
      .selectExpr("day", "h", "l", "lo.p AS c")
    val w = Window.orderBy("day")
    bars
      .withColumn("s", lag(expr("h + l + c"), 1).over(w))
      .withColumn("pl", lag(col("l"), 1).over(w))
      .withColumn("ph", lag(col("h"), 1).over(w))
      .filter(col("s").isNotNull)
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CASE WHEN 3 * c > s THEN 1L ELSE 0L END")).cast("long").as("n_above_pivot"),
        sum(expr("CASE WHEN 3 * c < s THEN 1L ELSE 0L END")).cast("long").as("n_below_pivot"),
        sum(expr("CASE WHEN 3 * c > 2 * s - 3 * pl THEN 1L ELSE 0L END")).cast("long").as("n_above_r1"),
        sum(expr("CASE WHEN 3 * c < 2 * s - 3 * ph THEN 1L ELSE 0L END")).cast("long").as("n_below_s1"),
        sum(expr("abs(3 * c - s)")).cast("long").as("sad"))
      .selectExpr("n_days", "n_above_pivot", "n_below_pivot", "n_above_r1",
        "n_below_s1",
        "round(CAST(sad AS DOUBLE) / (3 * n_days) / 100, 4) AS mean_abs_dev")
  }
  val winPivotPointsSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p
      |  FROM lineitem),
      |bars AS (
      |  SELECT day, max(p) AS h, min(p) AS l,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c
      |  FROM px GROUP BY day),
      |lagged AS (
      |  SELECT day, c,
      |    lag(h + l + c, 1) OVER (ORDER BY day) AS s,
      |    lag(l, 1) OVER (ORDER BY day) AS pl,
      |    lag(h, 1) OVER (ORDER BY day) AS ph
      |  FROM bars QUALIFY s IS NOT NULL)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN 3 * c > s THEN 1 ELSE 0 END) AS BIGINT) AS n_above_pivot,
      |  CAST(sum(CASE WHEN 3 * c < s THEN 1 ELSE 0 END) AS BIGINT) AS n_below_pivot,
      |  CAST(sum(CASE WHEN 3 * c > 2 * s - 3 * pl THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above_r1,
      |  CAST(sum(CASE WHEN 3 * c < 2 * s - 3 * ph THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below_s1,
      |  round(CAST(CAST(sum(abs(3 * c - s)) AS BIGINT) AS DOUBLE)
      |    / (3 * count(*)) / 100, 4) AS mean_abs_dev
      |FROM lagged""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_page_trend_l" -> (statPageTrendL _),
    "sample_pps_systematic" -> (samplePpsSystematic _),
    "scan_count_star_pushdown" -> (scanCountStarPushdown _),
    "win_pivot_points" -> (winPivotPoints _),
  )

  val oracle: Map[String, String] = Map(
    "stat_page_trend_l" -> statPageTrendLSql,
    "sample_pps_systematic" -> samplePpsSystematicSql,
    "scan_count_star_pushdown" -> scanCountStarPushdownSql,
    "win_pivot_points" -> winPivotPointsSql,
  )
}
