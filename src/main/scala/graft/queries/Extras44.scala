package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Forty-fourth wave: the OC4 chlorophyll product, sliding medians,
  * the second string battery, depth-profile binning, and typed
  * mapValues.
  */
object Extras44 {

  /** ref_chlor_a_oc4 — the reference domain's FLAGSHIP derived
    * product: OC4-style band-ratio chlorophyll. The maximum band
    * ratio R = log10(max(Rrs443, Rrs490, Rrs510) / Rrs555) feeds a
    * 4th-order polynomial and chl = 10^poly(R) — the algorithm every
    * ocean-color service applies to its radiometry (coefficients here
    * are the published OC4v4 values; bands derive from the C219
    * rule). Per-row libm (log10/pow) guarded by round(,6); the
    * polynomial evaluates in one fixed Horner order on both engines.
    */
  def refChlorAOc4(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice")
    val r443 = price * 0.443
    val r490 = price * 0.490
    val r510 = price * 0.510
    val r555 = price * 0.555
    val ratio = greatest(r443, r490, r510) / r555
    val r = log(10.0, ratio)
    // OC4v4: 0.366 - 3.067R + 1.930R² + 0.649R³ - 1.532R⁴ (Horner)
    val poly = lit(0.366) + col("r") * (lit(-3.067) + col("r") *
      (lit(1.930) + col("r") * (lit(0.649) + col("r") * lit(-1.532))))
    orders(s, d).filter(col("o_orderkey") % 8 === 0)
      .select(col("o_orderkey"), r.as("r"))
      .select(col("o_orderkey"), round(col("r"), 6).as("band_ratio"),
        round(pow(lit(10.0), poly), 6).as("chlor_a"))
      .orderBy("o_orderkey")
  }
  val refChlorAOc4Sql: String =
    """WITH g AS (
      |  SELECT o_orderkey,
      |    log10(greatest(o_totalprice * 0.443, o_totalprice * 0.490,
      |                   o_totalprice * 0.510) / (o_totalprice * 0.555)) AS r
      |  FROM orders WHERE o_orderkey % 8 = 0)
      |SELECT o_orderkey, round(r, 6) AS band_ratio,
      |  round(pow(10.0, 0.366 + r * (-3.067 + r * (1.930 + r * (0.649 + r * (-1.532)))))
      |    , 6) AS chlor_a
      |FROM g ORDER BY o_orderkey""".stripMargin

  /** win_median_sliding — MEDIAN over a trailing 5-row frame: the
    * robust smoother (outlier-immune, unlike the sliding mean B22) a
    * QC pipeline runs over sensor series. Spark REFUSES `median` with
    * a window frame (unsupported-frame aggregate), so the exact form
    * composes: collect the frame, sort it, take the middle element
    * (odd n) or the exact midpoint (even n — (a+b)/2 of 2-decimal
    * doubles is exact: small exact sum, power-of-two divide). The
    * oracle mirrors the composed frame-sort form (DuckDB's native
    * windowed median interpolates differently on the even-sized
    * frames at partition starts — measured 2/1176 cells); frame
    * ordering is pinned total (the C233 lesson).
    */
  def winMedianSliding(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(-4, 0)
    lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"),
        array_sort(collect_list(col("l_quantity")).over(w)).as("frame"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"),
        ((element_at(col("frame"), expr("CAST((size(frame) + 1) div 2 AS INT)")) +
          element_at(col("frame"), expr("CAST(size(frame) div 2 + 1 AS INT)"))) / 2)
          .as("med_qty_5"))
      // full-duplicate rows (same key, flag AND quantity) carry
      // DIFFERENT frame medians at adjacent positions — the median
      // itself must join the output order to make it total
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "med_qty_5")
  }
  val winMedianSlidingSql: String =
    """WITH f AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |    list_sort(list(l_quantity) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_orderkey, l_linenumber, l_quantity
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS frame
      |  FROM lineitem WHERE l_orderkey % 50 = 0)
      |SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |  (frame[(len(frame) + 1) // 2] + frame[len(frame) // 2 + 1]) / 2 AS med_qty_5
      |FROM f
      |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, med_qty_5""".stripMargin

  /** str_funcs2 — the second string battery (B31 covered the core):
    * levenshtein distance (the built-in behind fuzzy matching),
    * translate (character remapping), repeat / reverse, and
    * lpad/rpad fixed-width formatting — all codegen'd built-ins
    * riding the scan.
    */
  def strFuncs2(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), col("c_mktsegment")).cast("bigint").as("lev_name_seg"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lower_vowels"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
        repeat(lit("-"), (col("c_custkey") % 5 + 1).cast("int")).as("bars"))
      .orderBy("c_custkey")
  val strFuncs2Sql: String =
    """SELECT c_custkey,
      |  CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev_name_seg,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
      |  reverse(c_mktsegment) AS seg_rev,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
      |  rpad(c_mktsegment, 12, '.') AS seg_rpad,
      |  repeat('-', CAST(c_custkey % 5 + 1 AS INT)) AS bars
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** ref_depth_bin_profile — in-situ PROFILE BINNING: irregular-depth
    * measurements snap to standard 10 m depth levels (the reference's
    * water-depth axis) and aggregate per (station, level). The
    * nearest-level snap runs in integer CENTIMETER arithmetic
    * ((depth_cm + 500) div 1000 — no float rounding at the .5
    * boundaries, which genuinely occur on 2-decimal depths), and the
    * per-level mean uses the exact-decimal average. One keyed
    * aggregation — the profile never materializes per station.
    */
  def refDepthBinProfile(s: SparkSession, d: String): DataFrame =
    events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id").as("station_id"),
        (col("value") % 200.0).as("depth_m"), col("value"))
      .withColumn("depth_cm", (col("depth_m") * 100).cast("bigint"))
      .withColumn("level_m", expr("((depth_cm + 500) div 1000) * 10"))
      .groupBy("station_id", "level_m")
      .agg(count(lit(1)).as("n_obs"), davg(col("value")).as("mean_value"))
      .orderBy("station_id", "level_m")
  val refDepthBinProfileSql: String =
    s"""WITH p AS (
       |  SELECT user_id AS station_id,
       |    CAST((value % 200.0) * 100 AS BIGINT) AS depth_cm, value
       |  FROM events WHERE event_type = 'purchase')
       |SELECT station_id, ((depth_cm + 500) // 1000) * 10 AS level_m,
       |  count(*) AS n_obs, ${davgSql("value")} AS mean_value
       |FROM p GROUP BY station_id, level_m
       |ORDER BY station_id, level_m""".stripMargin

  /** typed_mapvalues_reduce — `KeyValueGroupedDataset.mapValues`
    * before the associative reduce: the value projection happens once
    * per input row BEFORE partial aggregation (cents extraction here),
    * so the reduce merges pre-shaped values map-side — the typed
    * counterpart of pushing a projection below an aggregate.
    */
  def typedMapvaluesReduce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(r => Math.round(r._2 * 100))
      .reduceGroups((a, b) => a + b)
      .toDF("o_orderpriority", "revenue_cents")
      .orderBy("o_orderpriority")
  }
  val typedMapvaluesReduceSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_chlor_a_oc4" -> (refChlorAOc4 _),
    "win_median_sliding" -> (winMedianSliding _),
    "str_funcs2" -> (strFuncs2 _),
    "ref_depth_bin_profile" -> (refDepthBinProfile _),
    "typed_mapvalues_reduce" -> (typedMapvaluesReduce _))

  val oracle: Map[String, String] = Map(
    "ref_chlor_a_oc4" -> refChlorAOc4Sql,
    "win_median_sliding" -> winMedianSlidingSql,
    "str_funcs2" -> strFuncs2Sql,
    "ref_depth_bin_profile" -> refDepthBinProfileSql,
    "typed_mapvalues_reduce" -> typedMapvaluesReduceSql)
}
