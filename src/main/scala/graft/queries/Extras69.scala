package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Sixty-ninth wave: Spearman rank correlation (the tie-corrected
  * rank twin of stat_corr_matrix's Pearson, ranks via the distributed
  * GlobalRank prefix-sum) and a haversine track-length geo operator.
  */
object Extras69 {

  /** stat_spearman_corr — Spearman rank correlation between line
    * quantity and extended price with tie-corrected AVERAGE ranks in
    * INTEGER arithmetic end-to-end (C306's doubling trick: the doubled
    * average rank 2·r = 2·c_before + cnt + 1 is an exact integer, and
    * Pearson correlation is invariant under the affine map r → 2r).
    * Scale: each rank table is a groupBy on the value domain + the
    * range-partitioned GlobalRank exclusive prefix-sum (no global
    * window), mapped back with two value-keyed joins; the five moment
    * sums accumulate as DECIMAL(38,0) (exact at 1000× the bench scale
    * — doubled ranks at 6×10⁸ rows square to ~10¹⁸, sum to ~10²⁷,
    * 11 digits of headroom; an int64 sum would wrap) and the ONE IEEE
    * expression at the end runs on a single row in both engines.
    */
  def statSpearmanCorr(s: SparkSession, d: String): DataFrame = {
    val D = DecimalType(38, 0)
    val pairs = lineitem(s, d)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    def rank2(vcol: String): DataFrame = {
      val per = pairs.groupBy(col(vcol)).agg(count(lit(1)).as("cnt"))
      // r14: x = l_quantity (1..50 bounded) rides a single-task window;
      // y = extendedprice (corpus-scale histogram) keeps GlobalRank.
      // r15 re-measured the r14-verdict ambiguity (full ledgers said
      // 1.38x): min-of-3 alternating A/B, bounded window 2.95 s vs
      // GlobalRank-on-both 3.79 s (1.29x) — the bounded window WINS;
      // the full-ledger regression was an environmental transient.
      val spine =
        if (vcol == "x") graft.plans.BoundedPrefix.prefixSum(
          per, "c_before", col("cnt"), Seq(col(vcol).asc))
        else graft.plans.GlobalRank.withExclusivePrefixSum(
          per, "c_before", col("cnt"), Seq(col(vcol).asc))
      spine.select(col(vcol),
        (lit(2) * col("c_before") + col("cnt") + 1).as(s"r2_$vcol"))
    }
    val sums = pairs
      .join(rank2("x"), "x").join(rank2("y"), "y")
      .select(col("r2_x").cast(D).as("rx"), col("r2_y").cast(D).as("ry"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
    def dd(c: String): Column = col(c).cast("double")
    sums.select(col("n"),
      round((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        sqrt((dd("n") * dd("sxx") - dd("sx") * dd("sx")) *
             (dd("n") * dd("syy") - dd("sy") * dd("sy"))), 6)
        .as("spearman_rho"))
  }
  val statSpearmanCorrSql: String =
    """WITH pairs AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
      |xr AS (
      |  SELECT x, 2*(sum(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS r2_x
      |  FROM (SELECT x, count(*) AS cnt FROM pairs GROUP BY 1) t),
      |yr AS (
      |  SELECT y, 2*(sum(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS r2_y
      |  FROM (SELECT y, count(*) AS cnt FROM pairs GROUP BY 1) t),
      |s AS (
      |  SELECT count(*) AS n, sum(r2_x) AS sx, sum(r2_y) AS sy,
      |    sum(r2_x*r2_y) AS sxy, sum(r2_x*r2_x) AS sxx,
      |    sum(r2_y*r2_y) AS syy
      |  FROM pairs JOIN xr USING(x) JOIN yr USING(y))
      |SELECT n,
      |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS spearman_rho
      |FROM s""".stripMargin

  /** geo_haversine_track — per-device great-circle track length: the
    * synthesized positions snap to INTEGER degrees (the resolution the
    * synthetic coordinates actually carry — and the snap bounds the
    * distinct (lat₁, lat₂, Δlon) combos the transcendental path ever
    * sees), consecutive fixes pair via one lag window per device
    * (partitioned — never global), each leg's haversine rounds to
    * 3 dp km and accumulates as EXACT decimal so the per-device totals
    * are shuffle-order independent. Report: the 10 longest tracks.
    * 100 TB note: everything partitions by user_id; the trig runs
    * row-local inside codegen, no shuffle beyond the one window +
    * final top-k.
    */
  def geoHaversineTrack(s: SparkSession, d: String): DataFrame = {
    val pts = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
      floor(col("value") % 360 - 180).cast("double").as("lon"),
      floor((col("event_id") * 7919L) % 180 - 90).cast("double").as("lat"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val legs = pts
      .withColumn("plon", lag("lon", 1).over(w))
      .withColumn("plat", lag("lat", 1).over(w))
      .filter(col("plon").isNotNull)
    val a = pow(sin(radians((col("lat") - col("plat")) / 2)), 2) +
      cos(radians(col("plat"))) * cos(radians(col("lat"))) *
        pow(sin(radians((col("lon") - col("plon")) / 2)), 2)
    legs
      .withColumn("leg_km",
        round(lit(2 * 6371.0088) * asin(least(lit(1.0), sqrt(a))), 3)
          .cast(DecimalType(18, 3)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_legs"),
        sum(col("leg_km")).cast("double").as("total_km"))
      .orderBy(col("total_km").desc, col("user_id")).limit(10)
  }
  val geoHaversineTrackSql: String =
    """WITH pts AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value % 360 - 180) AS DOUBLE) AS lon,
      |    CAST(floor((event_id * 7919) % 180 - 90) AS DOUBLE) AS lat
      |  FROM events),
      |legs AS (
      |  SELECT user_id,
      |    lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon,
      |    lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
      |    lon, lat
      |  FROM pts),
      |d AS (
      |  SELECT user_id,
      |    CAST(round(2 * 6371.0088 * asin(least(1.0, sqrt(
      |      pow(sin(radians((lat - plat) / 2)), 2)
      |      + cos(radians(plat)) * cos(radians(lat))
      |        * pow(sin(radians((lon - plon) / 2)), 2)))), 3)
      |      AS DECIMAL(18,3)) AS leg_km
      |  FROM legs WHERE plon IS NOT NULL)
      |SELECT user_id, count(*) AS n_legs,
      |  CAST(sum(leg_km) AS DOUBLE) AS total_km
      |FROM d GROUP BY 1
      |ORDER BY total_km DESC, user_id LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_spearman_corr" -> (statSpearmanCorr _),
    "geo_haversine_track" -> (geoHaversineTrack _))

  val oracle: Map[String, String] = Map(
    "stat_spearman_corr" -> statSpearmanCorrSql,
    "geo_haversine_track" -> geoHaversineTrackSql)
}
