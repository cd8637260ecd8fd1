package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Seventeenth wave: the spatial bin join — with a DuckDB oracle.
  */
object Extras17 {

  /** (region_id, min_lon, min_lat, max_lon, max_lat) — literal query
    * regions; R1 and R4 overlap, R4 sits inside one grid cell.
    */
  private val Regions = Seq(
    (1L, -50.0, -20.0, 12.0, 15.0),
    (2L, 100.0, 40.0, 135.0, 88.0),
    (3L, -179.0, -89.0, -120.0, -45.0),
    (4L, 0.0, 0.0, 9.0, 9.0))

  /** join_spatial_bin — the spatial JOIN at scale (C12's geo filter is
    * one polygon as a predicate; here MANY regions join against the
    * point set): the plane is cut into 10°×10° grid cells, every
    * region explodes into the cells it intersects, every point keys by
    * its own single cell, and candidates meet in a plain equi-shuffle
    * join on the cell id — the geohash/S2 pattern that replaces an
    * O(points×regions) theta join. Exact containment then prunes
    * within cells (each point occupies exactly one cell, so no pair
    * dedup is needed). Points derive lon/lat deterministically from
    * events (the C12 fixture); the oracle states pure containment per
    * region with BETWEEN — no binning anywhere in it.
    */
  def joinSpatialBin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pts = events(s, d).select(col("event_id"),
      (col("value") % 360.0 - 180.0).as("lon"),
      (col("user_id") % 180).cast("double").minus(90.0).as("lat"))
      .withColumn("cx", floor(col("lon") / 10))
      .withColumn("cy", floor(col("lat") / 10))
    val regions = Regions
      .toDF("region_id", "min_lon", "min_lat", "max_lon", "max_lat")
    val regionCells = regions
      .withColumn("cx", explode(expr("sequence(floor(min_lon / 10), floor(max_lon / 10))")))
      .withColumn("cy", explode(expr("sequence(floor(min_lat / 10), floor(max_lat / 10))")))
    val hits = pts.join(broadcast(regionCells), Seq("cx", "cy"))
      .filter(col("lon").between(col("min_lon"), col("max_lon")) &&
        col("lat").between(col("min_lat"), col("max_lat")))
      .groupBy("region_id").agg(count(lit(1)).as("n_points"))
    regions.select(col("region_id"))
      .join(hits, Seq("region_id"), "left_outer")
      .select(col("region_id"), coalesce(col("n_points"), lit(0L)).as("n_points"))
      .orderBy("region_id")
  }
  val joinSpatialBinSql: String = {
    val unions = Regions.map { case (id, lo, la, ho, ha) =>
      s"SELECT CAST($id AS BIGINT) AS region_id, $lo AS min_lon, $la AS min_lat, $ho AS max_lon, $ha AS max_lat"
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS (
       |  SELECT event_id, value % 360.0 - 180.0 AS lon,
       |         CAST(user_id % 180 AS DOUBLE) - 90.0 AS lat
       |  FROM events),
       |r AS (
       |  $unions)
       |SELECT r.region_id,
       |  CAST(count(CASE WHEN g.lon BETWEEN r.min_lon AND r.max_lon
       |                   AND g.lat BETWEEN r.min_lat AND r.max_lat
       |             THEN 1 END) AS BIGINT) AS n_points
       |FROM r CROSS JOIN g
       |GROUP BY r.region_id ORDER BY r.region_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_spatial_bin" -> (joinSpatialBin _),
  )

  val oracle: Map[String, String] = Map(
    "join_spatial_bin" -> joinSpatialBinSql,
  )
}
