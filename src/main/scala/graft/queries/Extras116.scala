package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** 116th wave — counting interval overlaps WITHOUT emitting pairs: the
  * sweep formulation that replaces the quadratic interval self-join
  * with two cumulative counts. The pair-emitting join exists
  * (C-interval rows); this is the aggregate-only path a monitor
  * actually runs at 100 TB, where the pair set itself is the
  * intractable object.
  */
object Extras116 {

  /** time_overlap_pair_count — per supplier, how many PAIRS of its
    * shipment intervals [shipdate, receiptdate] overlap (share ≥ 1
    * day)? Sweep identity instead of the n² self-join: with intervals
    * totally ordered by (start, end, uid),
    *   P = Σ_i (#starts with date < s_i − #ends with date < s_i)
    *       + Σ_{equal-start groups} C(k,2)
    * — the first term counts earlier-started overlapping partners
    * (s_j < s_i overlaps iff e_j ≥ s_i), the second the same-start
    * pairs, which always overlap. #starts-before is the tie-stable
    * difference of two row_numbers (invariant to tie order);
    * #ends-before is a running end-marker sum over the interleaved
    * (date, kind) event frame with ends sorted AFTER starts at equal
    * dates — ties at a start row are all other starts, so the ROWS
    * frame is deterministic. Everything is exact integers; 2n event
    * rows, two window passes — O(n log n) per supplier. Duplicate
    * intervals (this generator repeats (orderkey, linenumber) keys)
    * cost nothing: every term is a COUNT difference invariant to tie
    * order, so no unique key is needed on the engine side. The oracle
    * is the DEFINITIONAL O(n²) pair join over arbitrary-but-unique
    * row numbers (sf0.01 per the quadratic-oracle convention);
    * Extras116Spec re-proves sweep = brute force in-engine.
    */
  def timeOverlapPairCount(s: SparkSession, d: String): DataFrame = {
    // this generator's lineitem has no receipt date: the transit
    // interval ends a rule-derived 0-36 days after shipment (key-mod
    // rule — deterministic, identical in the oracle)
    val iv = lineitem(s, d).select(col("l_suppkey").as("supp"),
      col("l_shipdate").cast("date").as("sd"),
      date_add(col("l_shipdate").cast("date"),
        (col("l_orderkey") % 20 + col("l_linenumber") * 3).cast("int"))
        .as("ed"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"))
    val ev = iv.select(col("supp"), col("sd"), col("ed"), col("uid"),
        col("sd").as("dt"), lit(0).as("kind"), lit(0L).as("is_end"))
      .unionAll(iv.select(col("supp"), col("sd"), col("ed"), col("uid"),
        col("ed").as("dt"), lit(1).as("kind"), lit(1L).as("is_end")))
    val wScan = Window.partitionBy("supp").orderBy(col("dt"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val starts = ev
      .withColumn("ends_before", sum(col("is_end")).over(wScan))
      .filter(col("kind") === 0)
    val w1 = Window.partitionBy("supp")
      .orderBy(col("sd"), col("ed"), col("uid"))
    val w2 = Window.partitionBy("supp", "sd")
      .orderBy(col("ed"), col("uid"))
    starts
      .withColumn("grp_rank", row_number().over(w2) - 1)
      .withColumn("starts_before", row_number().over(w1) - 1 - col("grp_rank"))
      .groupBy("supp")
      .agg(count(lit(1)).as("n_intervals"),
        (sum(col("starts_before") - col("ends_before"))
          + sum(col("grp_rank"))).as("n_overlap_pairs"))
      .orderBy("supp")
  }
  val timeOverlapPairCountSql: String =
    """WITH iv AS (
      |  -- (l_orderkey, l_linenumber) is NOT unique in this generator
      |  -- (11785 duplicate pairs at sf0.01): the pairing tie-break must
      |  -- be an arbitrary-but-unique row number — the overlap COUNT is
      |  -- invariant to which duplicate gets which id
      |  SELECT l_suppkey AS supp, CAST(l_shipdate AS DATE) AS sd,
      |    CAST(l_shipdate AS DATE)
      |      + CAST(l_orderkey % 20 + l_linenumber * 3 AS INTEGER) AS ed,
      |    row_number() OVER () AS uid
      |  FROM lineitem),
      |p AS (
      |  SELECT a.supp, CAST(count(*) AS BIGINT) AS np
      |  FROM iv a JOIN iv b ON b.supp = a.supp AND a.uid < b.uid
      |    AND a.sd <= b.ed AND b.sd <= a.ed
      |  GROUP BY 1),
      |n AS (SELECT supp, CAST(count(*) AS BIGINT) AS ni FROM iv GROUP BY 1)
      |SELECT n.supp, n.ni AS n_intervals,
      |  CAST(coalesce(p.np, 0) AS BIGINT) AS n_overlap_pairs
      |FROM n LEFT JOIN p ON p.supp = n.supp
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_overlap_pair_count" -> (timeOverlapPairCount _))

  val oracle: Map[String, String] = Map(
    "time_overlap_pair_count" -> timeOverlapPairCountSql)
}
