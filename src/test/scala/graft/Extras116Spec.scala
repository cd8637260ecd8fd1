package graft

import org.apache.spark.sql.functions._

/** The sweep's defining identity: per-supplier overlap-pair counts
  * must equal the brute-force quadratic definition — including on the
  * generator's duplicate (orderkey, linenumber) rows, where the
  * count-difference formulation must stay tie-stable.
  */
class Extras116Spec extends SparkSpec {

  test("time_overlap_pair_count sweep equals brute-force pair counting") {
    val iv = Tables.lineitem(spark, sf).select(
        col("l_suppkey").as("supp"),
        col("l_shipdate").cast("date").as("sd"),
        org.apache.spark.sql.functions.date_add(
          col("l_shipdate").cast("date"),
          (col("l_orderkey") % 20 + col("l_linenumber") * 3).cast("int"))
          .as("ed"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDate(2).toLocalDate.toEpochDay))
      .groupBy(_._1)
    val brute = iv.map { case (supp, rows) =>
      var n = 0L
      for (i <- rows.indices; j <- (i + 1) until rows.length)
        if (rows(i)._2 <= rows(j)._3 && rows(j)._2 <= rows(i)._3) n += 1
      supp -> (rows.length.toLong, n)
    }
    val engine = queries.Extras116.timeOverlapPairCount(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(engine == brute,
      s"sweep diverges from brute force on ${
        (engine.toSet -- brute.toSet).take(3)} vs ${
        (brute.toSet -- engine.toSet).take(3)}")
  }
}
