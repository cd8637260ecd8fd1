package graft

import org.apache.spark.sql.functions._

/** Wave-11 properties: the skyline must BE a skyline (checked against
  * the brute-force dominance definition), and the decay score must
  * reward recency.
  */
class Extras111Spec extends SparkSpec {

  test("analytics_skyline_suppliers equals the brute-force dominance front") {
    val sup = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(14,2)") * 100)
          .cast("long")).as("cost"),
        sum(col("l_quantity").cast("decimal(14,2)").cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = sup.filter { case (_, c, q) =>
      !sup.exists { case (_, c2, q2) =>
        c2 <= c && q2 >= q && (c2 < c || q2 > q) }
    }.map(_._1).toSet
    val engine = queries.Extras111.analyticsSkylineSuppliers(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(engine == brute,
      s"skyline mismatch: engine-only ${engine -- brute}, " +
        s"missing ${brute -- engine}")
    // a front is an anti-chain: sorted by cost, qty strictly increases
    val front = queries.Extras111.analyticsSkylineSuppliers(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(front.sliding(2).forall {
      case Array((c1, q1), (c2, q2)) => c1 < c2 && q1 < q2
      case _ => true
    }, "front is not a strict anti-chain")
  }

  test("analytics_time_decay_score: recency dominates volume at equal spend") {
    val rows = queries.Extras111.analyticsTimeDecayScore(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20) // sf0.001 has < 20 users
    rows.foreach(r => assert(r.getLong(1) > 0, s"non-positive score: $r"))
    val scores = rows.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
  }
}
