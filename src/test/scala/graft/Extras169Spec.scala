package graft

import org.apache.spark.sql.functions._

/** Wave-69 properties: Cliff's delta, centralization, Davies–Bouldin,
  * IPW replays against brute force on sf0.001.
  */
class Extras169Spec extends SparkSpec {

  test("stat_cliff_delta: O(n*m) brute-force pair replay") {
    val v = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R"))
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val as = v.filter(_._1 == "A").map(_._2)
    val rs = v.filter(_._1 == "R").map(_._2)
    var gt = 0L; var lt = 0L; var eq = 0L
    for (a <- as; r <- rs) {
      if (a > r) gt += 1 else if (a < r) lt += 1 else eq += 1
    }
    val nm = as.length.toDouble * rs.length
    val row = queries.Extras169.statCliffDelta(spark, sf).collect().head
    assert(row.getLong(0) == as.length.toLong && row.getLong(1) == rs.length.toLong)
    assert(math.abs(row.getDouble(2) - (gt - lt) / nm) < 1e-6)
    assert(math.abs(row.getDouble(3) - (gt + 0.5 * eq) / nm) < 1e-6)
    assert(row.getDouble(2) >= -1 && row.getDouble(2) <= 1)
  }

  test("graph_degree_centralization: in-memory degree replay") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val n = users.length.toLong
    val arcs = users.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n).filter(_ != u).map(u -> _)
    }
    val edges = (arcs ++ arcs.map(_.swap)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dmax = deg.values.max
    val c = deg.values.map(dmax - _).sum.toDouble / ((deg.size - 1.0) * (deg.size - 2.0))
    val row = queries.Extras169.graphDegreeCentralization(spark, sf).collect().head
    assert(row.getLong(0) == deg.size.toLong)
    assert(row.getLong(1) == dmax && row.getLong(2) == deg.values.min)
    assert(math.abs(row.getDouble(4) - c) < 1e-5)
  }

  test("embed_davies_bouldin: textbook DB replay; DB > 0") {
    val vecs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => (r.getInt(1 - 1),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray))
    val dims = vecs.head._2.length
    val byL = vecs.groupBy(_._1)
    val cent = byL.view.mapValues { g =>
      Array.tabulate(dims)(j => g.map(_._2(j)).sum / g.length)
    }.toMap
    val scat = byL.view.mapValues { g =>
      val mu = cent(g.head._1)
      math.sqrt(g.map(v => (0 until dims).map(j =>
        math.pow(v._2(j) - mu(j), 2)).sum).sum / g.length) / 1e9
    }.toMap
    val labels = byL.keys.toSeq.sorted
    val ris = labels.map { i =>
      labels.filter(_ != i).map { j =>
        val d0 = math.sqrt((0 until dims).map(k =>
          math.pow(cent(i)(k) - cent(j)(k), 2)).sum) / 1e9
        (scat(i) + scat(j)) / d0
      }.max
    }
    val db = ris.map(r => math.floor(r * 1e9 + 0.5)).sum / ris.size / 1e9
    val row = queries.Extras169.embedDaviesBouldin(spark, sf).collect().head
    assert(row.getLong(0) == labels.length.toLong)
    assert(math.abs(row.getDouble(1) - db) < 1e-4)
    assert(row.getDouble(1) > 0)
  }

  test("analytics_ipw_ate: per-segment IPW replay") {
    val v = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map(r => (math.floor((r.getDouble(0) - 1) / 10).toLong,
        r.getDouble(1) >= 0.05, r.getString(2) == "R"))
    val n = v.length
    def q6(num: BigInt, den: BigInt): BigInt = num * 1000000 / den
    val segs = v.groupBy(_._1).values
    var sw1 = BigInt(0); var sw0 = BigInt(0)
    segs.foreach { g =>
      val ns = g.length.toLong; val ts = g.count(_._2).toLong
      val y1 = g.count(t => t._2 && t._3).toLong
      val y0 = g.count(t => !t._2 && t._3).toLong
      sw1 += q6(BigInt(y1) * ns, ts)
      sw0 += q6(BigInt(y0) * ns, ns - ts)
    }
    val ate = (sw1 - sw0).toDouble / 1e6 / n
    val t = v.count(_._2); val y1t = v.count(x => x._2 && x._3)
    val y0t = v.count(x => !x._2 && x._3)
    val naive = y1t.toDouble / t - y0t.toDouble / (n - t)
    val row = queries.Extras169.analyticsIpwAte(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - ate) < 1e-5)
    assert(math.abs(row.getDouble(2) - naive) < 1e-5)
  }
}
