package graft

import org.apache.spark.sql.functions._

/** Wave-70 properties: Kupiec, Hellinger, volume profile, LOF
  * replays against brute force on sf0.001.
  */
class Extras170Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_kupiec_pof: out-of-sample split replay") {
    val days = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val rqs = days.sliding(2).map { case Seq(a, b) =>
      math.floor((b.toDouble - a) / a * 1e6 + 0.5).toLong
    }.toIndexedSeq
    val m = rqs.length
    val h1 = rqs.take(m / 2)
    val h2 = rqs.drop(m / 2)
    val n1 = h1.length
    val thr = h1.sorted.zipWithIndex
      .find { case (_, i) => (i + 1) * 20 >= n1 }.get._1
    val x = h2.count(_ < thr).toLong
    val n = h2.length
    val lr = -2 * ((n - x) * math.log(0.95) + x * math.log(0.05) -
      (if (x == n) 0.0 else (n - x) * math.log(1 - x.toDouble / n)) -
      (if (x == 0) 0.0 else x * math.log(x.toDouble / n)))
    val row = queries.Extras170.statKupiecPof(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == x)
    assert(math.abs(row.getDouble(2) - thr / 1e6) < 1e-7)
    assert(math.abs(row.getDouble(3) - lr) < 1e-3)
    assert(row.getBoolean(4) == (math.floor(lr * 1e4 + 0.5) / 1e4 > 3.841))
  }

  test("stat_hellinger_distance: per-value Bhattacharyya replay; H in [0,1]") {
    val v = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), col("l_quantity")).collect()
      .map(r => (r.getInt(0), r.getDouble(1).toLong))
    val y1 = v.map(_._1).min; val y2 = v.map(_._1).max
    val c1 = v.filter(_._1 == y1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c2 = v.filter(_._1 == y2).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1 = c1.values.sum; val n2 = c2.values.sum
    val vals = (c1.keySet ++ c2.keySet).toSeq
    val bc6 = vals.map { q =>
      math.floor(math.sqrt(c1.getOrElse(q, 0L).toDouble * c2.getOrElse(q, 0L)) * 1e6 + 0.5).toLong
    }.sum
    val bc = bc6 / 1e6 / math.sqrt(n1.toDouble * n2)
    val row = queries.Extras170.statHellingerDistance(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - bc) < 1e-5)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }

  test("win_volume_profile: bucket histogram replay") {
    val b = Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_quantity").collect()
      .map(r => (cents(r.getDouble(0)) / 10000, r.getDouble(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val v = b.map(_._2).sum
    val ranked = b.sortBy(t => (-t._2, t._1))
    val poc = ranked.head
    var cum = 0L
    val va = ranked.zipWithIndex.find { case ((_, vol), _) =>
      cum += vol; cum * 10 >= v * 7
    }.get._2 + 1
    val row = queries.Extras170.winVolumeProfile(spark, sf).collect().head
    assert(row.getLong(0) == b.length.toLong)
    assert(row.getLong(1) == poc._1 * 100)
    assert(math.abs(row.getDouble(2) - poc._2.toDouble / v) < 1e-6)
    assert(row.getLong(3) == va.toLong)
  }

  test("embed_lof_probes: brute-force LOF replay; inliers near 1") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e9 + 0.5)).toArray))
      .filter(_._1 < 500).sortBy(_._1)
    // graft_qsqdist BIGINT-accumulator exactness precondition: vectors
    // are unit-norm, so Σ(fa−fb)² ≤ 2Σfa²+2Σfb² ≤ 4.4e18 < 2⁶³
    vecs.foreach { case (_, f) =>
      assert(f.map(x => x * x).sum <= 1.1e18, "quantized norm² exceeds the qsqdist overflow bound")
    }
    val dims = vecs.head._2.length
    def d(a: Array[Double], b: Array[Double]): Double =
      math.sqrt((0 until dims).map(j => (a(j) - b(j)) * (a(j) - b(j))).sum) / 1e9
    val ids = vecs.map(_._1)
    val dm = vecs.map(a => vecs.map(b => d(a._2, b._2)))
    val idx = ids.zipWithIndex.toMap
    val kd = vecs.indices.map { i =>
      val ds = vecs.indices.filter(_ != i)
        .map(j => (dm(i)(j), ids(j))).sorted
      ds(4)._1 // k=5
    }
    val nk = vecs.indices.map { i =>
      vecs.indices.filter(j => j != i && dm(i)(j) <= kd(i))
    }
    val lrd = vecs.indices.map { i =>
      val rs = nk(i).map(j =>
        math.floor(math.max(kd(j), dm(i)(j)) * 1e9 + 0.5).toLong).sum
      nk(i).size.toDouble / (rs.toDouble / 1e9)
    }
    val lof = vecs.indices.map { i =>
      val ls = nk(i).map(j => math.floor(lrd(j) * 1e9 + 0.5).toLong).sum
      (ls.toDouble / 1e9 / nk(i).size) / lrd(i)
    }
    val row = queries.Extras170.embedLofProbes(spark, sf).collect().head
    assert(row.getLong(0) == vecs.length.toLong)
    assert(math.abs(row.getDouble(1) - lof.max) < 1e-4)
    assert(row.getLong(2) == lof.count(_ > 1.5).toLong)
    val meanLof = lof.map(l => math.floor(l * 1e9 + 0.5).toLong).sum.toDouble /
      lof.size / 1e9
    assert(math.abs(row.getDouble(3) - meanLof) < 1e-4)
  }
}
