package graft

/** Wave-139 properties at sf0.001: AC1/κ vs exact 2×2 cell algebra,
  * SRH H's vs a collected rank replay, Mantel r vs a pairwise replay,
  * readability means vs a per-doc formula replay.
  */
class Extras239Spec extends SparkSpec {

  test("stat_gwets_ac1: matches cell algebra; AC1 and kappa bounded by 1") {
    val xs = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag = 'R' AS ra", "l_quantity > 25 AS rb")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    val n = xs.length.toDouble
    val pa = xs.count(x => x._1 == x._2) / n
    val p1 = xs.count(_._1) / n
    val p2 = xs.count(_._2) / n
    val pi = (p1 + p2) / 2
    val ac1 = (pa - 2 * pi * (1 - pi)) / (1 - 2 * pi * (1 - pi))
    val kap = (pa - (p1 * p2 + (1 - p1) * (1 - p2))) / (1 - (p1 * p2 + (1 - p1) * (1 - p2)))
    val row = queries.Extras239.statGwetsAc1(spark, sf).collect().head
    assert(row.getLong(0) == xs.length.toLong)
    assert(math.abs(row.getDouble(1) - pa) < 1e-6)
    assert(math.abs(row.getDouble(2) - ac1) < 1e-5, s"AC1 ${row.getDouble(2)} vs $ac1")
    assert(math.abs(row.getDouble(3) - kap) < 1e-5, s"kappa ${row.getDouble(3)} vs $kap")
    assert(row.getDouble(2) <= 1.0 && row.getDouble(3) <= 1.0)
  }

  test("stat_scheirer_ray_hare: H's match a collected midrank replay") {
    val xs = Tables.orders(spark, sf)
      .selectExpr("year(o_orderdate) AS ya", "o_orderpriority AS grp",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val nn = xs.length.toLong
    // doubled midranks then the same 1e12 u-quantization the query uses
    val byV = xs.map(_._3).groupBy(identity).map { case (v, g) => v -> g.length.toLong }
    val sortedV = byV.keys.toArray.sorted
    var cum = 0L
    val uq = scala.collection.mutable.Map[Long, Long]()
    sortedV.foreach { v =>
      val c = byV(v)
      uq(v) = math.floor((2 * cum + c + 1).toDouble / (2 * (nn + 1)) * 1e12 + 0.5).toLong
      cum += c
    }
    def ssOf(groupsOf: ((Int, String, Long)) => Any): Double = {
      val cellsums = xs.groupBy(groupsOf).map { case (_, g) =>
        (g.map(x => BigInt(uq(x._3))).sum, g.length.toLong) }
      cellsums.map { case (sl, nl) =>
        math.floor((sl.toDouble / 1e12) * (sl.toDouble / 1e12) / nl / nn * 1e12 + 0.5).toLong
      }.sum / 1e12 - 0.25
    }
    val squ = xs.map(x => BigInt(uq(x._3)) * BigInt(uq(x._3))).sum
    val msn = (squ.toDouble / 1e24 - 0.25 * nn) / (nn.toDouble - 1) / nn
    val ssa = ssOf(_._1); val ssb = ssOf(_._2); val ssc = ssOf(x => (x._1, x._2))
    val rows = queries.Extras239.statScheirerRayHare(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size == 3)
    assert(math.abs(rows("year")._2 - ssa / msn) < 1e-2, s"H_year ${rows("year")._2} vs ${ssa / msn}")
    assert(math.abs(rows("priority")._2 - ssb / msn) < 1e-2)
    assert(math.abs(rows("interaction")._2 - (ssc - ssa - ssb) / msn) < 1e-2)
    assert(rows("interaction")._1 == rows("year")._1 * rows("priority")._1)
  }

  test("stat_mantel_test: r matches a pairwise replay; |r| <= 1") {
    val vs = Tables.embeddings(spark, sf).filter("vec_id < 60")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val pairs = for (i <- vs.indices; j <- (i + 1) until vs.length) yield {
      val d2 = dot(vs(i)._3, vs(i)._3) - 2 * dot(vs(i)._3, vs(j)._3) + dot(vs(j)._3, vs(j)._3)
      (math.floor(math.sqrt(math.max(d2, 0.0)) * 1e9 + 0.5).toLong,
        math.abs(vs(i)._2 - vs(j)._2).toLong)
    }
    val m = pairs.length.toDouble
    val sx = pairs.map(p => BigInt(p._1)).sum.toDouble
    val sy = pairs.map(_._2).sum.toDouble
    val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
    val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
    val syy = pairs.map(p => p._2 * p._2).sum.toDouble
    val r = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    val row = queries.Extras239.statMantelTest(spark, sf).collect().head
    assert(row.getLong(0) == pairs.length.toLong)
    assert(math.abs(row.getDouble(1) - r) < 1e-4, s"r ${row.getDouble(1)} vs $r")
    assert(math.abs(row.getDouble(1)) <= 1.0)
  }

  test("text_readability_battery: means match a per-doc replay") {
    val docs = Tables.documents(spark, sf).selectExpr("text").collect().map(_.getString(0))
    var sfog = 0L; var ssmog = 0L; var scl = 0L; var sari = 0L; var nd = 0L
    docs.foreach { t =>
      val lt = t.count(_.isLetter).toLong
      val w = t.split(" ").count(_.nonEmpty).toLong
      val sn = math.max(t.count(c => c == '.' || c == '!' || c == '?'), 1).toLong
      val cx = t.toLowerCase.split(" ").count(x =>
        "[aeiou]+".r.findAllIn(x).length >= 3).toLong
      if (w > 0) {
        nd += 1
        sfog += math.floor((0.4 * (w.toDouble / sn + 100 * cx.toDouble / w)) * 1e6 + 0.5).toLong
        ssmog += math.floor((1.043 * math.sqrt(30 * cx.toDouble / sn) + 3.1291) * 1e6 + 0.5).toLong
        scl += math.floor((5.88 * lt.toDouble / w - 29.6 * sn.toDouble / w - 15.8) * 1e6 + 0.5).toLong
        sari += math.floor((4.71 * lt.toDouble / w + 0.5 * w.toDouble / sn - 21.43) * 1e6 + 0.5).toLong
      }
    }
    val row = queries.Extras239.textReadabilityBattery(spark, sf).collect().head
    assert(row.getLong(0) == nd)
    assert(math.abs(row.getDouble(1) - sfog.toDouble / nd / 1e6) < 1e-3, "fog")
    assert(math.abs(row.getDouble(2) - ssmog.toDouble / nd / 1e6) < 1e-3, "smog")
    assert(math.abs(row.getDouble(3) - scl.toDouble / nd / 1e6) < 1e-3, "coleman-liau")
    assert(math.abs(row.getDouble(4) - sari.toDouble / nd / 1e6) < 1e-3, "ari")
  }
}
