package graft

/** Wave-105 properties: Stuart-Maxwell, cross elasticity, Burrows
  * Zeta, cluster-size entropy vs brute force at sf0.001.
  */
class Extras205Spec extends SparkSpec {

  test("stat_stuart_maxwell: 4x4 linear-system replay; chi2 >= 0") {
    val cells = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map { r =>
        val x = r.getString(0).substring(0, 1).toInt
        val p = r.getDouble(1)
        val y = if (p < 60000) 1 else if (p < 120000) 2 else if (p < 180000) 3
          else if (p < 240000) 4 else 5
        (x, y)
      }
    val n = Array.tabulate(6, 6)((i, j) => cells.count(c => c._1 == i && c._2 == j).toDouble)
    val dvec = (1 to 4).map(i => (1 to 5).map(j => n(i)(j)).sum - (1 to 5).map(j => n(j)(i)).sum)
    val sMat = Array.tabulate(4, 4) { (i0, j0) =>
      val i = i0 + 1; val j = j0 + 1
      if (i == j) (1 to 5).map(k => n(i)(k)).sum + (1 to 5).map(k => n(k)(i)).sum - 2 * n(i)(i)
      else -(n(i)(j) + n(j)(i))
    }
    def det3(a: Array[Array[Double]]): Double =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
        a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
        a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    def det4(m: Array[Array[Double]]): Double = {
      def minor(r: Int, c: Int) = (0 until 4).filter(_ != r).map(i =>
        (0 until 4).filter(_ != c).map(j => m(i)(j)).toArray).toArray
      m(0)(0) * det3(minor(0, 0)) - m(0)(1) * det3(minor(0, 1)) +
        m(0)(2) * det3(minor(0, 2)) - m(0)(3) * det3(minor(0, 3))
    }
    val d0 = det4(sMat)
    val chi = (0 until 4).map { c =>
      det4(Array.tabulate(4, 4)((i, j) => if (j == c) dvec(i) else sMat(i)(j))) * dvec(c)
    }.sum / d0
    val row = queries.Extras205.statStuartMaxwell(spark, sf).collect().head
    assert(row.getLong(0) == cells.length.toLong)
    assert(math.abs(row.getDouble(1) - chi) < 1e-2)
    assert(row.getDouble(1) >= 0)
    assert(row.getLong(2) == 4L)
  }

  test("analytics_cross_elasticity: quantized log-OLS replay") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), (dt.getYear, dt.getMonthValue),
          math.round(r.getDouble(2) * 100), r.getDouble(3).toLong)
      }
    val clsOf = Tables.part(spark, sf).select("p_partkey", "p_type").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")(0))).toMap
    val logs = li.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (_, g) =>
      val prev = g.filter(x => clsOf(x._1) == "PROMO").map(_._3).sum
      val pqty = g.filter(x => clsOf(x._1) == "PROMO").map(_._4).sum
      val sqty = g.filter(x => clsOf(x._1) == "STANDARD").map(_._4).sum
      if (prev > 0 && pqty > 0 && sqty > 0)
        Some((math.floor(math.log(prev.toDouble / pqty / 100) * 1e9 + 0.5).toLong,
          math.floor(math.log(pqty.toDouble) * 1e9 + 0.5).toLong,
          math.floor(math.log(sqty.toDouble) * 1e9 + 0.5).toLong))
      else None
    }
    val n = logs.size
    def slope(y: ((Long, Long, Long)) => Long): Double = {
      val sx = logs.map(t => BigInt(t._1)).sum; val sy = logs.map(t => BigInt(y(t))).sum
      val sxx = logs.map(t => BigInt(t._1) * BigInt(t._1)).sum
      val sxy = logs.map(t => BigInt(t._1) * BigInt(y(t))).sum
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    }
    val row = queries.Extras205.analyticsCrossElasticity(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - slope(_._2)) < 1e-4)
    assert(math.abs(row.getDouble(2) - slope(_._3)) < 1e-4)
  }

  test("text_burrows_zeta: DF-fraction replay; markers consistent") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0) == "en", r.getString(1).split(" ", -1).distinct))
    val na = docs.count(_._1); val nb = docs.size - na
    val dfa = docs.filter(_._1).flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val dfb = docs.filterNot(_._1).flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val shared = dfa.keySet.intersect(dfb.keySet)
    val zq = shared.toSeq.map { w =>
      (w, math.floor((dfa(w).toDouble / na - dfb(w).toDouble / nb) * 1e9 + 0.5).toLong)
    }
    val row = queries.Extras205.textBurrowsZeta(spark, sf).collect().head
    assert(row.getLong(0) == shared.size.toLong)
    assert(math.abs(row.getDouble(1) - zq.map(t => math.abs(t._2)).map(BigInt(_)).sum.toDouble / 1e9 / shared.size) < 1e-6)
    assert(row.getLong(2) == zq.count(_._2 > 1e8).toLong)
    assert(row.getLong(3) == zq.count(_._2 < -1e8).toLong)
    val top = zq.sortBy(t => (-math.abs(t._2), t._1)).head
    assert(row.getString(4) == top._1)
    assert(math.abs(row.getDouble(5) - top._2 / 1e9) < 1e-6)
  }

  test("dedup_cluster_size_entropy: prefix-cluster spectrum replay") {
    val prefs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(" ", -1).take(3).mkString(" "))
    val sizes = prefs.groupBy(identity).values.map(_.size.toLong).toSeq
    val k = sizes.size.toLong; val n = sizes.sum
    val hq = sizes.map(sz =>
      math.floor(sz.toDouble * math.log(n.toDouble / sz) * 1e9 + 0.5).toLong).sum
    val ns = sizes.filter(_ >= 2).sum
    val row = queries.Extras205.dedupClusterSizeEntropy(spark, sf).collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - hq / 1e9 / n) < 1e-6)
    assert(math.abs(row.getDouble(3) - math.exp(hq / 1e9 / n)) < 1e-2)
    assert(math.abs(row.getDouble(4) - ns.toDouble / n) < 1e-6)
    assert(row.getDouble(3) <= k + 1e-6)
  }
}
