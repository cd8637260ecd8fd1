package graft

/** Wave-102 properties: metric concordance, Fano curve, Omega ratio,
  * JK Sharpe test vs brute force at sf0.001.
  */
class Extras202Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("embed_cosine_euclid_concordance: brute-force top-10 replay") {
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        math.floor(x * 1e6 + 0.5).toLong).toArray))
    val probes = embs.filter(_._1 < 100)
    var jq = 0L; var top1Diff = 0L
    probes.foreach { case (pid, pv) =>
      val others = embs.filter(_._1 != pid)
      def dot(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      def sq(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
      val byCos = others.map { case (v, qv) =>
        (v, dot(qv, pv).toDouble / math.sqrt(dot(qv, qv).toDouble)) }
        .sortBy(t => (-t._2, t._1)).map(_._1)
      val byEuc = others.map { case (v, qv) => (v, sq(qv, pv)) }
        .sortBy(t => (t._2, t._1)).map(_._1)
      val sc = byCos.take(10).toSet; val se = byEuc.take(10).toSet
      val inter = sc.intersect(se).size; val uni = sc.union(se).size
      jq += math.floor(inter.toDouble / uni * 1e9 + 0.5).toLong
      if (byCos.head != byEuc.head) top1Diff += 1
    }
    val row = queries.Extras202.embedCosineEuclidConcordance(spark, sf).collect().head
    assert(row.getLong(0) == probes.length.toLong)
    assert(math.abs(row.getDouble(1) - jq / 1e9 / probes.length) < 1e-6)
    assert(row.getLong(2) == top1Diff)
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1)
  }

  test("time_fano_factor: window-count replay at 3 scales") {
    val us = Tables.events(spark, sf).select("ts").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](0)
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      }
    val rows = queries.Extras202.timeFanoFactor(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 6L, 24L))
    rows.foreach { r =>
      val w = r.getLong(0) * 3600000000L
      val counts = us.groupBy(_ / w).values.map(_.size.toLong).toSeq
      val n = counts.size
      val sc = counts.map(BigInt(_)).sum; val qc = counts.map(x => BigInt(x) * BigInt(x)).sum
      val fano = ((qc.toDouble - sc.toDouble * sc.toDouble / n) / n) / (sc.toDouble / n)
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - fano) < 1e-5)
    }
  }

  test("win_omega_ratio: quantized return replay; omega > 0") {
    val monthly = Tables.lineitem(spark, sf).select("l_shipdate", "l_extendedprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](0)
        ((dt.getYear, dt.getMonthValue), cents(r.getDouble(1)))
      }.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
    val rets = monthly.sliding(2).filter(_.size == 2)
      .map(p => math.floor(math.log(p(1).toDouble / p(0)) * 1e9 + 0.5).toLong).toSeq
    val g = rets.filter(_ > 0).sum; val l = -rets.filter(_ < 0).sum
    val row = queries.Extras202.winOmegaRatio(spark, sf).collect().head
    assert(row.getLong(0) == rets.size.toLong)
    assert(math.abs(row.getDouble(1) - g.toDouble / l) < 1e-5)
    assert(row.getDouble(1) > 0)
    assert(math.abs(row.getDouble(2) - rets.count(_ > 0).toDouble / rets.size) < 1e-6)
  }

  test("stat_sharpe_jk_test: paired-return replay; |z| finite") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_shipdate", "l_extendedprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), (dt.getYear, dt.getMonthValue), cents(r.getDouble(2)))
      }
    val clsOf = Tables.part(spark, sf).select("p_partkey", "p_type").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")(0))).toMap
    val monthly = li.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
      (g.filter(x => clsOf(x._1) == "PROMO").map(_._3).sum,
        g.filter(x => clsOf(x._1) == "STANDARD").map(_._3).sum)
    }.filter(p => p._1 > 0 && p._2 > 0)
    val rets = monthly.sliding(2).filter(_.size == 2).map { p =>
      (math.floor(math.log(p(1)._1.toDouble / p(0)._1) * 1e9 + 0.5).toLong,
        math.floor(math.log(p(1)._2.toDouble / p(0)._2) * 1e9 + 0.5).toLong)
    }.toSeq
    val n = rets.size
    val sa = rets.map(r => BigInt(r._1)).sum; val sb = rets.map(r => BigInt(r._2)).sum
    val qa = rets.map(r => BigInt(r._1) * BigInt(r._1)).sum
    val qb = rets.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val sab = rets.map(r => BigInt(r._1) * BigInt(r._2)).sum
    val ma = sa.toDouble / n; val mb = sb.toDouble / n
    val da = math.sqrt((qa.toDouble - sa.toDouble * sa.toDouble / n) / n)
    val db = math.sqrt((qb.toDouble - sb.toDouble * sb.toDouble / n) / n)
    val rho = (sab.toDouble - sa.toDouble * sb.toDouble / n) /
      math.sqrt((qa.toDouble - sa.toDouble * sa.toDouble / n) *
        (qb.toDouble - sb.toDouble * sb.toDouble / n))
    val s1 = ma / da; val s2 = mb / db
    val z = (s1 - s2) * math.sqrt(n.toDouble) /
      math.sqrt(2 * (1 - rho) + 0.5 * (s1 * s1 + s2 * s2) - s1 * s2 * (1 + rho * rho))
    val row = queries.Extras202.statSharpeJkTest(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - s1) < 1e-5)
    assert(math.abs(row.getDouble(2) - s2) < 1e-5)
    assert(math.abs(row.getDouble(3) - z) < 1e-4)
    assert(!row.getDouble(3).isNaN)
  }
}
