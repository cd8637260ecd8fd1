package graft

import java.security.MessageDigest

/** Wave-106 properties: sequential Poisson PPS, Calmar, NN margin,
  * partial Spearman vs brute force at sf0.001.
  */
class Extras206Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  private def md5frac8(key: String): Double = {
    val h = MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble / 4294967296.0
  }

  test("sample_sequential_poisson: xi-rank replay; 20 rows, weights >= 1") {
    val parts = Tables.lineitem(spark, sf).select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val trev = parts.map(p => BigInt(p._2)).sum
    val ranked = parts.map { case (pk, rev) =>
      (pk, rev, md5frac8(pk.toString) * trev.toDouble / rev)
    }.sortBy(t => (t._3, t._1)).take(20)
    val rows = queries.Extras206.sampleSequentialPoisson(spark, sf).collect()
    assert(rows.length == 20)
    rows.zip(ranked).zipWithIndex.foreach { case ((r, e), i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getLong(1) == e._1)
      assert(math.abs(r.getDouble(2) - e._2 / 100.0) < 1e-6)
      assert(r.getDouble(3) >= 1.0 - 1e-9)
    }
  }

  test("win_calmar_ratio: running-max drawdown replay") {
    val monthly = Tables.lineitem(spark, sf).select("l_shipdate", "l_extendedprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](0)
        ((dt.getYear, dt.getMonthValue), cents(r.getDouble(1)))
      }.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
    val rets = monthly.sliding(2).filter(_.size == 2)
      .map(p => math.floor(math.log(p(1).toDouble / p(0)) * 1e9 + 0.5).toLong).toSeq
    var eq = 0L; var peak = 0L; var mdd = 0L
    rets.foreach { r => eq += r; peak = math.max(peak, eq); mdd = math.max(mdd, peak - eq) }
    val ann = rets.sum.toDouble / 1e9 / rets.size * 12
    val row = queries.Extras206.winCalmarRatio(spark, sf).collect().head
    assert(row.getLong(0) == rets.size.toLong)
    assert(math.abs(row.getDouble(1) - ann) < 1e-5)
    assert(math.abs(row.getDouble(2) - mdd / 1e9) < 1e-6)
    if (mdd != 0) assert(math.abs(row.getDouble(3) - ann / (mdd / 1e9)) < 1e-4)
  }

  test("embed_nn_margin: top-2 distance replay; margins in [0,1]") {
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        math.floor(x * 1e6 + 0.5).toLong).toArray))
    val probes = embs.filter(_._1 < 100)
    val mqs = probes.map { case (pid, pv) =>
      val ds = embs.filter(_._1 != pid).map { case (v, qv) =>
        (qv.zip(pv).map { case (a, b) => BigInt(a - b) * BigInt(a - b) }.sum, v)
      }.sortBy(t => (t._1, t._2)).take(2)
      math.floor((ds(1)._1.toDouble - ds(0)._1.toDouble) / ds(1)._1.toDouble * 1e9 + 0.5).toLong
    }
    val row = queries.Extras206.embedNnMargin(spark, sf).collect().head
    assert(row.getLong(0) == probes.length.toLong)
    assert(math.abs(row.getDouble(1) - mqs.map(BigInt(_)).sum.toDouble / 1e9 / probes.length) < 1e-6)
    assert(math.abs(row.getDouble(2) - mqs.min / 1e9) < 1e-6)
    assert(math.abs(row.getDouble(3) - mqs.count(_ < 5e7).toDouble / probes.length) < 1e-6)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1)
  }

  test("stat_partial_spearman: midrank-moment replay; |rho| <= 1") {
    val xs = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getDouble(0).toLong, cents(r.getDouble(1)), math.round(r.getDouble(2) * 100)))
    val n = xs.length
    def ranks2(v: Seq[Long]): Map[Long, Long] = {
      val hist = v.groupBy(identity).toSeq.sortBy(_._1)
      var c = 0L
      hist.map { case (value, g) =>
        val r2 = 2 * c + g.size + 1; c += g.size; (value, r2)
      }.toMap
    }
    val rx = ranks2(xs.map(_._1)); val ry = ranks2(xs.map(_._2)); val rz = ranks2(xs.map(_._3))
    val trip = xs.map(t => (rx(t._1), ry(t._2), rz(t._3)))
    def corr(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long): Double = {
      val sa = trip.map(t => BigInt(f(t))).sum; val sb = trip.map(t => BigInt(g(t))).sum
      val saa = trip.map(t => BigInt(f(t)) * BigInt(f(t))).sum
      val sbb = trip.map(t => BigInt(g(t)) * BigInt(g(t))).sum
      val sab = trip.map(t => BigInt(f(t)) * BigInt(g(t))).sum
      (n.toDouble * sab.toDouble - sa.toDouble * sb.toDouble) /
        math.sqrt((n.toDouble * saa.toDouble - sa.toDouble * sa.toDouble) *
          (n.toDouble * sbb.toDouble - sb.toDouble * sb.toDouble))
    }
    val rxy = corr(_._1, _._2); val rxz = corr(_._1, _._3); val ryz = corr(_._2, _._3)
    val rp = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val row = queries.Extras206.statPartialSpearman(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rxy) < 1e-5)
    assert(math.abs(row.getDouble(2) - rp) < 1e-5)
    assert(math.abs(row.getDouble(2)) <= 1)
  }
}
