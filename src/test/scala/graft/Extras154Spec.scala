package graft

import org.apache.spark.sql.functions._

/** Wave-54 properties: SampEn, ARCH LM, Hopkins, Kish deff replays
  * against definitional brute force on sf0.001.
  */
class Extras154Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def dailySeries(): Seq[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)

  test("time_sample_entropy: O(n^2) brute-force template match replay") {
    val x = dailySeries()
    val n = x.length
    val mean = x.map(BigInt(_)).sum.toDouble / n
    val varr = x.map(c => (c - mean) * (c - mean)).sum / n
    // replicate the query's exact-variance r (cleared form)
    val sc = x.map(BigInt(_)).sum
    val qc = x.map(c => BigInt(c) * c).sum
    val r = 0.2 * math.sqrt((BigInt(n) * qc - sc * sc).toDouble / (n.toDouble * n))
    assert(math.abs(r - 0.2 * math.sqrt(varr)) / r < 1e-9)
    val t = (0 until n - 2).map(i => (x(i), x(i + 1), x(i + 2)))
    var b = 0L; var a = 0L
    for (i <- t.indices; j <- i + 1 until t.length) {
      if (math.abs(t(j)._1 - t(i)._1) <= r && math.abs(t(j)._2 - t(i)._2) <= r) {
        b += 1
        if (math.abs(t(j)._3 - t(i)._3) <= r) a += 1
      }
    }
    val row = queries.Extras154.timeSampleEntropy(spark, sf).collect().head
    assert(row.getLong(0) == b && row.getLong(1) == a)
    assert(math.abs(row.getDouble(2) - (-math.log(a.toDouble / b))) < 1e-5)
  }

  test("stat_arch_lm: definitional squared-deviation regression replay") {
    val x = dailySeries()
    val n = x.length
    val fmean = x.map(BigInt(_)).sum / n // integer floor mean, as the query
    // r12: |e| quantized DOWN by 1e5 before squaring, as the query (the
    // raw e^2 cross-products overflowed DECIMAL(38,0) from sf0.1 up)
    val u = x.map { c =>
      val eq = (BigInt(c) - fmean).abs / 100000
      eq * eq
    }
    val pairs = u.zip(u.tail)
    val m = pairs.length
    def d(b: BigInt) = b.toDouble
    val su = pairs.map(_._1).sum; val sv = pairs.map(_._2).sum
    val suv = pairs.map(p => p._1 * p._2).sum
    val suu = pairs.map(p => p._1 * p._1).sum
    val svv = pairs.map(p => p._2 * p._2).sum
    val cuv = d(BigInt(m) * suv - su * sv)
    val cuu = d(BigInt(m) * suu - su * su)
    val cvv = d(BigInt(m) * svv - sv * sv)
    val r2 = cuv * cuv / (cuu * cvv)
    val row = queries.Extras154.statArchLm(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - r2) < 1e-5)
    assert(math.abs(row.getDouble(2) - m * r2) < 1e-2)
    assert(row.getBoolean(3) == (m * r2 > 3.841))
  }

  test("embed_hopkins_statistic: brute-force NN replay; H in (0,1)") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e9 + 0.5).toLong).toArray))
      .sortBy(_._1)
    val dims = vecs.head._2.length
    val lo = Array.tabulate(dims)(j => vecs.map(_._2(j)).min)
    val hi = Array.tabulate(dims)(j => vecs.map(_._2(j)).max)
    def hex6(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(6), 16)
    }
    def q(d2: BigInt): Long =
      math.floor(math.sqrt(d2.toDouble) / 1000 + 0.5).toLong
    val su = (0 until 50).map { p =>
      val sf0 = Array.tabulate(dims) { j =>
        val u01 = hex6(s"hp:$p:$j").toDouble / 16777216.0
        lo(j) + math.floor(u01 * (hi(j) - lo(j)) + 0.5).toLong
      }
      q(vecs.map(v => (0 until dims)
        .map(j => BigInt(sf0(j) - v._2(j)) * (sf0(j) - v._2(j))).sum).min)
    }.sum
    val sw = vecs.filter(_._1 < 50).map { case (id, f) =>
      q(vecs.filter(_._1 != id).map(v => (0 until dims)
        .map(j => BigInt(f(j) - v._2(j)) * (f(j) - v._2(j))).sum).min)
    }.sum
    val row = queries.Extras154.embedHopkinsStatistic(spark, sf).collect().head
    assert(row.getLong(0) == 50L)
    assert(row.getLong(1) == su && row.getLong(2) == sw)
    assert(math.abs(row.getDouble(3) - su.toDouble / (su + sw)) < 1e-6)
    assert(row.getDouble(3) > 0 && row.getDouble(3) < 1)
  }

  test("sample_kish_deff: per-source replay; deff >= 1") {
    val docs = Tables.documents(spark, sf).select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = queries.Extras154.sampleKishDeff(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val ws = docs.filter(_._1 == r.getString(0)).map(_._2)
      val n = ws.length; val sw = ws.sum.toDouble; val sw2 = ws.map(w => w.toDouble * w).sum
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - n * sw2 / (sw * sw)) < 1e-5)
      assert(r.getDouble(2) >= 1.0 - 1e-9)
      assert(math.abs(r.getDouble(3) - sw * sw / sw2) < 1e-2)
    }
  }
}
