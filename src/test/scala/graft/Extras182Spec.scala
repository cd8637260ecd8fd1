package graft

import org.apache.spark.sql.functions._

/** Wave-82 properties: spectral decay, diagonal Mahalanobis, norm-
  * length correlation, D'Agostino K² replayed against brute force.
  */
class Extras182Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def vecs(): Array[(Long, Array[Long])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e9 + 0.5).toLong).toArray))

  test("embed_spectral_decay: log-log OLS slope replay; slope <= 0") {
    val vs = vecs().map(_._2); val n = vs.length; val dims = vs.head.length
    val variances = (0 until dims).map { j =>
      val col0 = vs.map(_(j).toDouble)
      val s = col0.sum; val q = col0.map(x => x * x).sum
      (n * q - s * s) / (n.toDouble * n) / 1e18
    }
    val sorted = variances.sortBy(-_)
    val xs = sorted.indices.map(i => math.log(i + 1.0))
    val ys = sorted.map(math.log)
    def qz(v: Double) = math.floor(v * 1e9 + 0.5) / 1e9
    val k = xs.length
    val sx = xs.map(qz).sum; val sy = ys.map(qz).sum
    val sxx = xs.map(x => qz(x * x)).sum; val sxy = xs.indices.map(i => qz(xs(i) * ys(i))).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val row = queries.Extras182.embedSpectralDecay(spark, sf).collect().head
    assert(row.getLong(0) == dims.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-4)
    assert(row.getDouble(1) <= 0)
    assert(math.abs(row.getDouble(2) - sy / k) < 1e-4)
  }

  test("embed_mahalanobis_diag: per-vector D2 replay; mean near d") {
    val vs = vecs(); val n = vs.length; val dims = vs.head._2.length
    val mu = (0 until dims).map(j => vs.map(_._2(j).toDouble).sum / n / 1e9)
    val s2 = (0 until dims).map { j =>
      val col0 = vs.map(_._2(j).toDouble)
      val s = col0.sum; val q = col0.map(x => x * x).sum
      (n * q - s * s) / (n.toDouble * n) / 1e18
    }
    val d2 = vs.map { case (_, f) =>
      val q = (0 until dims).map { j =>
        val v = f(j) / 1e9
        math.floor((v - mu(j)) * (v - mu(j)) / s2(j) * 1e6 + 0.5).toLong
      }.sum
      q.toDouble / 1e6
    }
    val row = queries.Extras182.embedMahalanobisDiag(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    val meanD2 = d2.map(x => math.floor(x * 1e6 + 0.5).toLong).sum.toDouble / n / 1e6
    assert(math.abs(row.getDouble(1) - meanD2) < 1e-3)
    assert(row.getLong(2) == d2.count(_ > 93.2168).toLong)
    assert(math.abs(row.getDouble(1) - dims) < dims * 0.5) // mean D2 ~ d
  }

  test("embed_norm_quality_corr: exact-sum Pearson replay; |r| <= 1") {
    val norms = vecs().map { case (id, f) => (id, f.map(x => x * x).sum / 1000000000L) }.toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(d => norms.contains(d._1))
    // exact integer sums (the double-sum first attempt drifted at 1e18)
    val xs = docs.map(d => BigInt(norms(d._1)) - BigInt(1000000000L)); val ys = docs.map(d => BigInt(d._2))
    val n = xs.length
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val sxy = xs.indices.map(i => xs(i) * ys(i)).sum
    val r0 = (BigInt(n) * sxy - sx * sy).toDouble /
      math.sqrt((BigInt(n) * sxx - sx * sx).toDouble * (BigInt(n) * syy - sy * sy).toDouble)
    val row = queries.Extras182.embedNormQualityCorr(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - r0) < 1e-4)
    assert(math.abs(row.getDouble(1)) <= 1)
  }

  test("stat_dagostino_k2: standardized-moment omnibus replay") {
    val x = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).values.map(_.toDouble).toArray
    val n = x.length
    val mean = x.sum / n
    val q2 = x.map(v => (v - mean) * (v - mean)).sum
    val z = x.map(v => (v - mean) / math.sqrt(q2 / n))
    val g1 = z.map(v => math.floor(v * v * v * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / n
    val b2 = z.map(v => math.floor(v * v * v * v * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / n
    val row = queries.Extras182.statDagostinoK2(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - g1) < 1e-3)
    assert(math.abs(row.getDouble(2) - b2) < 1e-3)
    // transforms: replay the full closed forms
    val y = g1 * math.sqrt((n + 1.0) * (n + 3) / (6.0 * (n - 2)))
    val beta2 = 3.0 * (n.toDouble * n + 27 * n - 70) * (n + 1) * (n + 3) /
      ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    val w2 = math.sqrt(2 * (beta2 - 1)) - 1
    val delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    val alpha = math.sqrt(2 / (w2 - 1))
    val z1 = delta * math.log(y / alpha + math.sqrt(y * y / (alpha * alpha) + 1))
    val ek = 3.0 * (n - 1) / (n + 1)
    val vk = 24.0 * n * (n - 2.0) * (n - 3) / ((n + 1.0) * (n + 1) * (n + 3) * (n + 5))
    val beta1k = 6.0 * (n.toDouble * n - 5 * n + 2) / ((n + 7.0) * (n + 9)) *
      math.sqrt(6.0 * (n + 3) * (n + 5) / (n.toDouble * (n - 2) * (n - 3)))
    val aa = 6 + 8 / beta1k * (2 / beta1k + math.sqrt(1 + 4 / (beta1k * beta1k)))
    val xk = (b2 - ek) / math.sqrt(vk)
    val z2 = ((1 - 2.0 / (9 * aa)) -
      math.cbrt((1 - 2 / aa) / (1 + xk * math.sqrt(2 / (aa - 4))))) * math.sqrt(9 * aa / 2)
    assert(math.abs(row.getDouble(3) - z1) < 1e-3)
    assert(math.abs(row.getDouble(4) - z2) < 1e-3)
    assert(math.abs(row.getDouble(5) - (z1 * z1 + z2 * z2)) < 1e-2)
  }
}
