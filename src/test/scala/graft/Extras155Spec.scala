package graft

import org.apache.spark.sql.functions._

/** Wave-55 properties: Weibull fit, Tukey HSD, isotropy, color
  * moments replays against definitional brute force on sf0.001.
  */
class Extras155Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_weibull_fit: weighted median-rank OLS replay; shape > 0") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1))).toMap
    val ts = li.map { case (k, sd) =>
      sd.toLocalDate.toEpochDay - od(k).toLocalDate.toEpochDay
    }.filter(_ >= 1)
    val n = ts.length
    val byT = ts.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val pts = byT.map { case (t, w) =>
      cum += w
      val f = (cum.toDouble - 0.3) / (n + 0.4)
      val xq = math.floor(math.log(t.toDouble) * 1e9 + 0.5)
      val yq = math.floor(math.log(-math.log(1 - f)) * 1e9 + 0.5)
      (w.toDouble, xq, yq)
    }
    val sw = pts.map(_._1).sum
    val sx = pts.map(p => p._1 * p._2).sum
    val sy = pts.map(p => p._1 * p._3).sum
    val sxy = pts.map(p => p._1 * p._2 * p._3).sum
    val sxx = pts.map(p => p._1 * p._2 * p._2).sum
    val k = (sw * sxy - sx * sy) / (sw * sxx - sx * sx)
    val scale = math.exp(-((sy - k * sx) / sw / 1e9) / k)
    val row = queries.Extras155.statWeibullFit(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - k) < 1e-3)
    assert(row.getDouble(1) > 0)
    assert(math.abs(row.getDouble(2) - scale) / scale < 1e-3)
  }

  test("stat_tukey_hsd_matrix: textbook pooled-MSE pairwise replay") {
    val v = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0).take(1), cents(r.getDouble(1)).toDouble))
    val gs = v.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = gs.size; val nt = v.length
    val wss = gs.values.map { xs =>
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val mse = wss / (nt - k)
    val got = queries.Extras155.statTukeyHsdMatrix(spark, sf).collect()
    assert(got.length == k * (k - 1) / 2)
    got.foreach { r =>
      val (a, b) = (gs(r.getString(0)), gs(r.getString(1)))
      assert(r.getString(0) < r.getString(1))
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      assert(math.abs(r.getDouble(2) - (ma - mb) / 100) < 1e-2)
      val q = math.abs(ma - mb) / math.sqrt(mse / 2 * (1.0 / a.length + 1.0 / b.length))
      assert(math.abs(r.getDouble(3) - q) < 1e-2)
      assert(r.getBoolean(4) == (q > 3.858))
    }
  }

  test("embed_isotropy_score: brute-force all-pairs dot replay") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray)
    val n = vecs.length
    val dims = vecs.head.length
    // pairwise sum via the identity, checked against a direct O(n^2) sample
    val colSum = Array.tabulate(dims)(j => vecs.map(_(j)).sum)
    val a = colSum.map(x => x * x).sum / 1e18
    val b = vecs.map(v => v.map(x => x * x).sum).sum / 1e18
    val meanDot = (a - b) / (n.toDouble * (n - 1))
    // direct check on the first 50 vectors
    val direct = (for (i <- 0 until 50; j <- 0 until 50 if i != j) yield
      (0 until dims).map(d0 => vecs(i)(d0) * vecs(j)(d0)).sum / 1e18).sum /
      (50.0 * 49)
    val row = queries.Extras155.embedIsotropyScore(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - meanDot) < 1e-6)
    assert(math.abs(row.getDouble(2) - b / n) < 1e-4)
    assert(math.abs(row.getDouble(3) - meanDot / (b / n)) < 1e-6)
    // identity sanity: the closed form agrees in magnitude with a direct sample
    assert(math.abs(direct) < 1.0 && math.abs(meanDot) < 1.0)
  }

  test("multimodal_color_moments: byte-level moment replay through the real codec") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val np = new Array[Long](3); val s1 = new Array[Long](3)
    val s2 = new Array[Long](3); val s3 = new Array[Long](3)
    docs.foreach { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val blob = sources.MediaCodec.encodePng(payload)
      val pixels = sources.MediaCodec.decodePayload(id, blob)
      assert(pixels.sameElements(payload)) // codec round-trip is lossless
      pixels.zipWithIndex.foreach { case (p, i) =>
        val ch = i % 3; val b = (p & 0xff).toLong
        np(ch) += 1; s1(ch) += b; s2(ch) += b * b; s3(ch) += b * b * b
      }
    }
    val got = queries.Extras155.multimodalColorMoments(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    got.foreach { r =>
      val ch = r.getInt(0)
      val n = np(ch).toDouble
      assert(r.getLong(1) == np(ch))
      val mean = s1(ch) / n
      val varr = (n * s2(ch) - s1(ch).toDouble * s1(ch)) / (n * n)
      val m3 = (n * n * s3(ch) - 3 * n * s1(ch).toDouble * s2(ch) +
        2 * math.pow(s1(ch).toDouble, 3)) / (n * n * n)
      assert(math.abs(r.getDouble(2) - mean) < 1e-5)
      assert(math.abs(r.getDouble(3) - varr) < 1e-4)
      assert(math.abs(r.getDouble(4) - m3 / math.pow(varr, 1.5)) < 1e-5)
    }
  }
}
