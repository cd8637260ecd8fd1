package graft

import org.apache.spark.sql.functions._

/** Wave-50 properties: silhouette, Bass OLS, PACF, Aroon replays
  * against definitional brute force on the sf0.001 corpus.
  */
class Extras150Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("embed_silhouette: double replay of the centroid silhouette; values in [-1,1]") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray))
    val dims = vecs.head._3.length
    val cent = vecs.groupBy(_._2).view.mapValues { g =>
      (g.length, Array.tabulate(dims)(j => g.map(_._3(j)).sum / g.length))
    }.toMap
    val sil = vecs.map { case (_, lab, v) =>
      val d = cent.view.mapValues { case (_, mu) =>
        math.sqrt((0 until dims).map(j => math.pow(v(j) - mu(j), 2)).sum)
      }.toMap
      val a = d(lab)
      val b = d.collect { case (l, x) if l != lab => x }.min
      lab -> (b - a) / math.max(a, b)
    }
    val expect = sil.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum / xs.length)).toMap
    val got = queries.Extras150.embedSilhouette(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (n, m) = expect(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - m) < 1e-5)
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("analytics_bass_diffusion: normal equations hold on the fitted coefficients") {
    val firsts = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(min(date_trunc("month", col("o_orderdate"))).as("mon"))
      .collect().map(_.getTimestamp(1))
    val monthly = firsts.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1.getTime)
    var cum = 0L
    val pts = monthly.map { case (_, n) => val c = cum; cum += n; (n, c) }
    // brute-force OLS on n = a + b*N + c*N^2 via the normal equations
    val s = Array.fill(5)(0.0); val t = Array.fill(3)(0.0)
    pts.foreach { case (n, bigN) =>
      var p = 1.0
      for (i <- 0 to 4) { s(i) += p; if (i <= 2) t(i) += n * p; p *= bigN }
    }
    def det3(a: Array[Array[Double]]): Double =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
      a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
      a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    val A = Array(Array(s(0), s(1), s(2)), Array(s(1), s(2), s(3)),
      Array(s(2), s(3), s(4)))
    val d0 = det3(A)
    def repl(j: Int): Double = {
      val m = A.map(_.clone)
      for (i <- 0 to 2) m(i)(j) = t(i)
      det3(m)
    }
    val (ea, eb, ec) = (repl(0) / d0, repl(1) / d0, repl(2) / d0)
    val row = queries.Extras150.analyticsBassDiffusion(spark, sf).collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(row.getLong(1) == cum)
    assert(math.abs(row.getDouble(2) - ea) < 1e-4 * math.max(1, math.abs(ea)))
    assert(math.abs(row.getDouble(3) - eb) < 1e-6 * math.max(1, math.abs(eb)))
    assert(math.abs(row.getDouble(4) - ec) < 1e-8)
    assert(row.getDouble(5) <= 1.0 + 1e-9)
  }

  test("time_pacf_durbin: brute-force ACF + Durbin-Levinson replay; pacf1 == rho1") {
    val days = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2.toDouble)
    val n = days.length
    val mean = days.sum / n
    val c = (0 to 3).map(k =>
      (0 until n - k).map(i => (days(i) - mean) * (days(i + k) - mean)).sum)
    val r1 = c(1) / c(0); val r2 = c(2) / c(0); val r3 = c(3) / c(0)
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 * (1 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    val row = queries.Extras150.timePacfDurbin(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - r1) < 1e-4)
    assert(math.abs(row.getDouble(2) - p22) < 1e-4)
    assert(math.abs(row.getDouble(3) - p33) < 1e-4)
  }

  test("win_aroon_oscillator: brute-force trailing-window argmax census") {
    val bars = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue, cents(r.getDouble(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) => xs.map(_._2).maxBy(t => (t._1, t._2))._3 }
    var nBull = 0L; var nBear = 0L; var oscSum = 0L; var lastOsc = 0L; var nB = 0L
    for (i <- 24 until bars.length) {
      val win = (i - 24 to i).map(j => (bars(j), j))
      val hi = win.maxBy(t => (t._1, t._2))._2
      val lo = win.minBy(t => (t._1, -t._2))._2
      val up = (24 - (i - hi)) * 100L
      val dn = (24 - (i - lo)) * 100L
      if (up > dn) nBull += 1
      if (up < dn) nBear += 1
      oscSum += up - dn; lastOsc = up - dn; nB += 1
    }
    val row = queries.Extras150.winAroonOscillator(spark, sf).collect().head
    assert(row.getLong(0) == nB)
    assert(row.getLong(1) == nBull && row.getLong(2) == nBear)
    assert(math.abs(row.getDouble(3) - oscSum.toDouble / nB / 24) < 1e-5)
    // query reports round(·, 6); allow the rounding quantum
    assert(math.abs(row.getDouble(4) - lastOsc.toDouble / 24) < 5e-7)
  }
}
