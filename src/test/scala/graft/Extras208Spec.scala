package graft

/** Wave-108 properties: brute-force replays of the rank/normal-scores
  * battery at sf0.001 (midranks, Acklam scores, and the closed forms
  * recomputed driver-side from the raw rows).
  */
class Extras208Spec extends SparkSpec {

  /** Acklam's inverse normal — the same rational polynomial the SQL
    * fragment evaluates, in Scala.
    */
  private def qnorm(p: Double): Double = {
    if (p < 0.02425) {
      val q = math.sqrt(-2 * math.log(p))
      (((((-7.784894002430293e-03 * q - 3.223964580411365e-01) * q
        - 2.400758277161838e+00) * q - 2.549732539343734e+00) * q
        + 4.374664141464968e+00) * q + 2.938163982698783e+00) /
        ((((7.784695709041462e-03 * q + 3.224671290700398e-01) * q
          + 2.445134137142996e+00) * q + 3.754408661907416e+00) * q + 1)
    } else if (p > 1 - 0.02425) {
      -qnorm(1 - p)
    } else {
      val q = p - 0.5
      val r = q * q
      (((((-3.969683028665376e+01 * r + 2.209460984245205e+02) * r
        - 2.759285104469687e+02) * r + 1.383577518672690e+02) * r
        - 3.066479806614716e+01) * r + 2.506628277459239e+00) * q /
        (((((-5.447609879822406e+01 * r + 1.615858368580409e+02) * r
          - 1.556989798598866e+02) * r + 6.680131188771972e+01) * r
          - 1.328068155288572e+01) * r + 1)
    }
  }

  /** value -> ×2 midrank over the combined multiset given per-value counts. */
  private def mid2Of(hist: Map[Int, Long]): Map[Int, Long] = {
    var c = 0L
    hist.toSeq.sortBy(_._1).map { case (v, w) =>
      val m = 2 * c + w + 1; c += w; v -> m
    }.toMap
  }

  private lazy val liQty: Array[(String, Int)] =
    Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))

  test("stat_dunn_posthoc: pairwise z replay; 10 pairs; symmetric sign") {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val xs = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity").collect()
      .map(r => (od(r.getLong(0)), r.getDouble(1).toInt))
    val hist = xs.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val mid2 = mid2Of(hist)
    val n = xs.length.toLong
    val t3 = hist.values.map(w => w.toDouble * w * w - w).sum
    val byG = xs.groupBy(_._1).map { case (g, rows) =>
      g -> (rows.length.toLong, rows.map(r => mid2(r._2)).sum)
    }
    val rows = queries.Extras208.statDunnPosthoc(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (na, r2a) = byG(r.getString(0)); val (nb, r2b) = byG(r.getString(1))
      assert(r.getLong(2) == na && r.getLong(3) == nb)
      val v = (n.toDouble * (n + 1) / 12.0 - t3 / (12.0 * (n - 1))) * (1.0 / na + 1.0 / nb)
      val z = (r2a.toDouble / (2 * na) - r2b.toDouble / (2 * nb)) / math.sqrt(v)
      assert(math.abs(r.getDouble(4) - z) < 1e-3, s"${r.getString(0)} vs ${r.getString(1)}")
      assert(r.getBoolean(5) == (math.abs(z) > 2.8070337683438042 - 1e-9) ||
        math.abs(math.abs(z) - 2.807) < 1e-2)
    }
  }

  test("stat_van_der_waerden: normal-scores T1 replay") {
    val hist = liQty.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val mid2 = mid2Of(hist)
    val n = liQty.length.toLong
    def sq(v: Int): Long = math.round(math.floor(qnorm(mid2(v).toDouble / (2.0 * (n + 1))) * 1e6 + 0.5))
    val byG = liQty.groupBy(_._1).map { case (g, rows) =>
      g -> (rows.length.toLong, rows.map(r => BigInt(sq(r._2))).sum)
    }
    val s2 = liQty.map(r => BigInt(sq(r._2)) * sq(r._2)).sum
    val t1 = byG.values.map { case (ng, sa) => sa.toDouble * sa.toDouble / ng }.sum *
      (n - 1) / s2.toDouble
    val row = queries.Extras208.statVanDerWaerden(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - t1) < 1e-2)
    assert(row.getBoolean(3) == (t1 > 5.991464547107979) ||
      math.abs(t1 - 5.99) < 0.05)
  }

  test("stat_klotz: squared-scores z replay") {
    val ar = liQty.filter(p => p._1 == "A" || p._1 == "R")
    val hist = ar.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val mid2 = mid2Of(hist)
    val n = ar.length.toLong
    def kq(v: Int): Long = {
      val s = math.round(math.floor(qnorm(mid2(v).toDouble / (2.0 * (n + 1))) * 1e4 + 0.5))
      s * s
    }
    val t = ar.filter(_._1 == "A").map(r => BigInt(kq(r._2))).sum
    val sw = ar.map(r => BigInt(kq(r._2))).sum
    val sw2 = ar.map(r => BigInt(kq(r._2)) * kq(r._2)).sum
    val n1 = ar.count(_._1 == "A").toLong; val n2 = n - n1
    val z = (t.toDouble - n1.toDouble * sw.toDouble / n) /
      math.sqrt(n1.toDouble * n2 * (n.toDouble * sw2.toDouble - sw.toDouble * sw.toDouble) /
        (n.toDouble * n * (n - 1)))
    val row = queries.Extras208.statKlotz(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
  }

  test("stat_fligner_killeen: median-centered scores chi2 replay; x2 >= 0") {
    val byG = liQty.groupBy(_._1)
    val meds = byG.map { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val tot = sorted.length
      // min v with 2*cum >= tot over the value histogram
      val h = rows.groupBy(_._2).map { case (v, gg) => v -> gg.length.toLong }
      var c = 0L
      g -> h.toSeq.sortBy(_._1).collectFirst {
        case (v, w) if { c += w; 2 * c >= tot } => v
      }.get
    }
    val ds = liQty.map { case (g, v) => (g, math.abs(v - meds(g))) }
    val hist = ds.groupBy(_._2).map { case (dv, g) => dv -> g.length.toLong }
    val mid2 = mid2Of(hist)
    val n = ds.length.toLong
    def aq(dv: Int): Long =
      math.round(math.floor(qnorm(0.5 + mid2(dv).toDouble / (4.0 * (n + 1))) * 1e6 + 0.5))
    val sw = ds.map(r => BigInt(aq(r._2))).sum
    val sw2 = ds.map(r => BigInt(aq(r._2)) * aq(r._2)).sum
    val abar = sw.toDouble / n
    val v2 = (sw2.toDouble - sw.toDouble * sw.toDouble / n) / (n - 1)
    val x2 = ds.groupBy(_._1).values.map { rows =>
      val ng = rows.length.toLong
      val sa = rows.map(r => BigInt(aq(r._2))).sum
      ng * math.pow(sa.toDouble / ng - abar, 2)
    }.sum / v2
    val row = queries.Extras208.statFlignerKilleen(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - x2) < 1e-2)
    assert(row.getDouble(1) >= 0)
  }
}
