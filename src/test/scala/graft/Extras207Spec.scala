package graft

/** Wave-107 properties: Hill numbers, non-inferiority, ANCOVA, Sobel
  * mediation vs brute force at sf0.001.
  */
class Extras207Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("text_hill_numbers: q0 >= q1 >= q2 ordering; replay") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = queries.Extras207.textHillNumbers(spark, sf).collect()
    val bySrc = docs.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val toks = bySrc(r.getString(0)).flatMap(_._2.split(" ", -1))
      val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val hq = tf.values.map(m =>
        math.floor(m.toDouble * math.log(n.toDouble / m) * 1e9 + 0.5).toLong).sum
      val m2 = tf.values.map(m => BigInt(m) * BigInt(m)).sum
      assert(r.getLong(1) == n && r.getLong(2) == tf.size.toLong)
      assert(math.abs(r.getDouble(3) - math.exp(hq / 1e9 / n)) < 1e-2)
      assert(math.abs(r.getDouble(4) - n.toDouble * n / m2.toDouble) < 1e-2)
      assert(r.getLong(2) >= r.getDouble(3) - 1e-6 && r.getDouble(3) >= r.getDouble(4) - 1e-6)
    }
  }

  test("stat_noninferiority_prop: exact count replay") {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate)).toMap
    val xs = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate", "l_discount").collect()
      .map { r =>
        val lead = java.time.temporal.ChronoUnit.DAYS.between(
          od(r.getLong(0)), r.getAs[java.time.LocalDateTime](1).toLocalDate)
        (math.round(r.getDouble(2) * 100) >= 5, lead <= 30)
      }
    val g1 = xs.filter(_._1); val g2 = xs.filterNot(_._1)
    val p1 = g1.count(_._2).toDouble / g1.size; val p2 = g2.count(_._2).toDouble / g2.size
    val z = (p1 - p2 + 0.02) / math.sqrt(p1 * (1 - p1) / g1.size + p2 * (1 - p2) / g2.size)
    val row = queries.Extras207.statNoninferiorityProp(spark, sf).collect().head
    assert(row.getLong(0) == g1.size.toLong && row.getLong(1) == g2.size.toLong)
    assert(math.abs(row.getDouble(2) - p1) < 1e-6)
    assert(math.abs(row.getDouble(3) - p2) < 1e-6)
    assert(math.abs(row.getDouble(4) - z) < 1e-3)
    assert(row.getBoolean(5) == (z > 1.645))
  }

  test("stat_ancova_adjusted: pooled-slope F replay; F >= 0") {
    val xs = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong, cents(r.getDouble(2))))
    def cm(g: Seq[(Long, Long)]): (Double, Double, Double) = {
      val n = g.size
      val sx = g.map(t => BigInt(t._1)).sum; val sy = g.map(t => BigInt(t._2)).sum
      val sxx = g.map(t => BigInt(t._1) * BigInt(t._1)).sum
      val sxy = g.map(t => BigInt(t._1) * BigInt(t._2)).sum
      val syy = g.map(t => BigInt(t._2) * BigInt(t._2)).sum
      (sxx.toDouble - sx.toDouble * sx.toDouble / n,
        sxy.toDouble - sx.toDouble * sy.toDouble / n,
        syy.toDouble - sy.toDouble * sy.toDouble / n)
    }
    val grps = xs.groupBy(_._1).values.map(g => cm(g.map(t => (t._2, t._3)))).toSeq
    val wxx = grps.map(t => math.floor(t._1 * 1e3 + 0.5)).sum / 1e3
    val wxy = grps.map(t => math.floor(t._2 * 1e3 + 0.5)).sum / 1e3
    val wyy = grps.map(t => math.floor(t._3 / 1e6 + 0.5)).sum * 1e6
    val (txx, txy, tyy) = cm(xs.map(t => (t._2, t._3)))
    val k = grps.size; val n = xs.length
    val sseFull = wyy - wxy * wxy / wxx
    val sseCov = tyy - txy * txy / txx
    val f = ((sseCov - sseFull) / (k - 1)) / (sseFull / (n - k - 1))
    val row = queries.Extras207.statAncovaAdjusted(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - wxy / wxx / 100) < 1e-5)
    assert(math.abs(row.getDouble(3) - f) / math.max(f, 1) < 1e-3)
    assert(row.getDouble(3) >= 0)
  }

  test("stat_sobel_mediation: moment-algebra replay; shares consistent") {
    val xs = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100), cents(r.getDouble(2))))
    val n = xs.length
    def c(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long): Double = {
      val sa = xs.map(t => BigInt(f(t))).sum; val sb = xs.map(t => BigInt(g(t))).sum
      val sab = xs.map(t => BigInt(f(t)) * BigInt(g(t))).sum
      sab.toDouble - sa.toDouble * sb.toDouble / n
    }
    val cxx = c(_._1, _._1); val cmm = c(_._2, _._2); val cyy = c(_._3, _._3)
    val cxm = c(_._1, _._2); val cxy = c(_._1, _._3); val cmy = c(_._2, _._3)
    val a = cxm / cxx
    val seA2 = (cmm - cxm * cxm / cxx) / (n - 2) / cxx
    val det = cxx * cmm - cxm * cxm
    val b = (cxx * cmy - cxm * cxy) / det
    val bx = (cmm * cxy - cxm * cmy) / det
    val sse = cyy - bx * cxy - b * cmy
    val seB2 = sse / (n - 3) * cxx / det
    val z = a * b / math.sqrt(a * a * seB2 + b * b * seA2)
    val row = queries.Extras207.statSobelMediation(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - a) < 1e-5)
    assert(math.abs(row.getDouble(2) - b / 100) < 1e-4)
    assert(math.abs(row.getDouble(3) - a * b / (cxy / cxx)) < 1e-4)
    assert(math.abs(row.getDouble(4) - z) < 1e-2)
  }
}
