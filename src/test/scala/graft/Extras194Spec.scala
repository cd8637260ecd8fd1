package graft

/** Wave-94 properties: richness battery, two-sample Anderson–Darling,
  * Goodman–Kruskal tau, bimodality coefficient vs brute force.
  */
class Extras194Spec extends SparkSpec {

  test("text_richness_battery: (N,V,V1,V2) replay per source") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    val rows = queries.Extras194.textRichnessBattery(spark, sf).collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val toks = bySrc(r.getString(0)).flatMap(_._2.split(" ", -1))
      val tf = toks.groupBy(identity).view.mapValues(_.size).toMap
      val nTok = toks.size.toLong; val v = tf.size.toLong
      val v1 = tf.count(_._2 == 1).toLong; val v2 = tf.count(_._2 == 2).toLong
      assert(r.getLong(1) == nTok && r.getLong(2) == v && r.getLong(3) == v1 && r.getLong(4) == v2)
      assert(math.abs(r.getDouble(5) - v / math.sqrt(nTok.toDouble)) < 1e-5)
      assert(math.abs(r.getDouble(6) - math.log(v.toDouble) / math.log(nTok.toDouble)) < 1e-6)
      if (v1 != v)
        assert(math.abs(r.getDouble(7) - 100 * math.log(nTok.toDouble) / (1 - v1.toDouble / v)) < 1e-3)
      assert(math.abs(r.getDouble(8) - v2.toDouble / v) < 1e-6)
    }
  }

  test("stat_ad_two_sample: Scholz-Stephens midrank replay; A2 finite") {
    val xs = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toInt))
      .filter(p => p._1 == "A" || p._1 == "R")
    val hist = xs.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.count(_._1 == "A").toLong, g.count(_._1 == "R").toLong) }
    val n1 = hist.map(_._1).sum; val n2 = hist.map(_._2).sum; val nn = n1 + n2
    var b = 0L; var m1 = 0L; var m2 = 0L; var s1 = 0L; var s2 = 0L
    hist.foreach { case (l1, l2) =>
      val l = l1 + l2
      val den = BigInt(2 * b + l) * BigInt(2 * nn - 2 * b - l) - BigInt(nn) * BigInt(l)
      if (den != 0) {
        def term(mi: Long, li: Long, ni: Long): Double = {
          val x = nn.toDouble * (2 * mi + li) - ni.toDouble * (2 * b + l)
          l.toDouble * x * x / den.toDouble / ni
        }
        s1 += math.floor(term(m1, l1, n1) * 1e6 + 0.5).toLong
        s2 += math.floor(term(m2, l2, n2) * 1e6 + 0.5).toLong
      }
      b += l; m1 += l1; m2 += l2
    }
    val a2 = (nn.toDouble - 1) / nn / nn * ((s1 + s2) / 1e6)
    val row = queries.Extras194.statAdTwoSample(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - a2) < 1e-5)
    assert(!row.getDouble(2).isNaN && row.getDouble(2) > -2)
  }

  test("stat_gk_tau: PRE replay; tau in [0, 1]") {
    val docs = Tables.documents(spark, sf).select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mx = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val my = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def tau(cond: Map[String, Seq[(String, Long)]], marg: Map[String, Long],
            targMarg: Map[String, Long]): Double = {
      val sumQ = cond.map { case (x, g) =>
        val sm2 = g.map(c => BigInt(c._2) * BigInt(c._2)).sum
        math.floor(sm2.toDouble / marg(x) / n * 1e9 + 0.5).toLong
      }.sum
      val st2 = targMarg.values.map(v => BigInt(v) * BigInt(v)).sum
      (sumQ / 1e9 - st2.toDouble / n / n) / (1 - st2.toDouble / n / n)
    }
    val byX = cells.toSeq.groupBy(_._1._2).view.mapValues(_.map(c => (c._1._1, c._2)).toSeq).toMap
    val byY = cells.toSeq.groupBy(_._1._1).view.mapValues(_.map(c => (c._1._2, c._2)).toSeq).toMap
    val tYX = tau(byX, mx, my); val tXY = tau(byY, my, mx)
    val row = queries.Extras194.statGkTau(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - tYX) < 1e-5)
    assert(math.abs(row.getDouble(2) - tXY) < 1e-5)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= 1)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
  }

  test("stat_bimodality_coeff: central-moment replay; BC in (0, 1]") {
    val cv = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val n = cv.length
    val sn = cv.map(BigInt(_)).sum
    val u = cv.map(c => math.floor((BigInt(n) * BigInt(c) - sn).toDouble / n + 0.5).toLong)
    val m2 = u.map(x => BigInt(x) * BigInt(x)).sum
    val m3 = u.map(x => BigInt(x) * BigInt(x) * BigInt(x)).sum
    val m4 = u.map(x => BigInt(x) * BigInt(x) * BigInt(x) * BigInt(x)).sum
    val g1 = m3.toDouble / n / math.pow(m2.toDouble / n, 1.5)
    val g2 = m4.toDouble / n / (m2.toDouble / n * (m2.toDouble / n)) - 3
    val bc = (g1 * g1 + 1) / (g2 + 3.0 * (n - 1) * (n - 1) / ((n - 2).toDouble * (n - 3)))
    val row = queries.Extras194.statBimodalityCoeff(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - g1) < 1e-5)
    assert(math.abs(row.getDouble(2) - g2) < 1e-5)
    assert(math.abs(row.getDouble(3) - bc) < 1e-5)
    assert(row.getDouble(3) > 0 && row.getDouble(3) <= 1)
  }
}
