package graft

/** Wave-98 properties: Passing–Bablok, Bland–Altman, Allan variance,
  * bias-corrected Cramér's V vs brute force at sf0.001.
  */
class Extras198Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  private def brandXY(): Seq[(String, Double, Double)] = {
    val cat = Tables.part(spark, sf).select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1).toString, cents(r.getDouble(2))))
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)), r.getDouble(2).toLong))
    val sizeOf = cat.map(c => (c._1, c._2)).toMap
    val x = cat.groupBy(_._2).view.mapValues(g => g.map(c => BigInt(c._3)).sum.toDouble / g.size).toMap
    val yAgg = li.map(l => (sizeOf(l._1), (BigInt(l._2), l._3)))
      .groupBy(_._1).view.mapValues { g =>
        g.map(_._2._1).sum.toDouble / g.map(_._2._2).sum }.toMap
    x.keySet.intersect(yAgg.keySet).toSeq.sorted.map(b => (b, x(b), yAgg(b)))
  }

  test("stat_passing_bablok: K-shifted median slope replay") {
    val pts = brandXY()
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1 && pts(i)._2 != pts(j)._2
      sl = (pts(j)._3 - pts(i)._3) / (pts(j)._2 - pts(i)._2) if sl != -1.0
    } yield (sl, pts(i)._1, pts(j)._1)).sortBy(t => (t._1, t._2, t._3))
    val nsl = slopes.size
    val k = slopes.count(_._1 < -1.0)
    def clamp(r: Long): Int = math.min(math.max(r, 1L), nsl.toLong).toInt
    val b = if (nsl % 2 == 1) slopes(clamp((nsl + 1) / 2 + k) - 1)._1
      else {
        val picks = Set(clamp(nsl / 2 + k), clamp(nsl / 2 + 1 + k))
        picks.map(r => slopes(r - 1)._1).sum / picks.size
      }
    val resid = pts.map(p => (p._3 - b * p._2, p._1)).sortBy(t => (t._1, t._2)).map(_._1)
    val nb = pts.size
    val a = if (nb % 2 == 1) resid((nb + 1) / 2 - 1)
      else (resid(nb / 2 - 1) + resid(nb / 2)) / 2
    val row = queries.Extras198.statPassingBablok(spark, sf).collect().head
    assert(row.getLong(0) == nb.toLong && row.getLong(1) == nsl.toLong)
    assert(math.abs(row.getDouble(2) - b) < 1e-5)
    assert(math.abs(row.getDouble(3) - a) < 1e-3)
  }

  test("stat_bland_altman: exact cent-diff moment replay; ~95% inside") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val tp = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)))).toMap
    val dds = li.groupBy(_._1).toSeq.collect { case (ok, g) if tp.contains(ok) =>
      g.map(_._2).sum - tp(ok) }
    val n = dds.size
    val sd = dds.map(BigInt(_)).sum; val qd = dds.map(x => BigInt(x) * BigInt(x)).sum
    val mu = sd.toDouble / n
    val sig = math.sqrt((qd.toDouble - sd.toDouble * sd.toDouble / n) / (n - 1))
    val inside = dds.count(dd => math.abs(dd - mu) <= 1.96 * sig)
    val row = queries.Extras198.statBlandAltman(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mu / 100) < 1e-3)
    assert(math.abs(row.getDouble(2) - (mu - 1.96 * sig) / 100) < 1e-3)
    assert(math.abs(row.getDouble(3) - (mu + 1.96 * sig) / 100) < 1e-3)
    assert(math.abs(row.getDouble(4) - inside.toDouble / n) < 1e-6)
    assert(row.getDouble(4) > 0.8 && row.getDouble(4) <= 1.0)
  }

  test("time_allan_variance: cluster-sum replay per tau") {
    val hourly = Tables.events(spark, sf).select("ts").collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).withMinute(0).withSecond(0).withNano(0))
      .groupBy(identity).toSeq.sortBy(_._1.toString).map(_._2.size.toLong)
    val rows = queries.Extras198.timeAllanVariance(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.foreach { r =>
      val tau = r.getLong(0).toInt
      val sums = hourly.grouped(tau).filter(_.size == tau).map(_.sum).toSeq
      val pairs = sums.sliding(2).filter(_.size == 2).toSeq
      val sq = pairs.map(p => BigInt(p(1) - p(0)) * BigInt(p(1) - p(0))).sum
      val av = sq.toDouble / (2 * pairs.size) / tau / tau
      assert(r.getLong(1) == pairs.size.toLong)
      assert(math.abs(r.getDouble(2) - av) < 1e-4)
    }
  }

  test("stat_cramers_v_corrected: corrected <= raw; both in [0,1]") {
    val docs = Tables.documents(spark, sf).select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mx = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val my = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rr = my.size; val cc = mx.size
    val chiQ = cells.map { case ((y, x), m) =>
      val e = mx(x).toDouble * my(y) / n
      math.floor((m - e) * (m - e) / e * 1e9 + 0.5).toLong
    }.sum
    val phi2 = chiQ / 1e9 / n
    val phi2t = math.max(0.0, phi2 - (rr - 1).toDouble * (cc - 1) / (n - 1))
    val rt = rr - (rr - 1).toDouble * (rr - 1) / (n - 1)
    val ct = cc - (cc - 1).toDouble * (cc - 1) / (n - 1)
    val v = math.sqrt(phi2 / math.min(rr - 1, cc - 1))
    val vt = math.sqrt(phi2t / math.min(rt - 1, ct - 1))
    val row = queries.Extras198.statCramersVCorrected(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == rr.toLong && row.getLong(2) == cc.toLong)
    assert(math.abs(row.getDouble(3) - v) < 1e-5)
    assert(math.abs(row.getDouble(4) - vt) < 1e-5)
    assert(row.getDouble(4) <= row.getDouble(3) + 1e-9)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }
}
