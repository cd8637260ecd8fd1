package graft

/** Wave-93 properties: bullwhip ratio, Balassa RCA, safety stock, and
  * rank churn replayed against brute force at sf0.001.
  */
class Extras193Spec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("analytics_bullwhip_ratio: CV^2 replay; ratio = cv2o/cv2s") {
    def cv2(daily: Seq[Long]): Double = {
      val n = daily.size
      val s = daily.map(BigInt(_)).sum; val q = daily.map(x => BigInt(x) * BigInt(x)).sum
      ((q.toDouble - s.toDouble * s.toDouble / n) / n) / (s.toDouble / n * (s.toDouble / n))
    }
    val od = Tables.orders(spark, sf).select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, cents(r.getDouble(1))))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val sd = Tables.lineitem(spark, sf).select("l_shipdate", "l_extendedprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, cents(r.getDouble(1))))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val row = queries.Extras193.analyticsBullwhipRatio(spark, sf).collect().head
    assert(row.getLong(0) == od.size.toLong && row.getLong(1) == sd.size.toLong)
    assert(math.abs(row.getDouble(2) - cv2(od)) < 1e-5)
    assert(math.abs(row.getDouble(3) - cv2(sd)) < 1e-5)
    assert(math.abs(row.getDouble(4) - cv2(od) / cv2(sd)) < 1e-4)
  }

  test("analytics_balassa_rca: full-matrix replay; share-weighted mean RCA = 1 per nation") {
    val li = Tables.lineitem(spark, sf).select("l_suppkey", "l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), cents(r.getDouble(2))))
    val natOf = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val clsOf = Tables.part(spark, sf).select("p_partkey", "p_type").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")(0))).toMap
    val cells = li.map(l => ((natOf(l._1), clsOf(l._2)), BigInt(l._3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val xn = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val xc = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val xt = cells.values.sum
    val rows = queries.Extras193.analyticsBalassaRca(spark, sf).collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val k = (r.getInt(0), r.getString(1))
      val exp = cells(k).toDouble * xt.toDouble / (xn(k._1).toDouble * xc(k._2).toDouble)
      assert(math.abs(r.getDouble(2) - exp) < 1e-5)
    }
    // weighting RCA by GLOBAL class shares telescopes to Σ_c x_nc/x_n = 1
    // (up to the 6dp rounding of each emitted cell)
    rows.groupBy(_.getInt(0)).foreach { case (nk, g) =>
      val w = g.map(r => xc(r.getString(1)).toDouble / xt.toDouble * r.getDouble(2)).sum
      assert(math.abs(w - 1.0) < 1e-3)
    }
  }

  test("analytics_safety_stock: per-brand moment replay; ROP = 7mu + SS") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_shipdate", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate, r.getDouble(2).toLong))
    val brandOf = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val daily = li.map(l => ((brandOf(l._1), l._2), l._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((b, _), q) => (b, q) }
    val rows = queries.Extras193.analyticsSafetyStock(spark, sf).collect()
    val byBrand = daily.groupBy(_._1)
    assert(rows.length == byBrand.size)
    rows.foreach { r =>
      val g = byBrand(r.getString(0)).map(_._2)
      val n = g.size
      val su = g.map(BigInt(_)).sum; val qq = g.map(x => BigInt(x) * BigInt(x)).sum
      val mu = su.toDouble / n
      val sd = math.sqrt((qq.toDouble - su.toDouble * su.toDouble / n) / n)
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - mu) < 1e-5)
      assert(math.abs(r.getDouble(3) - 1.645 * sd * math.sqrt(7.0)) < 1e-4)
      assert(math.abs(r.getDouble(4) - (mu * 7 + 1.645 * sd * math.sqrt(7.0))) < 1e-4)
    }
  }

  test("analytics_rank_churn: two-year rank replay; top10_overlap <= 10") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_shipdate", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).getYear, cents(r.getDouble(2))))
    val brandOf = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def ranks(yr: Int): Map[String, Int] = li.filter(_._2 == yr)
      .map(l => (brandOf(l._1), BigInt(l._3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (b, rev) => (-rev, b) }
      .zipWithIndex.map { case ((b, _), i) => (b, i + 1) }.toMap
    val r1 = ranks(1995); val r2 = ranks(1996)
    val common = r1.keySet.intersect(r2.keySet).toSeq
    val sad = common.map(b => math.abs(r1(b) - r2(b)).toLong).sum
    val mx = common.map(b => math.abs(r1(b) - r2(b)).toLong).max
    val ov = common.count(b => r1(b) <= 10 && r2(b) <= 10).toLong
    val row = queries.Extras193.analyticsRankChurn(spark, sf).collect().head
    assert(row.getLong(0) == common.size.toLong)
    assert(math.abs(row.getDouble(1) - sad.toDouble / common.size) < 1e-6)
    assert(row.getLong(2) == mx && row.getLong(3) == ov)
    assert(ov <= 10)
  }
}
