package graft

import org.apache.spark.sql.functions._

/** Wave-40 properties: BigInt brute-force replays for the composite
  * regression rows, the decomposition identity, and the HT draw.
  */
class Extras140Spec extends SparkSpec {

  private def daily2(): Array[(Long, Long)] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("y"), count(lit(1)).cast("long").as("x"))
      .orderBy("day").collect().map(r => (r.getLong(1), r.getLong(2)))

  test("stat_engle_granger_coint: BigInt replay agrees; quantized residuals near-centered") {
    val ds = daily2()
    val n = BigInt(ds.length)
    val (sx, sy) = (ds.map(t => BigInt(t._2)).sum, ds.map(t => BigInt(t._1)).sum)
    val sxx = ds.map(t => BigInt(t._2) * t._2).sum
    val sxy = ds.map(t => BigInt(t._2) * t._1).sum
    val nb = n * sxy - sx * sy
    val dd = n * sxx - sx * sx
    val a2 = sy * dd - nb * sx
    val nd = n * dd
    val e = ds.map { case (y, x) =>
      math.floor((BigInt(y) * nd - a2 - nb * n * x).toDouble / nd.toDouble * 1000 + 0.5).toLong
    }
    val pairs = e.sliding(2).map(p => (p(0), p(1))).toArray
    val m = pairs.length
    val sed = pairs.map { case (ep, ec) => BigInt(ep) * (ec - ep) }.sum
    val see = pairs.map { case (ep, _) => BigInt(ep) * ep }.sum
    val sdd = pairs.map { case (ep, ec) => BigInt(ec - ep) * (ec - ep) }.sum
    val rho = sed.toDouble / see.toDouble
    val s2 = (sdd.toDouble - rho * sed.toDouble) / (m - 2)
    val egT = rho / math.sqrt(s2 / see.toDouble)
    val row = queries.Extras140.statEngleGrangerCoint(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong)
    assert(math.abs(row.getDouble(1) - nb.toDouble / dd.toDouble) < 1e-6)
    assert(math.abs(row.getDouble(2) - egT) < 1e-4, s"eg_t ${row.getDouble(2)} vs $egT")
    // OLS residuals are centered; milli-cent quantization keeps |Σe| tiny
    assert(math.abs(e.map(BigInt(_)).sum.toDouble) <= e.length.toDouble,
      "quantized residuals drifted off center")
  }

  test("analytics_price_volume_mix: effects sum to the revenue delta per brand") {
    val rows = queries.Extras140.analyticsPriceVolumeMix(spark, sf).collect()
    assert(rows.nonEmpty)
    var checked = 0
    rows.foreach { r =>
      if (!r.isNullAt(4) && r.getLong(1) > 0) {
        assert(math.abs(r.getDouble(4) + r.getDouble(5) - r.getDouble(3)) < 1e-3,
          s"${r.getString(0)}: price ${r.getDouble(4)} + volume ${r.getDouble(5)} != delta ${r.getDouble(3)}")
        checked += 1
      }
    }
    assert(checked >= 5, "too few brands with a 1996 baseline to check the identity")
  }

  test("stat_chow_break: BigInt replay agrees; pooled RSS >= sum of regime RSS") {
    val cs = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = cs.length
    def rss(seg: Seq[(Long, Long)]): Double = {
      val k = BigInt(seg.length)
      val st = seg.map(p => BigInt(p._1)).sum
      val sc = seg.map(p => BigInt(p._2)).sum
      val stt = seg.map(p => BigInt(p._1) * p._1).sum
      val stc = seg.map(p => BigInt(p._1) * p._2).sum
      val scc = seg.map(p => BigInt(p._2) * p._2).sum
      ((k * scc - sc * sc).toDouble -
        (k * stc - st * sc).toDouble / (k * stt - st * st).toDouble
          * (k * stc - st * sc).toDouble) / k.toDouble
    }
    val idx = cs.zipWithIndex.map { case (c, i) => ((i + 1).toLong, c) }.toSeq
    val m = n / 2
    val (rp, ra, rb) = (rss(idx), rss(idx.take(m)), rss(idx.drop(m)))
    val f = (rp - ra - rb) / 2 / ((ra + rb) / (n - 4))
    val row = queries.Extras140.statChowBreak(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - f) < 1e-4, s"chow F ${row.getDouble(1)} vs $f")
    assert(rp >= ra + rb - 1e-6, "pooled RSS must dominate the split fits")
  }

  test("sample_horvitz_thompson: brute-force draw agrees; estimate tracks the truth") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(key: Long): Long = {
      val hex = md.digest(s"ht:$key".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16)
    }
    val sc = orders.map(o => BigInt(o._2)).sum
    val K = BigInt(1000)
    var certC = BigInt(0); var nCert = 0L; var nDraw = 0L
    orders.foreach { case (id, c) =>
      if (K * c >= sc) { certC += c; nCert += 1 }
      else if (BigInt(h(id)) * sc < K * c * 16777216) nDraw += 1
    }
    val est = (certC.toDouble + nDraw.toDouble * sc.toDouble / 1000) / 100
    val row = queries.Extras140.sampleHorvitzThompson(spark, sf).collect().head
    assert(row.getLong(0) == orders.length.toLong)
    assert(row.getLong(1) == nCert + nDraw, "sample census diverges from brute draw")
    assert(math.abs(row.getDouble(2) - est) < 1e-3)
    assert(math.abs(row.getDouble(4)) < 100000,
      s"HT estimate off truth by ${row.getDouble(4)} ppm — draw or weights broken")
  }
}
