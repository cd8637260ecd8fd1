package graft

import org.apache.spark.sql.functions._

/** Wave-52 properties: double-sweep diameter, Hotelling T², MCC,
  * variogram replays against definitional brute force on sf0.001.
  */
class Extras152Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("graph_diameter_doublesweep: in-memory BFS replay of both sweeps") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val n = users.length.toLong
    val arcs = users.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n).filter(_ != u).map(u -> _)
    }
    val adj = (arcs ++ arcs.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def bfs(start: Long): Map[Long, Int] = {
      var lvl = Map(start -> 0)
      var frontier = Seq(start)
      for (k <- 1 to 5) {
        frontier = frontier.flatMap(adj(_)).distinct.filterNot(lvl.contains)
        lvl ++= frontier.map(_ -> k)
      }
      lvl
    }
    val l1 = bfs(0L)
    val ecc1 = l1.values.max
    val v2 = l1.filter(_._2 == ecc1).keys.min
    val l2 = bfs(v2)
    val diam = l2.values.max
    val far = l2.filter(_._2 == diam).keys.min
    val row = queries.Extras152.graphDiameterDoublesweep(spark, sf).collect().head
    assert(row.getLong(0) == ecc1.toLong)
    assert(row.getLong(1) == v2)
    assert(row.getLong(2) == l2.size.toLong)
    assert(row.getLong(3) == diam.toLong)
    assert(row.getLong(4) == far)
    // the second sweep cannot shrink the eccentricity estimate
    assert(row.getLong(3) >= row.getLong(0))
  }

  test("stat_hotelling_t2: textbook pooled-covariance replay") {
    val v = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R"))
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0) == "A", r.getDouble(1), cents(r.getDouble(2)).toDouble))
    val (ga, gb) = v.partition(_._1)
    def mom(g: Array[(Boolean, Double, Double)]) = {
      val n = g.length
      val mx = g.map(_._2).sum / n; val my = g.map(_._3).sum / n
      val sxx = g.map(t => (t._2 - mx) * (t._2 - mx)).sum
      val syy = g.map(t => (t._3 - my) * (t._3 - my)).sum
      val sxy = g.map(t => (t._2 - mx) * (t._3 - my)).sum
      (n, mx, my, sxx, syy, sxy)
    }
    val (na, mxa, mya, sxxa, syya, sxya) = mom(ga)
    val (nb, mxb, myb, sxxb, syyb, sxyb) = mom(gb)
    val df = na + nb - 2
    val (pxx, pyy, pxy) = ((sxxa + sxxb) / df, (syya + syyb) / df, (sxya + sxyb) / df)
    val (dx, dy) = (mxa - mxb, mya - myb)
    val det = pxx * pyy - pxy * pxy
    val t2 = (na.toDouble * nb / (na + nb)) *
      (dx * (pyy * dx - pxy * dy) + dy * (pxx * dy - pxy * dx)) / det
    val row = queries.Extras152.statHotellingT2(spark, sf).collect().head
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(math.abs(row.getDouble(2) - t2) < 1e-2 * math.max(1, math.abs(t2)))
    val f = t2 * (na + nb - 3) / (2.0 * (na + nb - 2))
    assert(math.abs(row.getDouble(3) - f) < 1e-2 * math.max(1, math.abs(f)))
  }

  test("stat_matthews_corr: confusion-matrix replay; MCC in [-1,1]") {
    val v = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0) == "en", r.getString(1).toLowerCase.contains(" the ")))
    val tp = v.count(t => t._1 && t._2).toLong
    val fp = v.count(t => !t._1 && t._2).toLong
    val fn = v.count(t => t._1 && !t._2).toLong
    val tn = v.count(t => !t._1 && !t._2).toLong
    val mcc = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    val row = queries.Extras152.statMatthewsCorr(spark, sf).collect().head
    assert(row.getLong(0) == tp && row.getLong(1) == fp)
    assert(row.getLong(2) == fn && row.getLong(3) == tn)
    assert(math.abs(row.getDouble(4) - mcc) < 1e-5)
    assert(row.getDouble(4) >= -1.0 && row.getDouble(4) <= 1.0)
  }

  test("time_variogram: brute-force lag replay; gamma(h) approaches variance") {
    val days = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val n = days.length
    val mean = days.map(_.toDouble).sum / n
    val variance = days.map(c => (c - mean) * (c - mean)).sum / n
    val got = queries.Extras152.timeVariogram(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L, 7L, 14L, 30L))
    got.foreach { r =>
      val h = r.getLong(0).toInt
      val pairs = (0 until n - h).map(i => days(i + h) - days(i))
      assert(r.getLong(1) == (n - h).toLong)
      val gamma = pairs.map(d => BigInt(d) * d).sum / (2 * (n - h))
      assert(r.getLong(2) == gamma.toLong)
      assert(math.abs(r.getDouble(3) - gamma.toDouble / variance) < 1e-4)
    }
  }
}
