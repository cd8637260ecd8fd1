package graft

import org.apache.spark.sql.functions._

/** Wave-85 properties: auto-MI, Poincaré, CV delta CI, mean excess
  * replayed against brute force on sf0.001.
  */
class Extras185Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daySeries(): Array[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime).map(_._2).toArray

  test("time_auto_mutual_info: decile joint-table MI replay; AMI >= ~0") {
    val x = daySeries(); val n = x.length
    // ntile(10) over (c, day-order): stable sort by value with original
    // index as tiebreak reproduces the window's R1 order
    val order = x.zipWithIndex.sortBy(t => (t._1, t._2)).map(_._2)
    val bins = new Array[Int](n)
    order.zipWithIndex.foreach { case (idx, pos) =>
      // standard NTILE: first (n % 10) buckets get (n/10 + 1) rows
      val base = n / 10; val extra = n % 10
      val b = if (pos < (base + 1) * extra) pos / (base + 1) + 1
        else (pos - (base + 1) * extra) / base + extra + 1
      bins(idx) = b
    }
    val pairs = (0 until n - 1).map(i => (bins(i), bins(i + 1)))
    val nn = pairs.size
    val cells = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mi0 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val mj0 = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ami = cells.map { case ((i, j), nij) =>
      math.floor(nij.toDouble * math.log(nij.toDouble * nn / (mi0(i).toDouble * mj0(j))) * 1e6 + 0.5).toLong
    }.sum.toDouble / 1e6 / nn
    val row = queries.Extras185.timeAutoMutualInfo(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong && row.getLong(1) == cells.size.toLong)
    assert(math.abs(row.getDouble(2) - ami) < 1e-5)
    assert(row.getDouble(2) > -1e-6)
  }

  test("time_poincare_descriptors: exact lag-moment replay; sd consistency") {
    val x = daySeries().map(_.toDouble)
    val dd = (0 until x.length - 1).map(i => x(i + 1) - x(i))
    val ss = (0 until x.length - 1).map(i => x(i + 1) + x(i))
    def popVar(v: Seq[Double]): Double = {
      val m = v.sum / v.size; v.map(a => (a - m) * (a - m)).sum / v.size
    }
    val sd1 = math.sqrt(popVar(dd) / 2) / 100
    val sd2 = math.sqrt(popVar(ss) / 2) / 100
    val row = queries.Extras185.timePoincareDescriptors(spark, sf).collect().head
    assert(row.getLong(0) == dd.size.toLong)
    assert(math.abs(row.getDouble(1) - sd1) < 0.05)
    assert(math.abs(row.getDouble(2) - sd2) < 0.05)
    assert(math.abs(row.getDouble(3) - sd2 / sd1) < 1e-3)
    // SD1² + SD2² = Var(x_t) + Var(x_{t+1}) over the pair set (identity)
    val lhs = sd1 * sd1 + sd2 * sd2
    val rhs = (popVar(dd.indices.map(x(_))) + popVar(dd.indices.map(i => x(i + 1)))) / 1e4
    assert(math.abs(lhs - rhs) / rhs < 1e-9)
  }

  test("stat_cv_delta_ci: sample-CV + delta-method SE replay") {
    val c = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0)).toDouble)
    val n = c.length
    val mean = c.sum / n
    val s2 = c.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    val cv = math.sqrt(s2) / mean
    val se = cv * math.sqrt(1.0 / (2 * (n - 1)) + cv * cv / n)
    val row = queries.Extras185.statCvDeltaCi(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - cv) < 1e-5)
    assert(math.abs(row.getDouble(2) - se) < 1e-6)
    assert(math.abs(row.getDouble(3) - (cv - 1.96 * se)) < 1e-5)
    assert(math.abs(row.getDouble(4) - (cv + 1.96 * se)) < 1e-5)
  }

  test("stat_mean_excess: order-statistic thresholds + exact excess sums") {
    val c = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => cents(r.getDouble(0))).sorted
    val n = c.length
    def thr(p: Int): Long = c((n * p + 99) / 100 - 1) // smallest c with 100*cl >= p*n
    val got = queries.Extras185.statMeanExcess(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(50, 75, 90, 95, 99))
    got.foreach { r =>
      val u = thr(r.getInt(0))
      assert(math.abs(r.getDouble(1) - u / 100.0) < 1e-6)
      val exceed = c.filter(_ > u)
      assert(r.getLong(2) == exceed.length.toLong)
      val me = exceed.map(v => BigInt(v - u)).sum.toDouble / exceed.length / 100
      assert(math.abs(r.getDouble(3) - me) < 0.01)
    }
    // heavy-tail direction: e(u) should not collapse to 0 at high u
    assert(got.last.getDouble(3) > 0)
  }
}
