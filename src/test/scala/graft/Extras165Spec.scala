package graft

import org.apache.spark.sql.functions._

/** Wave-65 properties: Quade, Huber, XmR, centering-effect replays
  * against brute force on sf0.001.
  */
class Extras165Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def daily(): Seq[Long] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)

  test("stat_quade_test: definitional weighted-rank replay") {
    val cells = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"),
        col("l_extendedprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val years = cells.keys.map(_._1).toSeq.distinct.sorted
    val quarters = cells.keys.map(_._2).toSeq.distinct.sorted
    val ranges = years.map(y =>
      y -> (quarters.map(q => cells((y, q))).max - quarters.map(q => cells((y, q))).min))
    val qw = ranges.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((y, _), i) => y -> (i + 1).toLong }.toMap
    val s2 = (for (y <- years; q <- quarters) yield {
      val r = quarters.sortBy(q2 => (cells((y, q2)), q2)).indexOf(q) + 1
      ((y, q), qw(y) * (2L * r - 5))
    }).toMap
    val a2 = s2.values.map(v => v * v).sum
    val bsum = quarters.map(q => years.map(y => s2((y, q))).sum)
      .map(v => v * v).sum
    val b = years.length; val k = quarters.length
    val bb = bsum.toDouble / b
    val f = (b - 1) * bb / (a2 - bb)
    val row = queries.Extras165.statQuadeTest(spark, sf).collect().head
    assert(row.getLong(0) == b.toLong && row.getLong(1) == k.toLong)
    assert(math.abs(row.getDouble(2) - f) < 1e-3)
    assert(row.getBoolean(3) == (f > 3.16))
  }

  test("stat_huber_m_estimator: 3-round quantized IRLS replay; robust within plain spread") {
    val x = daily()
    val n = x.length
    val sc = x.map(BigInt(_)).sum; val qc = x.map(c => BigInt(c) * c).sum
    val mean0 = sc.toDouble / n
    val sigma = math.sqrt((BigInt(n) * qc - sc * sc).toDouble / (n.toDouble * n))
    val k = 1.345 * sigma
    var mu = mean0
    for (_ <- 1 to 3) {
      val terms = x.map { c =>
        val wq = math.floor(math.min(1.0, k / math.abs(c - mu)) * 1e6 + 0.5).toLong
        (BigInt(wq) * c, BigInt(wq))
      }
      mu = terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble
    }
    val row = queries.Extras165.statHuberMEstimator(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mean0 / 100) < 0.02)
    assert(math.abs(row.getDouble(2) - mu / 100) < 0.02)
    assert(math.abs(row.getDouble(3) - (mean0 - mu) / sigma) < 1e-4)
  }

  test("stat_xmr_chart: moving-range census replay") {
    val x = daily()
    val mrs = x.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.toSeq
    val xbar = x.map(BigInt(_)).sum.toDouble / x.length
    val mrbar = mrs.map(BigInt(_)).sum.toDouble / mrs.length
    val xv = x.count(c => math.abs(c - xbar) > 2.66 * mrbar).toLong
    val mv = mrs.count(_ > 3.267 * mrbar).toLong
    val row = queries.Extras165.statXmrChart(spark, sf).collect().head
    assert(row.getLong(0) == x.length.toLong)
    assert(row.getLong(1) == xv && row.getLong(2) == mv)
    assert(math.abs(row.getDouble(3) - xbar / 100) < 0.02)
    assert(math.abs(row.getDouble(4) - mrbar / 100) < 0.02)
  }

  test("embed_centering_effect: closed forms equal brute-force pair means") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1e9 + 0.5)).toArray)
    val n = vecs.length; val dims = vecs.head.length
    // brute force on a 100-vector sample (identity check), closed form on all
    val sample = vecs.take(100)
    val bruteRaw = (for (i <- sample.indices; j <- sample.indices if i != j) yield
      (0 until dims).map(d0 => sample(i)(d0) * sample(j)(d0)).sum / 1e18)
      .sum / (100.0 * 99)
    val colSum = Array.tabulate(dims)(j => sample.map(_(j)).sum)
    val a = colSum.map(x => x * x).sum / 1e18
    val b = sample.map(v => v.map(x => x * x).sum).sum / 1e18
    assert(math.abs((a - b) / (100.0 * 99) - bruteRaw) < 1e-9) // identity holds
    val row = queries.Extras165.embedCenteringEffect(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    // full-corpus closed forms
    val colSumF = Array.tabulate(dims)(j => vecs.map(_(j)).sum)
    val aF = colSumF.map(x => x * x).sum / 1e18
    val bF = vecs.map(v => v.map(x => x * x).sum).sum / 1e18
    val w = (0 until dims).map { j =>
      val mu = colSumF(j) / n
      vecs.map(v => (v(j) - mu) * (v(j) - mu)).sum
    }.sum / 1e18
    assert(math.abs(row.getDouble(1) - (aF - bF) / (n.toDouble * (n - 1))) < 1e-6)
    assert(math.abs(row.getDouble(2) - (-w / (n.toDouble * (n - 1)))) < 1e-6)
    assert(row.getDouble(3) >= 0)
  }
}
