package graft

import org.apache.spark.sql.functions._

/** Wave-51 properties: Gini stump, Cochran–Armitage, Fleiss' kappa,
  * Deming replays against definitional brute force on sf0.001.
  */
class Extras151Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("analytics_best_split_gini: exhaustive split scan replay") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_returnflag"))
      .collect()
      .map(r => (cents(r.getDouble(0)), if (r.getString(1) == "R") 1L else 0L))
    val n = rows.length.toLong
    val p = rows.map(_._2).sum
    val byV = rows.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum))
      .toSeq.sortBy(_._1)
    var cl = 0L; var pl = 0L
    var bestF = Double.NegativeInfinity; var bestV = Long.MaxValue
    byV.foreach { case (v, (cnt, pos)) =>
      cl += cnt; pl += pos
      if (cl < n) {
        val f = (pl.toDouble * pl + (cl - pl).toDouble * (cl - pl)) / cl +
          ((p - pl).toDouble * (p - pl) +
            (n - cl - p + pl).toDouble * (n - cl - p + pl)) / (n - cl)
        if (f > bestF || (f == bestF && v < bestV)) { bestF = f; bestV = v }
      }
    }
    val row = queries.Extras151.analyticsBestSplitGini(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - bestV.toDouble / 100) < 1e-9)
    val base = 1.0 - math.pow(p.toDouble / n, 2) - math.pow((n - p).toDouble / n, 2)
    assert(math.abs(row.getDouble(2) - base) < 1e-5)
    assert(math.abs(row.getDouble(3) - (n - bestF) / n) < 1e-5)
    // the split must not be worse than the base impurity
    assert(row.getDouble(3) <= row.getDouble(2) + 1e-9)
  }

  test("stat_cochran_armitage: definitional z from per-group proportions") {
    val g = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect()
      .map(r => (r.getString(0).head.asDigit.toLong,
        if (r.getString(1) == "F") 1L else 0L))
      .groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toSeq
    val nTot = g.map(_._2._1).sum
    val r = g.map(_._2._2).sum
    val pbar = r.toDouble / nTot
    val num = g.map { case (s, (_, rk)) => s * rk }.sum -
      pbar * g.map { case (s, (nk, _)) => s * nk }.sum
    val c = g.map { case (s, (nk, _)) => s * s * nk }.sum
    val b = g.map { case (s, (nk, _)) => s * nk }.sum
    val z = num / math.sqrt(pbar * (1 - pbar) * (c - b.toDouble * b / nTot))
    val row = queries.Extras151.statCochranArmitage(spark, sf).collect().head
    assert(row.getLong(0) == nTot && row.getLong(1) == r)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
    assert(row.getBoolean(3) == (math.abs(z) > 1.96))
  }

  test("stat_fleiss_kappa: textbook formula replay on the m=4 subjects") {
    val m = 4
    val votes = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).filter(_._2.length == m)
    val nSub = votes.size
    val cats = votes.values.flatten.map(_._2).toSeq.distinct
    val pBar = votes.values.map { xs =>
      val counts = cats.map(c => xs.count(_._2 == c).toLong)
      (counts.map(x => x * x).sum - m).toDouble / (m * (m - 1))
    }.sum / nSub
    val tot = nSub.toLong * m
    val pE = cats.map { c =>
      val tc = votes.values.map(xs => xs.count(_._2 == c).toLong).sum
      math.pow(tc.toDouble / tot, 2)
    }.sum
    val kappa = (pBar - pE) / (1 - pE)
    val row = queries.Extras151.statFleissKappa(spark, sf).collect().head
    assert(row.getLong(0) == nSub.toLong)
    assert(math.abs(row.getDouble(1) - pBar) < 1e-5)
    assert(math.abs(row.getDouble(2) - pE) < 1e-5)
    assert(math.abs(row.getDouble(3) - kappa) < 1e-4)
  }

  test("stat_deming_regression: residual geometry — deming slope between OLS y~x and 1/(x~y)") {
    val v = Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getDouble(0), cents(r.getDouble(1)).toDouble))
    val n = v.length
    val mx = v.map(_._1).sum / n; val my = v.map(_._2).sum / n
    val sxx = v.map(t => (t._1 - mx) * (t._1 - mx)).sum
    val syy = v.map(t => (t._2 - my) * (t._2 - my)).sum
    val sxy = v.map(t => (t._1 - mx) * (t._2 - my)).sum
    val beta = (syy - sxx + math.sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy)) /
      (2 * sxy)
    val olsYx = sxy / sxx
    val olsInvXy = syy / sxy
    val row = queries.Extras151.statDemingRegression(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - beta) / beta < 1e-4)
    // Deming slope must lie between the two OLS extremes
    assert(row.getDouble(1) >= math.min(olsYx, olsInvXy) - 1e-6)
    assert(row.getDouble(1) <= math.max(olsYx, olsInvXy) + 1e-6)
    assert(math.abs(row.getDouble(3) - sxy / math.sqrt(sxx * syy)) < 1e-5)
  }
}
