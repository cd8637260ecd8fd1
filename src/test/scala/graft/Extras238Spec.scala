package graft

/** Wave-138 properties at sf0.001: DF τ vs a closed-form moment
  * replay, BDS vs an exact pair/triple count replay, subword profile
  * vs a string-walk replay, AIC ordering vs direct OLS fits.
  */
class Extras238Spec extends SparkSpec {

  private lazy val months: Array[Long] = Tables.orders(spark, sf)
    .selectExpr("date_trunc('month', o_orderdate) AS m",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
    .collect().map(r => (r.get(0).toString, r.getLong(1)))
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  test("time_dickey_fuller: matches the moment replay; gamma in (-2, 0] band sane") {
    val n = months.length
    val xs = months.dropRight(1).map(_.toDouble)
    val ys = months.sliding(2).map(p => (p(1) - p(0)).toDouble).toArray
    val m = xs.length
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum; val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
    val syy = ys.map(y => y * y).sum
    val g = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val sxxc = sxx - sx * sx / m; val syyc = syy - sy * sy / m; val sxyc = sxy - sx * sy / m
    val tau = g / math.sqrt((syyc - g * sxyc) / (m - 2) / sxxc)
    val row = queries.Extras238.timeDickeyFuller(spark, sf).collect().head
    assert(row.getLong(0) == m.toLong && m == n - 1)
    assert(math.abs(row.getDouble(1) - g) < 1e-4, s"gamma ${row.getDouble(1)} vs $g")
    assert(math.abs(row.getDouble(2) - tau) < 1e-2, s"tau ${row.getDouble(2)} vs $tau")
    assert(row.getBoolean(3) == (tau > -2.89))
  }

  test("time_bds_test: matches exact pair/triple counts") {
    val v = months
    val n = v.length
    val emb = (0 until n - 1).map(i => (v(i), v(i + 1)))
    val nb = emb.length
    val mean = v.take(nb).map(BigInt(_)).sum.toDouble / nb
    val svv = v.take(nb).map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val sv = v.take(nb).map(BigInt(_)).sum.toDouble
    val sd = math.sqrt((nb * svv - sv * sv) / (nb.toDouble * (nb - 1)))
    val eps = math.floor(sd / 2).toLong
    var p1 = 0L; var p2 = 0L
    val cj = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    for (i <- 0 until nb; j <- (i + 1) until nb) {
      val close0 = math.abs(emb(i)._1 - emb(j)._1) <= eps
      if (close0) { p1 += 1; cj(i) += 1; cj(j) += 1 }
      if (close0 && math.abs(emb(i)._2 - emb(j)._2) <= eps) p2 += 1
    }
    val trip = cj.values.map(c => c * (c - 1)).sum
    val c1 = p1.toDouble * 2 / (nb.toDouble * (nb - 1))
    val c2 = p2.toDouble * 2 / (nb.toDouble * (nb - 1))
    val kk = trip.toDouble / (nb.toDouble * (nb - 1) * (nb - 2))
    val z = math.sqrt(nb.toDouble) * (c2 - c1 * c1) /
      math.sqrt(4 * (kk * kk + 2 * kk * c1 * c1 + c1 * c1 * c1 * c1 - 4 * kk * c1 * c1))
    val row = queries.Extras238.timeBdsTest(spark, sf).collect().head
    assert(row.getLong(0) == nb.toLong)
    assert(math.abs(row.getDouble(1) - c1) < 1e-4, "C1")
    assert(math.abs(row.getDouble(2) - c2) < 1e-4, "C2")
    assert(math.abs(row.getDouble(3) - z) < 1e-2, s"z ${row.getDouble(3)} vs $z")
  }

  test("time_subword_complexity: matches the string-walk replay; saturation in (0,1]") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
    val bitsStr = days.sliding(2).map(p => if (p(1) > p(0)) '1' else '0').mkString
    val rows = queries.Extras238.timeSubwordComplexity(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val grams = bitsStr.sliding(k).toSet.size.toLong
      assert(r.getLong(1) == bitsStr.length - k + 1L, s"k=$k n_grams")
      assert(r.getLong(2) == grams, s"k=$k distinct ${r.getLong(2)} vs $grams")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("analytics_trend_model_aic: one chosen model; AIC matches a direct fit") {
    val rows = queries.Extras238.analyticsTrendModelAic(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.count(_.getBoolean(4)) >= 1, "at least one chosen")
    val n = months.length
    rows.foreach { r =>
      val f: Int => Double = r.getString(0) match {
        case "linear" => t => t.toDouble
        case "log"    => t => math.log(t.toDouble)
        case "sqrt"   => t => math.sqrt(t.toDouble)
      }
      val xs = (1 to n).map(t => math.floor(f(t) * 1e9 + 0.5))
      val ys = months.map(_.toDouble)
      val m = n.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
      val syy = ys.map(y => y * y).sum
      val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
      val rss = (syy - sy * sy / m) - b * (sxy - sx * sy / m)
      val aic = m * math.log(rss / m) + 6
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(3) - aic) < 0.05, s"${r.getString(0)} AIC ${r.getDouble(3)} vs $aic")
      assert(math.abs(r.getDouble(2) - math.log(rss / m)) < 1e-3, "ln MSE")
    }
    val minAic = rows.map(_.getDouble(3)).min
    rows.foreach(r => assert(r.getBoolean(4) == (r.getDouble(3) == minAic)))
  }
}
