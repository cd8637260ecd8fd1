package graft

/** Wave-83 properties: the ordinal-association battery replayed
  * against an all-pairs brute force on sf0.001.
  */
class Extras183Spec extends SparkSpec {

  /** (priority level, price band) per order + brute C/D/tie counts. */
  private def table(): (Array[(Int, Int)], BigInt, BigInt, BigInt, BigInt) = {
    val xs = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map { r =>
        val x = r.getString(0).substring(0, 1).toInt
        val p = r.getDouble(1)
        val y = if (p < 60000) 1 else if (p < 120000) 2 else if (p < 180000) 3
          else if (p < 240000) 4 else 5
        (x, y)
      }
    var c = BigInt(0); var d0 = BigInt(0); var tx = BigInt(0); var ty = BigInt(0)
    // pair counts from the contingency cells (quadratic over 25 cells)
    val cells = xs.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    for ((a, ma) <- cells; (b, mb) <- cells) {
      if (b._1 > a._1 && b._2 > a._2) c += BigInt(ma) * mb
      if (b._1 > a._1 && b._2 < a._2) d0 += BigInt(ma) * mb
    }
    val n = xs.length
    tx = xs.groupBy(_._1).values.map(g => BigInt(g.size) * (g.size - 1)).sum
    ty = xs.groupBy(_._2).values.map(g => BigInt(g.size) * (g.size - 1)).sum
    (xs, c, d0, tx, ty)
  }

  test("stat_gk_gamma: cell-product concordance replay") {
    val (xs, c, d0, _, _) = table()
    val row = queries.Extras183.statGkGamma(spark, sf).collect().head
    assert(row.getLong(0) == xs.length.toLong)
    assert(math.abs(row.getDouble(1) - c.toDouble) < 0.5)
    assert(math.abs(row.getDouble(2) - d0.toDouble) < 0.5)
    assert(math.abs(row.getDouble(3) - (c - d0).toDouble / (c + d0).toDouble) < 1e-5)
  }

  test("stat_somers_d: predictor-tie-excluded denominator replay") {
    val (xs, c, d0, tx, _) = table()
    val n = BigInt(xs.length)
    val notTiedX = (n * (n - 1) - tx).toDouble / 2
    val row = queries.Extras183.statSomersD(spark, sf).collect().head
    assert(math.abs(row.getDouble(3) - (c - d0).toDouble / notTiedX) < 1e-5)
    // |D_yx| <= |gamma| (denominator only grows)
    val gamma = queries.Extras183.statGkGamma(spark, sf).collect().head.getDouble(3)
    assert(math.abs(row.getDouble(3)) <= math.abs(gamma) + 1e-9)
  }

  test("stat_stuart_tau_c: rectangular correction replay") {
    val (xs, c, d0, _, _) = table()
    val n = xs.length
    val tauC = 2.0 * 5 * (c - d0).toDouble / (n.toDouble * n * 4)
    val row = queries.Extras183.statStuartTauC(spark, sf).collect().head
    assert(math.abs(row.getDouble(3) - tauC) < 1e-5)
    assert(math.abs(row.getDouble(3)) <= 1)
  }

  test("stat_gk_lambda: modal PRE replay; lambda in [0,1]") {
    val (xs, _, _, _, _) = table()
    val n = xs.length
    val rowModes = xs.groupBy(_._1).values.map { g =>
      g.groupBy(_._2).values.map(_.size).max.toLong
    }.sum
    val modeY = xs.groupBy(_._2).values.map(_.size).max.toLong
    val lambda = (rowModes - modeY).toDouble / (n - modeY)
    val row = queries.Extras183.statGkLambda(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == rowModes && row.getLong(2) == modeY)
    assert(math.abs(row.getDouble(3) - lambda) < 1e-6)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }
}
