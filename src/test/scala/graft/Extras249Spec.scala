package graft

/** Wave-149 properties at sf0.001: driver-side replays of the
  * attribute control charts, the balanced Gage R&R ANOVA, the
  * restricted-band ROC integral, the p-value combiners (with an
  * independent Scala Φ rational), Storey's grid, higher criticism,
  * and the Bayesian A/B posterior read.
  */
class Extras249Spec extends SparkSpec {

  // The same Zelen–Severo rational both engines evaluate.
  private def bigPhi(z: Double): Double = {
    val phi = math.exp(-(z * z) / 2) / math.sqrt(2 * math.Pi)
    def poly(t: Double): Double =
      t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
    if (z >= 0) 1 - phi * poly(1 / (1 + 0.2316419 * z))
    else phi * poly(1 / (1 - 0.2316419 * z))
  }

  private def pGrid(groups: Array[(String, Long, Long, Double)]): Array[(String, Long)] = {
    // groups: (key, n, centsSum, centsSqSum as double-exact)
    val tn = groups.map(_._2).sum
    val ts = groups.map(_._3).sum
    val tq = groups.map(_._4).sum
    groups.map { case (k, cn, cs, _) =>
      val z = (cs.toDouble / cn - ts.toDouble / tn) /
        math.sqrt(tq / tn - (ts.toDouble / tn) * (ts.toDouble / tn)) *
        math.sqrt(cn.toDouble)
      val p = 2 * (1 - bigPhi(math.abs(z)))
      val pq = math.floor(p * 1e12 + 0.5).toLong
      (k, math.min(math.max(pq, 1L), 999999999999L))
    }
  }

  private def groupMoments(table: String, key: String, cents: String): Array[(String, Long, Long, Double)] =
    (if (table == "orders") Tables.orders(spark, sf) else Tables.part(spark, sf))
      .selectExpr(s"$key AS k", s"CAST(CAST($cents AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (k, g) =>
        (k, g.length.toLong, g.map(_._2).sum,
          g.map(x => x._2.toDouble * x._2).sum)
      }

  test("stat_p_chart: matches a plain-Scala monthly replay") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("substring(CAST(l_shipdate AS STRING), 1, 7) AS mo",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val m = rows.groupBy(_._1).toArray.map { case (_, g) => (g.length.toLong, g.map(_._2).sum) }
    val nn = m.map(_._1).sum; val dd = m.map(_._2).sum
    val pbar = dd.toDouble / nn
    val hi = m.count { case (ni, di) =>
      di.toDouble / ni > pbar + 3 * math.sqrt(pbar * (1 - pbar) / ni) }
    val lo = m.count { case (ni, di) =>
      pbar - 3 * math.sqrt(pbar * (1 - pbar) / ni) > 0 &&
        di.toDouble / ni < pbar - 3 * math.sqrt(pbar * (1 - pbar) / ni) }
    val row = queries.Extras249.statPChart(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == m.length)
    assert(math.abs(row.getAs[Double]("pbar") - pbar) < 1e-5)
    assert(row.getAs[Long]("n_ooc_high") == hi)
    assert(row.getAs[Long]("n_ooc_low") == lo)
  }

  test("stat_u_chart: matches a plain-Scala daily replay") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("CAST(CAST(l_shipdate AS DATE) AS STRING) AS day",
        "l_orderkey", "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d = rows.groupBy(_._1).toArray.map { case (_, g) =>
      (g.map(_._2).distinct.length.toLong, g.map(_._3).sum) }
    val uu = d.map(_._1).sum; val cc = d.map(_._2).sum
    val ubar = cc.toDouble / uu
    val hi = d.count { case (ui, ci) =>
      ci.toDouble / ui > ubar + 3 * math.sqrt(ubar / ui) }
    val lo = d.count { case (ui, ci) =>
      ubar - 3 * math.sqrt(ubar / ui) > 0 &&
        ci.toDouble / ui < ubar - 3 * math.sqrt(ubar / ui) }
    val row = queries.Extras249.statUChart(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == d.length)
    assert(math.abs(row.getAs[Double]("ubar") - ubar) < 1e-5)
    assert(row.getAs[Long]("n_ooc_high") == hi)
    assert(row.getAs[Long]("n_ooc_low") == lo)
  }

  test("stat_gage_rr: matches a plain-Scala balanced ANOVA replay") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand AS b", "l_returnflag AS f", "l_orderkey AS ok",
        "l_linenumber AS ln",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    val cells = rows.groupBy(r => (r._1, r._2)).toArray
      .map { case (k, g) => (k, g.sortBy(x => (x._3, x._4)).take(4).map(_._5)) }
      .filter(_._2.length == 4)
    assert(cells.length == 75)
    val ys = cells.flatMap(_._2)
    val tt = ys.sum; val qq = ys.map(y => y.toDouble * y).sum
    val ct = tt.toDouble * tt / 300
    val sp = cells.groupBy(_._1._1).values
      .map(g => { val t = g.flatMap(_._2).sum; t.toDouble * t }).sum / 12
    val so = cells.groupBy(_._1._2).values
      .map(g => { val t = g.flatMap(_._2).sum; t.toDouble * t }).sum / 100
    val sc = cells.map(c => { val t = c._2.sum; t.toDouble * t }).sum / 4
    val msp = (sp - ct) / 24; val mso = (so - ct) / 2
    val mspo = (sc - ct - (sp - ct) - (so - ct)) / 48
    val mse = (qq - sc) / 225
    val grr = mse + math.max((mspo - mse) / 4, 0) + math.max((mso - mspo) / 100, 0)
    val s2p = math.max((msp - mspo) / 12, 0)
    val row = queries.Extras249.statGageRr(spark, sf).collect().head
    assert(row.getAs[Long]("n_meas") == 300)
    assert(math.abs(row.getAs[Double]("pct_grr") - 100 * math.sqrt(grr / (grr + s2p))) < 1e-3)
    assert(math.abs(row.getAs[Double]("pct_part") - 100 * math.sqrt(s2p / (grr + s2p))) < 1e-3)
    assert(row.getAs[Long]("ndc") == math.floor(1.41 * math.sqrt(s2p / grr)).toLong)
  }

  test("stat_partial_auc: matches a plain-Scala restricted trapezoid replay") {
    val g = Tables.lineitem(spark, sf)
      .selectExpr("l_discount AS x", "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (x, rows) =>
        val pq = math.floor(1e12 / (1 + math.exp(-(-0.7 + 3 * x))) + 0.5).toLong
        (pq, rows.map(_._2).sum, rows.length - rows.map(_._2).sum)
      }.sortBy(_._1)
    val o = g.map(_._2).sum; val z = g.map(_._3).sum
    var cumz = 0L; var cumo = 0L; var area = 0.0
    for ((_, og, zg) <- g) {
      val a1 = z - cumz - zg; val a2 = z - cumz
      val b1 = o - cumo - og; val b2 = o - cumo
      val seg =
        if (4 * a1 >= z || a2 == a1) 0.0
        else if (4 * a2 <= z) (a2.toDouble - a1) * (b1.toDouble + b2) / 2
        else {
          val tb = b1.toDouble + (b2.toDouble - b1) * (z.toDouble / 4 - a1) / (a2.toDouble - a1)
          (z.toDouble / 4 - a1) * (b1.toDouble + tb) / 2
        }
      area += math.floor(seg / (z.toDouble * o) * 1e15 + 0.5) / 1e15
      cumz += zg; cumo += og
    }
    val row = queries.Extras249.statPartialAuc(spark, sf).collect().head
    assert(row.getAs[Long]("n_items") == o + z)
    assert(math.abs(row.getAs[Double]("pauc") - area) < 1e-5)
    assert(area > 0 && area <= 0.25 + 1e-9)
    assert(math.abs(row.getAs[Double]("pauc_mcclish") -
      0.5 * (1 + (area - 0.03125) / (0.25 - 0.03125))) < 1e-4)
  }

  test("stat_pvalue_combiners: matches a plain-Scala combine replay") {
    val ps = pGrid(groupMoments("orders", "o_orderpriority", "o_totalprice"))
      .map(_._2.toDouble / 1e12)
    assert(ps.length == 5)
    val fisher = -2 * ps.map(p => math.floor(math.log(p) * 1e12 + 0.5) / 1e12).sum
    def erlang5(x: Double): Double = {
      val y = x / 2
      math.exp(-y) * (1 + y + y * y / 2 + y * y * y / 6 + y * y * y * y / 24)
    }
    val row = queries.Extras249.statPvalueCombiners(spark, sf).collect().head
    assert(row.getAs[Long]("k") == 5)
    assert(math.abs(row.getAs[Double]("fisher_stat") - fisher) < 1e-4)
    assert(math.abs(row.getAs[Double]("fisher_p") - erlang5(fisher)) < 1e-4)
    val tippett = 1 - math.pow(1 - ps.min, 5)
    assert(math.abs(row.getAs[Double]("tippett_p") - tippett) < 1e-4)
    val acatT = ps.map(p =>
      math.floor(math.tan((0.5 - p) * math.Pi) * 1e6 + 0.5) / 1e6).sum / 5
    assert(math.abs(row.getAs[Double]("acat_p") - (0.5 - math.atan(acatT) / math.Pi)) < 1e-4)
    // sanity: combined p-values are probabilities
    for (c <- Seq("fisher_p", "pearson_p", "tippett_p", "acat_p"))
      assert(row.getAs[Double](c) >= 0 && row.getAs[Double](c) <= 1)
  }

  test("stat_storey_pi0: matches a plain-Scala grid replay") {
    val pq = pGrid(groupMoments("part", "p_brand", "p_retailprice")).map(_._2)
    assert(pq.length == 25)
    val rows = queries.Extras249.statStoreyPi0(spark, sf).collect()
    assert(rows.length == 7)
    for (r <- rows) {
      val lam100 = math.round(r.getAs[Double]("lam") * 100)
      val above = pq.count(_ > lam100 * 10000000000L)
      assert(r.getAs[Long]("n_above") == above)
      val pi0 = math.min(above.toDouble / (25 * (1 - lam100 / 100.0)), 1.0)
      assert(math.abs(r.getAs[Double]("pi0") - pi0) < 1e-5)
    }
  }

  test("stat_higher_criticism: matches a plain-Scala ordered replay") {
    val ps = pGrid(groupMoments("part", "p_brand", "p_retailprice"))
      .sortBy(p => (p._2, p._1))
    val m = ps.length
    val terms = ps.zipWithIndex.map { case ((_, pq), i0) =>
      val p = pq.toDouble / 1e12
      math.floor(math.sqrt(m.toDouble) * ((i0 + 1).toDouble / m - p) /
        math.sqrt(p * (1 - p)) * 1e9 + 0.5).toLong
    }
    val hmax = terms.max
    val arg = terms.indexOf(hmax) + 1
    val row = queries.Extras249.statHigherCriticism(spark, sf).collect().head
    assert(row.getAs[Long]("m") == m)
    assert(row.getAs[Long]("argmax_rank") == arg)
    assert(math.abs(row.getAs[Double]("hc_stat") - hmax / 1e9) < 1e-6)
  }

  test("stat_bayes_ab: matches a plain-Scala posterior replay") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id % 2 AS grp",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS p")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byG = ev.groupBy(_._1).map { case (g, rows) =>
      (g, rows.length.toLong, rows.map(_._2).sum) }
    val (na, ca) = byG.find(_._1 == 0).map(t => (t._2, t._3)).get
    val (nb, cb) = byG.find(_._1 == 1).map(t => (t._2, t._3)).get
    def mu(n: Long, a: Long) = (1.0 + a) / (2 + n)
    def v(n: Long, a: Long) =
      (1.0 + a) * (1 + n - a) / ((2.0 + n) * (2 + n) * (3 + n))
    val dmu = mu(nb, cb) - mu(na, ca)
    val sd = math.sqrt(v(na, ca) + v(nb, cb))
    val row = queries.Extras249.statBayesAb(spark, sf).collect().head
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("conv_a") == ca)
    assert(row.getAs[Long]("n_b") == nb && row.getAs[Long]("conv_b") == cb)
    assert(math.abs(row.getAs[Double]("p_b_beats_a") - bigPhi(dmu / sd)) < 1e-5)
    val phi = math.exp(-(dmu / sd) * (dmu / sd) / 2) / math.sqrt(2 * math.Pi)
    val loss = sd * phi - dmu * (1 - bigPhi(dmu / sd))
    assert(math.abs(row.getAs[Double]("exp_loss_choose_b") - loss) < 1e-6)
    assert(loss >= 0)
  }
}
