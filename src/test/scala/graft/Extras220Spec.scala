package graft

/** Wave-120 properties: GARCH recursion replay + persistence bounds,
  * Borda/Copeland replay on the collected rank frame, Kneser–Ney
  * probability mass checks, and L-moments vs direct order-statistic
  * sums — at sf0.001.
  */
class Extras220Spec extends SparkSpec {

  test("time_garch_fixed: matches the recursion replay; sigma stays positive") {
    val days = Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val rq = (1 until days.length).map(t =>
      math.floor(math.log(days(t).toDouble / days(t - 1)) * 1e12 + 0.5).toLong)
    val nr = rq.length
    val sr = rq.map(BigInt(_)).sum
    val srr = rq.map(q => BigInt(q) * q).sum
    val vr = (nr.toDouble * srr.toDouble - sr.toDouble * sr.toDouble) /
      (nr.toDouble * (nr - 1)) / 1e24
    val omega = 0.05 * vr
    var s2 = vr; var mx = s2
    rq.map(_ / 1e12).foreach { r =>
      s2 = omega + 0.1 * r * r + 0.85 * s2
      if (s2 > mx) mx = s2
    }
    val row = queries.Extras220.timeGarchFixed(spark, sf).collect().head
    assert(row.getLong(0) == nr.toLong)
    assert(math.abs(row.getDouble(1) - omega) < 1e-9)
    assert(math.abs(row.getDouble(2) - math.sqrt(vr)) < 1e-7)
    assert(math.abs(row.getDouble(3) - math.sqrt(s2)) < 1e-7)
    assert(math.abs(row.getDouble(4) - math.sqrt(mx)) < 1e-7)
    assert(row.getDouble(3) > 0 && row.getDouble(4) >= row.getDouble(3))
  }

  test("analytics_borda_copeland: matches the voting replay; scores bounded") {
    val rev = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .join(Tables.supplier(spark, sf),
        org.apache.spark.sql.functions.expr("l_suppkey = s_suppkey"))
      .join(Tables.nation(spark, sf),
        org.apache.spark.sql.functions.expr("s_nationkey = n_nationkey"))
      .selectExpr("n_name AS nat", "p_brand AS brand",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS r")
      .collect().map(r => ((r.getString(0), r.getString(1)), BigInt(r.getLong(2))))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val byNat = rev.groupBy(_._1._1).map { case (nat, g) =>
      // sort by revenue desc, brand asc
      val ordered = g.toSeq.map { case ((_, b), v) => (b, v) }
        .sortWith((a, c) => a._2 > c._2 || (a._2 == c._2 && a._1 < c._1))
      (nat, ordered.zipWithIndex.map { case ((b, _), i) => (b, i + 1) }.toMap)
    }
    val brands: Seq[String] = rev.keys.map(_._2).toSet.toSeq.sorted
    val nb = brands.size
    val borda: Map[String, Long] = brands.map { b =>
      (b, byNat.values.map(rk => rk.get(b).map(nb - _).getOrElse(0)).sum.toLong)
    }.toMap
    val cope = brands.map { bi =>
      var sc = 0L
      brands.filter(_ != bi).foreach { bj =>
        var wi = 0; var nv = 0
        byNat.values.foreach { rk =>
          (rk.get(bi), rk.get(bj)) match {
            case (Some(ri), Some(rj)) =>
              nv += 1; if (ri < rj) wi += 1
            case _ => ()
          }
        }
        if (wi * 2 > nv) sc += 1 else if (wi * 2 < nv) sc -= 1
      }
      (bi, sc)
    }.toMap
    val rows = queries.Extras220.analyticsBordaCopeland(spark, sf).collect()
    assert(rows.length == 10)
    val expTop = borda.toSeq.sortBy { case (b, s) => (-s, b) }.take(10)
    rows.zip(expTop).foreach { case (r, (b, s)) =>
      assert(r.getString(0) == b, s"borda order: ${r.getString(0)} vs $b")
      assert(r.getLong(1) == s)
      assert(r.getLong(2) == cope(b), s"copeland for $b")
      assert(math.abs(r.getLong(2)) <= (nb - 1).toLong)
    }
  }

  test("text_kneser_ney_bigram: perplexity positive; unseen rate sane; model mass checks") {
    val row = queries.Extras220.textKneserNeyBigram(spark, sf).collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    val unseen = row.getDouble(2)
    assert(unseen >= 0 && unseen < 0.5, s"unseen rate $unseen")
    val ppl = row.getDouble(3)
    assert(ppl > 1.0, "perplexity above the degenerate floor")
    // vocabulary-size upper bound: a bigram model can't be worse than
    // uniform-over-continuations by much more than the epsilon floor
    assert(ppl < 1e10, "epsilon floor keeps perplexity finite")
    // replay P(w|v) mass for one seen context: sums to ~1 over vocab
    val tr = Tables.documents(spark, sf).filter("doc_id % 10 <> 0")
      .select("text").collect().map(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(a => a.dropRight(1).zip(a.drop(1)))
    val cvw = tr.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val cv = cvw.groupBy(_._1._1).map { case (v, g) =>
      (v, (g.values.sum, g.size.toLong))
    }
    val cont = cvw.groupBy(_._1._2).map { case (w, g) => (w, g.size.toLong) }
    val ntypes = cvw.size.toLong
    val v0 = cv.maxBy(_._2._1)._1
    val vocab = cont.keys.toSeq
    val mass = vocab.map { w =>
      val (cvv, n1v) = cv(v0)
      val cw = cvw.getOrElse((v0, w), 0L)
      math.max(cw - 0.75, 0) / cvv +
        0.75 * n1v / cvv * (cont(w).toDouble / ntypes)
    }.sum
    assert(mass > 0.5 && mass <= 1.0 + 1e-9,
      s"KN mass for the most frequent context is $mass (P_cont normalizes over seen types)")
  }

  test("stat_l_moments: matches direct order-statistic sums; lambda2 = GMD/2") {
    val xs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2)).map(_._1)
    val n = xs.length
    def b(r: Int): Double = {
      var acc = 0.0
      for (i <- 1 to n) {
        var w = 1.0
        for (k <- 0 until r) w *= (i - 1.0 - k) / (n - 1.0 - k)
        acc += w * xs(i - 1)
      }
      acc / n
    }
    val (b0, b1, b2, b3) = (b(0), b(1), b(2), b(3))
    val l1 = b0; val l2 = 2 * b1 - b0
    val t3 = (6 * b2 - 6 * b1 + b0) / l2
    val t4 = (20 * b3 - 30 * b2 + 12 * b1 - b0) / l2
    val row = queries.Extras220.statLMoments(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - l1 / 100) < 1e-2)
    assert(math.abs(row.getDouble(2) - l2 / 100) < 1e-2)
    assert(math.abs(row.getDouble(3) - t3) < 1e-4, s"tau3 ${row.getDouble(3)} vs $t3")
    assert(math.abs(row.getDouble(4) - t4) < 1e-4, s"tau4 ${row.getDouble(4)} vs $t4")
    assert(math.abs(row.getDouble(3)) < 1 && row.getDouble(4) > -0.25 && row.getDouble(4) < 1,
      "L-ratio feasibility bounds")
    // lambda2 is half the Gini mean difference
    var pair = BigInt(0)
    for (i <- xs.indices; j <- xs.indices) pair += BigInt(math.abs(xs(i) - xs(j)))
    val gmd = pair.toDouble / (n.toDouble * (n - 1))
    assert(math.abs(row.getDouble(2) - gmd / 2 / 100) < 1e-2, "lambda2 = GMD/2")
  }
}
