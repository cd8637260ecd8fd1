package graft

/** Wave-86 properties: JS source matrix, truncation loss, two-prop
  * power, script mix replayed against brute force on sf0.001.
  */
class Extras186Spec extends SparkSpec {

  test("text_js_source_matrix: pairwise JSD replay; symmetric, >= 0, <= ln2") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq))
    val counts = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    def jsd(a: String, b: String): Double = {
      val ca = counts(a); val cb = counts(b)
      val na = ca.values.sum.toDouble; val nb = cb.values.sum.toDouble
      val toks = (ca.keySet ++ cb.keySet).toSeq
      toks.map { t =>
        val p = ca.getOrElse(t, 0L) / na; val q = cb.getOrElse(t, 0L) / nb
        val t1 = if (p > 0) p * math.log(2 * p / (p + q)) else 0.0
        val t2 = if (q > 0) q * math.log(2 * q / (p + q)) else 0.0
        t1 + t2
      }.sum / 2
    }
    val got = queries.Extras186.textJsSourceMatrix(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val v = jsd(r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(2) - v) < 1e-3,
        s"${r.getString(0)}/${r.getString(1)}: got ${r.getDouble(2)}, want $v")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= math.log(2) + 1e-9)
    }
  }

  test("pipeline_truncation_loss: exact cap census replay; monotone in cap") {
    val lens = Tables.documents(spark, sf).select("n_chars").collect().map(_.getLong(0))
    val got = queries.Extras186.pipelineTruncationLoss(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(256L, 512L, 1024L))
    got.foreach { r =>
      val cap = r.getLong(0)
      val cut = lens.count(_ > cap)
      val lost = lens.filter(_ > cap).map(_ - cap).sum
      assert(r.getLong(1) == lens.length.toLong && r.getLong(2) == cut.toLong)
      assert(math.abs(r.getDouble(3) - cut.toDouble / lens.length) < 1e-6)
      assert(math.abs(r.getDouble(4) - lost.toDouble / lens.sum) < 1e-6)
    }
    assert(got.map(_.getDouble(4)).toSeq == got.map(_.getDouble(4)).toSeq.sorted.reverse)
  }

  test("stat_power_two_prop: closed-form n-per-arm replay") {
    val srcs = Tables.documents(spark, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1) == "en"))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.count(_._2).toLong))
      .toSeq.sortBy(t => (-t._2._1, t._1)).take(2)
    val p1 = srcs(0)._2._2.toDouble / srcs(0)._2._1
    val p2 = srcs(1)._2._2.toDouble / srcs(1)._2._1
    val pbar = (p1 + p2) / 2; val delta = math.abs(p1 - p2)
    val n = math.pow(1.959964 * math.sqrt(2 * pbar * (1 - pbar))
      + 0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) / (delta * delta)
    val row = queries.Extras186.statPowerTwoProp(spark, sf).collect().head
    assert(row.getString(0) == srcs(0)._1 && row.getString(1) == srcs(1)._1)
    assert(math.abs(row.getDouble(4) - n) < 0.5)
    assert(row.getDouble(4) > 0)
  }

  test("text_script_mix: regexp census replay; ASCII corpus passes the mojibake screen") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues { g =>
      val han = g.count(d => d._2.exists(c => c >= '一' && c <= '鿿'))
      val lat = g.count(_._2.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
      val dig = g.count(_._2.exists(c => c >= '0' && c <= '9'))
      val pun = g.count(_._2.exists(c => c == '.' || c == '!' || c == '?'))
      val mix = g.count(d => d._2.exists(c => c >= '0' && c <= '9') &&
        d._2.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
      (g.size.toLong, han, lat, dig, pun, mix)
    }.toMap
    val got = queries.Extras186.textScriptMix(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, han, lat, dig, pun, mix) = byLang(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - han.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(3) - lat.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(4) - dig.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(5) - pun.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(6) - mix.toDouble / n) < 1e-6)
      // the mojibake screen: this corpus is pure ASCII by construction
      assert(r.getDouble(2) == 0.0, "unexpected Han characters — encoding regression")
      assert(r.getDouble(3) > 0.9, "letters should be ubiquitous")
    }
  }
}
