package graft

/** Wave-99 properties: filter overlap, shingle DF profile, norm
  * ANOVA, casing profile vs brute force at sf0.001.
  */
class Extras199Spec extends SparkSpec {

  test("pipeline_filter_overlap: exact flag replay; phi in [-1,1]") {
    val docs = Tables.documents(spark, sf).select("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
    val flags = docs.map { case (t, nc) =>
      val f1 = nc < 100
      val punct = t.count(".,;:!?".contains(_)).toDouble / math.max(nc, 1L)
      val digits = t.count(_.isDigit).toDouble / math.max(nc, 1L)
      val toks = t.split(" ", -1)
      val sw = toks.count(stop.contains).toDouble / math.max(toks.length, 1)
      (if (f1) 1L else 0L, if (punct > 0.03) 1L else 0L,
        if (digits > 0.05) 1L else 0L, if (sw < 0.05) 1L else 0L)
    }
    val n = flags.length.toLong
    def f(i: Int)(t: (Long, Long, Long, Long)): Long = i match {
      case 1 => t._1; case 2 => t._2; case 3 => t._3; case 4 => t._4
    }
    val rows = queries.Extras199.pipelineFilterOverlap(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val Array(i, j) = r.getString(0).split("-").map(_.toInt)
      val si = flags.map(f(i)).sum; val sj = flags.map(f(j)).sum
      val cij = flags.map(t => f(i)(t) * f(j)(t)).sum
      assert(r.getLong(1) == n && r.getLong(2) == si && r.getLong(3) == sj && r.getLong(4) == cij)
      if (si != 0 && sj != 0 && si != n && sj != n) {
        val phi = (cij.toDouble * n - si.toDouble * sj) /
          math.sqrt(si.toDouble * (n - si) * sj * (n - sj))
        assert(math.abs(r.getDouble(5) - phi) < 1e-5)
        assert(math.abs(r.getDouble(5)) <= 1)
      }
    }
  }

  test("dedup_shingle_df_profile: DF spectrum replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (_, t) =>
      val toks = t.split(" ", -1)
      val upTo = math.max(toks.length - 4, 1)
      (1 to upTo).map(i => toks.slice(i - 1, i - 1 + 5).mkString(" ")).distinct
    }
    val df = perDoc.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nSh = df.size.toLong
    val nDup = df.values.count(_ >= 2).toLong
    val mass = df.values.map(BigInt(_)).sum
    val dupMass = df.values.filter(_ >= 2).map(BigInt(_)).sum
    val row = queries.Extras199.dedupShingleDfProfile(spark, sf).collect().head
    assert(row.getLong(0) == nSh && row.getLong(1) == nDup)
    assert(math.abs(row.getDouble(2) - nDup.toDouble / nSh) < 1e-6)
    assert(math.abs(row.getDouble(3) - dupMass.toDouble / mass.toDouble) < 1e-6)
    assert(row.getLong(4) == df.values.max)
  }

  test("embed_norm_anova: quantized-norm decomposition; SSB <= SST") {
    val embs = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val norms = embs.map { case (l, e) =>
      val q2 = e.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong)).map(q => q * q).sum
      (l, math.floor(math.sqrt(q2.toDouble) + 0.5).toLong)
    }
    val g = norms.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = norms.length; val k = g.size
    val st = norms.map(t => BigInt(t._2)).sum
    val qt = norms.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val sst = qt.toDouble - st.toDouble * st.toDouble / n
    val ssbQ = g.values.map { vs =>
      val sg = vs.map(BigInt(_)).sum
      val dm = sg.toDouble / vs.size - st.toDouble / n
      math.floor(dm * dm * vs.size / 1e6 + 0.5).toLong
    }.sum
    val ssb = ssbQ.toDouble * 1e6
    val row = queries.Extras199.embedNormAnova(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - ssb / sst) < 1e-5)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
    assert(math.abs(row.getDouble(3) - (ssb / (k - 1)) / ((sst - ssb) / (n - k))) < 1e-3)
  }

  test("text_casing_profile: regex class replay; shares sum <= 1") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (l, t) => t.split(" ", -1).map((l, _)) }
      .filter(_._2.matches("^[A-Za-z]+$"))
      .map { case (l, t) =>
        val cls = if (t.matches("^[a-z]+$")) "lower"
          else if (t.matches("^[A-Z][a-z]*$")) "title"
          else if (t.matches("^[A-Z]+$")) "upper" else "mixed"
        (l, cls)
      }
    val rows = queries.Extras199.textCasingProfile(spark, sf).collect()
    val byLang = toks.groupBy(_._1)
    assert(rows.length == byLang.size)
    rows.foreach { r =>
      val g = byLang(r.getString(0))
      val n = g.size
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - g.count(_._2 == "lower").toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(3) - g.count(_._2 == "title").toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(4) - g.count(_._2 == "upper").toDouble / n) < 1e-6)
      assert(r.getDouble(2) + r.getDouble(3) + r.getDouble(4) <= 1 + 1e-9)
      val hq = g.groupBy(_._2).values.map { c =>
        math.floor(c.size.toDouble * math.log(n.toDouble / c.size) * 1e9 + 0.5).toLong
      }.sum
      assert(math.abs(r.getDouble(5) - hq / 1e9 / n) < 1e-6)
    }
  }
}
