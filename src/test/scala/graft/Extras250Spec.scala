package graft

/** Wave-150 properties at sf0.001: driver replays of the MACD and
  * Keltner grid recursions, brute-force CCI/CMF window recounts, the
  * elementary price indices, DECIMAL GMROI identities, a plain-Scala
  * chrF recount, and the probe-panel RBF MMD.
  */
class Extras250Spec extends SparkSpec {

  private lazy val monthlyRevenue: Array[Long] = Tables.orders(spark, sf)
    .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m",
      "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
    .collect().map(r => (r.getString(0), r.getLong(1)))
    .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum).toArray

  private lazy val monthlyBars: Array[(Long, Long, Long)] = Tables.orders(spark, sf)
    .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m",
      "o_orderkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map { case (_, g) =>
      val sorted = g.sortBy(_._2)
      (sorted.last._3, g.map(_._3).max, g.map(_._3).min) // (c, h, l)
    }.toArray

  test("win_macd: matches the driver recursion replay") {
    val vs = monthlyRevenue
    var e12q = vs(0) * 1000L; var e26q = vs(0) * 1000L; var sgq = 0L
    var ncross = 0L; var maxh = 0L
    for (t <- 2 to vs.length) {
      val v = vs(t - 1)
      val prevH = e12q - e26q - sgq
      e12q = math.floor((2.0 / 13 * v + 11.0 / 13 * (e12q / 1e3)) * 1e3 + 0.5).toLong
      e26q = math.floor((2.0 / 27 * v + 25.0 / 27 * (e26q / 1e3)) * 1e3 + 0.5).toLong
      sgq = math.floor((2.0 / 10 * ((e12q - e26q) / 1e3)
        + 8.0 / 10 * (sgq / 1e3)) * 1e3 + 0.5).toLong
      val newH = e12q - e26q - sgq
      if ((prevH > 0 && newH < 0) || (prevH < 0 && newH > 0)) ncross += 1
      if (math.abs(newH) > maxh) maxh = math.abs(newH)
    }
    val row = queries.Extras250.winMacd(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == vs.length)
    assert(row.getAs[Long]("n_crossovers") == ncross)
    assert(math.abs(row.getAs[Double]("macd_dollars") - (e12q - e26q) / 1e3 / 100) < 1e-3)
    assert(math.abs(row.getAs[Double]("max_hist_dollars") - maxh / 1e3 / 100) < 1e-3)
  }

  test("win_keltner_channels: matches the driver recursion replay") {
    val bars = monthlyBars
    var emaq = (bars(0)._1 + bars(0)._2 + bars(0)._3) * 1000L
    var atrq = (bars(0)._2 - bars(0)._3) * 1000L
    var pc = bars(0)._1
    var nab = 0L; var nbl = 0L
    for (t <- 2 to bars.length) {
      val (c, h, l) = bars(t - 1)
      val tp3 = h + l + c
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      emaq = math.floor((2.0 / 21 * tp3 + 19.0 / 21 * (emaq / 1e3)) * 1e3 + 0.5).toLong
      atrq = math.floor((1.0 / 10 * tr + 9.0 / 10 * (atrq / 1e3)) * 1e3 + 0.5).toLong
      if (3000L * c > emaq + 6L * atrq) nab += 1
      if (3000L * c < emaq - 6L * atrq) nbl += 1
      pc = c
    }
    val row = queries.Extras250.winKeltnerChannels(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == bars.length)
    assert(row.getAs[Long]("n_above") == nab)
    assert(row.getAs[Long]("n_below") == nbl)
    assert(math.abs(row.getAs[Double]("atr_dollars") - atrq / 1e3 / 100) < 1e-3)
  }

  test("win_cci: matches a brute-force 20-window recount") {
    val tp3 = monthlyBars.map { case (c, h, l) => h + l + c }
    val evals = (19 until tp3.length).map { t =>
      val w = tp3.slice(t - 19, t + 1)
      val s20 = w.sum
      val sabs = w.map(x => math.abs(20 * x - s20)).sum
      (tp3(t), s20, sabs)
    }
    val above = evals.count { case (x, s, a) => 40 * (20 * x - s) > 3 * a }
    val below = evals.count { case (x, s, a) => 40 * (s - 20 * x) > 3 * a }
    val row = queries.Extras250.winCci(spark, sf).collect().head
    assert(row.getAs[Long]("n_eval") == evals.length)
    assert(row.getAs[Long]("n_above_100") == above)
    assert(row.getAs[Long]("n_below_100") == below)
    val (lx, ls, la) = evals.last
    val cci = if (la == 0) 0.0 else (20 * lx - ls).toDouble * 20 / (0.015 * la)
    assert(math.abs(row.getAs[Double]("last_cci") - cci) < 1e-2)
  }

  test("win_chaikin_money_flow: matches a brute-force 21-day recount") {
    val days = Tables.lineitem(spark, sf)
      .selectExpr("CAST(CAST(l_shipdate AS DATE) AS STRING) AS day",
        "l_orderkey", "l_linenumber",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) =>
        val c = g.maxBy(x => (x._2, x._3))._4
        val h = g.map(_._4).max; val l = g.map(_._4).min
        val vol = g.length.toLong
        val mfmq = if (h == l) 0L
          else math.floor((2 * c - h - l).toDouble / (h - l) * 1e9 + 0.5).toLong
        (mfmq * vol, vol)
      }.toArray
    val evals = (20 until days.length).map { t =>
      val w = days.slice(t - 20, t + 1)
      (w.map(_._1).sum, w.map(_._2).sum)
    }
    val pos = evals.count { case (m, v) => 5 * m > 1000000000L * v }
    val neg = evals.count { case (m, v) => -5 * m > 1000000000L * v }
    val row = queries.Extras250.winChaikinMoneyFlow(spark, sf).collect().head
    assert(row.getAs[Long]("n_eval") == evals.length)
    assert(row.getAs[Long]("n_strong_pos") == pos)
    assert(row.getAs[Long]("n_strong_neg") == neg)
    val (lm, lv) = evals.last
    assert(math.abs(row.getAs[Double]("last_cmf") - lm / 1e9 / lv) < 1e-5)
  }

  test("analytics_price_index_elementary: matches a plain-Scala replay") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "year(l_shipdate) AS y",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS e",
        "CAST(l_quantity AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val y0 = rows.map(_._2).min; val y1 = rows.map(_._2).max
    val byPart = rows.filter(r => r._2 == y0 || r._2 == y1).groupBy(_._1)
      .map { case (_, g) =>
        val g0 = g.filter(_._2 == y0); val g1 = g.filter(_._2 == y1)
        (g0.map(_._3).sum, g0.map(_._4).sum, g1.map(_._3).sum, g1.map(_._4).sum)
      }
      .filter(t => t._2 > 0 && t._4 > 0).toArray
    val n = byPart.length
    val rq = byPart.map { case (e0, q0, e1, q1) =>
      math.floor((e1.toDouble / q1) / (e0.toDouble / q0) * 1e9 + 0.5).toLong }
    val carli = rq.map(BigInt(_)).sum.toDouble / n / 1e9
    val row = queries.Extras250.analyticsPriceIndexElementary(spark, sf).collect().head
    assert(row.getAs[Long]("n_matched") == n)
    assert(math.abs(row.getAs[Double]("carli") - carli) < 1e-5)
    // index coherence: harmonic <= jevons <= carli (AM-GM-HM on relatives)
    assert(row.getAs[Double]("harmonic") <= row.getAs[Double]("jevons") + 1e-6)
    assert(row.getAs[Double]("jevons") <= row.getAs[Double]("carli") + 1e-6)
    val cswd = math.sqrt(row.getAs[Double]("carli") * row.getAs[Double]("harmonic"))
    assert(math.abs(row.getAs[Double]("cswd") - cswd) < 1e-4)
  }

  test("analytics_gmroi: matches an exact cents replay for one brand") {
    val rows = queries.Extras250.analyticsGmroi(spark, sf).collect()
    assert(rows.length == 25)
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .filter("p_brand = 'Brand#11'")
      .selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS e",
        "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dpc",
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS rp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact integer replay in 1e-4-dollar units
    val rev = li.map { case (e, dpc, _, _) => BigInt(e) * (100 - dpc) }.sum
    val cost = li.map { case (_, _, q, rp) => BigInt(q) * rp * 60 }.sum
    val units = li.map(_._3).sum
    val b11 = rows.find(_.getString(0) == "Brand#11").get
    assert(b11.getAs[Long]("units") == units)
    val gmroi = (rev - cost).toDouble / cost.toDouble
    assert(math.abs(b11.getAs[Double]("gmroi") - gmroi) < 1e-4)
  }

  test("text_chrf: matches a plain-Scala corpus recount") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "replace(lower(text), ' ', '') AS t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = docs.keys.filter(id => docs.contains(id + 1)).toSeq
    def gramCounts(s: String, n: Int): Map[String, Long] =
      if (s.length < n) Map.empty
      else s.sliding(n).toSeq.groupBy(identity).map { case (g, l) => (g, l.length.toLong) }
    def level(n: Int): (Long, Long, Long) = {
      var clip = 0L; var ctot = 0L; var rtot = 0L
      for (id <- pairs) {
        val c = gramCounts(docs(id), n); val r = gramCounts(docs(id + 1), n)
        ctot += c.values.sum; rtot += r.values.sum
        clip += c.map { case (g, cnt) => math.min(cnt, r.getOrElse(g, 0L)) }.sum
      }
      (clip, ctot, rtot)
    }
    def f(t: (Long, Long, Long)): Double = t match {
      case (0, _, _) => 0.0
      case (clip, ct, rt) =>
        val p = clip.toDouble / ct; val r = clip.toDouble / rt
        5 * p * r / (4 * p + r)
    }
    val row = queries.Extras250.textChrf(spark, sf).collect().head
    assert(row.getAs[Long]("n_pairs") == pairs.length)
    assert(math.abs(row.getAs[Double]("chrf1") - f(level(1))) < 1e-5)
    assert(math.abs(row.getAs[Double]("chrf2") - f(level(2))) < 1e-5)
    assert(math.abs(row.getAs[Double]("chrf3") - f(level(3))) < 1e-5)
  }

  test("embed_mmd_rbf: matches a plain-Scala probe-panel replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label % 2 = 0 AS ga",
        "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS qv")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getSeq[Long](2).toArray))
    val n = vecs.length
    // bandwidth from exact per-dim moments over the pooled corpus
    val v2 = (1 to 64).map { d =>
      val q = vecs.map(_._3(d - 1))
      val s1 = q.map(BigInt(_)).sum; val s2 = q.map(x => BigInt(x) * x).sum
      math.floor((s2.toDouble / n / 1e12
        - (s1.toDouble / n / 1e6) * (s1.toDouble / n / 1e6)) * 2 * 1e12 + 0.5).toLong
    }.sum / 1e12
    def kq(a: Array[Long], b: Array[Long]): Long = {
      val d2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      math.floor(math.exp(-(d2.toDouble / 1e12) / (2 * v2)) * 1e12 + 0.5).toLong
    }
    def term(pGa: Boolean, cGa: Boolean, excl: Boolean): (Long, BigInt) = {
      val pan = vecs.filter(v => v._2 == pGa && v._1 < 400)
      val cor = vecs.filter(_._2 == cGa)
      var cnt = 0L; var s = BigInt(0)
      for (p <- pan; c <- cor if !excl || c._1 != p._1) {
        cnt += 1; s += kq(p._3, c._3)
      }
      (cnt, s)
    }
    val (nxx, sxx) = term(pGa = true, cGa = true, excl = true)
    val (nyy, syy) = term(pGa = false, cGa = false, excl = true)
    val (nxy, sxy) = term(pGa = true, cGa = false, excl = false)
    val mmd2 = sxx.toDouble / 1e12 / nxx + syy.toDouble / 1e12 / nyy -
      2 * (sxy.toDouble / 1e12 / nxy)
    val row = queries.Extras250.embedMmdRbf(spark, sf).collect().head
    assert(row.getAs[Long]("n_x") == vecs.count(_._2))
    assert(row.getAs[Long]("n_y") == vecs.count(!_._2))
    assert(math.abs(row.getAs[Double]("sigma2") - v2) < 1e-4)
    assert(math.abs(row.getAs[Double]("mmd2_rbf") - mmd2) < 1e-6)
  }
}
