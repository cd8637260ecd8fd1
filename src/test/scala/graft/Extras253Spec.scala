package graft

/** Wave-153 properties at sf0.001: driver replays of Mardia's moments,
  * EB shrinkage, Marascuilo pairs, the Heikin-Ashi recursion, the
  * concentration and Zenga indices, Pesaran CD, and the byte entropy.
  */
class Extras253Spec extends SparkSpec {

  test("embed_mardia_normality: matches a plain-Scala moment replay") {
    val raw = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val n = raw.length
    val mus = new Array[Double](64); val sgs = new Array[Double](64)
    for (d0 <- 0 until 64) {
      val q = raw.map(v => math.floor(v._2(d0).toDouble * 1e6 + 0.5).toLong)
      val s1 = q.map(BigInt(_)).sum; val s2 = q.map(x => BigInt(x) * x).sum
      mus(d0) = s1.toDouble / n / 1e6
      sgs(d0) = math.sqrt(s2.toDouble / n / 1e12 - (s1.toDouble / n / 1e6) * (s1.toDouble / n / 1e6))
    }
    def z(v: Array[Float]): Array[Double] =
      (0 until 64).map(i => (v(i).toDouble - mus(i)) / sgs(i)).toArray
    val mq = raw.map(v => math.floor(z(v._2).map(x => x * x).sum * 1e9 + 0.5).toLong)
    val b2 = mq.map(x => BigInt(x) * x).sum.toDouble / n / 1e18
    val row = queries.Extras253.embedMardiaNormality(spark, sf).collect().head
    assert(row.getAs[Long]("n_vectors") == n)
    assert(math.abs(row.getAs[Double]("mardia_b2") - b2) < 1e-4)
    // diagonal-standardized Gaussian-ish data: b2 lands near p(p+2)
    assert(math.abs(b2 - 4224) < 4224 * 0.2)
    val pan = raw.filter(_._1 < 200)
    var sc = BigInt(0); var np = 0L
    for (p <- pan; c <- raw) {
      val dot = z(p._2).zip(z(c._2)).map { case (a, b) => a * b }.sum
      sc += math.floor(math.pow(dot, 3) * 1e6 + 0.5).toLong; np += 1
    }
    assert(math.abs(row.getAs[Double]("mardia_b1_probe") - sc.toDouble / np / 1e6) < 1e-4)
  }

  test("stat_beta_binomial_eb: shrinkage pulls every rate toward the mean") {
    val rows = queries.Extras253.statBetaBinomialEb(spark, sf).collect()
    assert(rows.length == 25)
    val m1 = rows.map(r => r.getAs[Double]("raw_rate")).sum / 25
    for (r <- rows) {
      val raw = r.getAs[Double]("raw_rate"); val shr = r.getAs[Double]("shrunk_rate")
      // every posterior sits strictly between the raw rate and the pooled mean
      assert((shr - raw) * (m1 - raw) >= 0, s"${r.getString(0)}: $raw -> $shr vs $m1")
      assert(math.abs(shr - raw) <= math.abs(m1 - raw) + 1e-9)
      assert(r.getAs[Double]("alpha") > 0 && r.getAs[Double]("beta") > 0)
    }
  }

  test("stat_marascuilo: matches a plain-Scala pairwise replay") {
    val g = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_orderpriority AS grp", "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS r")
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).map { case (k, l) => (k, l.length.toLong, l.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val rows = queries.Extras253.statMarascuilo(spark, sf).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val a = g.find(_._1 == r.getString(0)).get
      val b = g.find(_._1 == r.getString(1)).get
      val pa = a._3.toDouble / a._2; val pb = b._3.toDouble / b._2
      assert(math.abs(r.getAs[Double]("diff") - math.abs(pa - pb)) < 1e-5)
      val crit = math.sqrt(9.488) * math.sqrt(pa * (1 - pa) / a._2 + pb * (1 - pb) / b._2)
      assert(math.abs(r.getAs[Double]("critical") - crit) < 1e-5)
      assert(r.getAs[Boolean]("significant") ==
        (math.floor(math.abs(pa - pb) * 1e9 + 0.5) > math.floor(crit * 1e9 + 0.5)))
    }
  }

  test("win_heikin_ashi: matches the driver recursion replay") {
    val bars = Tables.orders(spark, sf)
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) =>
        val o = g.minBy(_._2)._3; val c = g.maxBy(_._2)._3
        (o, o + g.map(_._3).max + g.map(_._3).min + c)
      }.toArray
    var haoq = bars(0)._1 * 1000L; var pc4 = bars(0)._2
    var nb = 0L; var mr = 0L; var run = 0L
    for (t <- 2 to bars.length) {
      val hac4 = bars(t - 1)._2
      haoq = math.floor((haoq / 1e3 + pc4 / 4.0) / 2 * 1e3 + 0.5).toLong
      if (hac4 * 1000L > 4L * haoq) { nb += 1; run += 1; if (run > mr) mr = run }
      else run = 0
      pc4 = hac4
    }
    val row = queries.Extras253.winHeikinAshi(spark, sf).collect().head
    assert(row.getAs[Long]("n_months") == bars.length)
    assert(row.getAs[Long]("n_bull_months") == nb)
    assert(row.getAs[Long]("longest_bull_run") == mr)
    assert(math.abs(row.getAs[Double]("final_ha_open_dollars") - haoq / 1e3 / 100) < 1e-3)
  }

  test("analytics_concentration_index: matches a plain-Scala replay") {
    val spend = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), org.apache.spark.sql.functions.expr("c_custkey = o_custkey"), "left")
      .selectExpr("c_custkey",
        "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS w",
        "coalesce(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT), 0L) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).toArray
      .map { case ((ck, w), g) => (ck, w, g.map(_._3).sum) }
      .sortBy(t => (t._2, t._1))
    val n = spend.length
    val sy = spend.map(x => BigInt(x._3)).sum
    val sry = spend.zipWithIndex.map { case ((_, _, y), i) => BigInt(i + 1) * y }.sum
    val ci = 2 * sry.toDouble / (n.toDouble * sy.toDouble) - (n + 1.0) / n
    val row = queries.Extras253.analyticsConcentrationIndex(spark, sf).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(math.abs(row.getAs[Double]("concentration_index") - ci) < 1e-5)
    assert(math.abs(ci) < 1) // a proper relative index
  }

  test("stat_pesaran_cd: matches a plain-Scala panel replay") {
    val cells = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .selectExpr("substring(CAST(o_orderdate AS STRING), 1, 7) AS m", "c_nationkey AS nk",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val months = cells.map(_._1).distinct.sorted
    val byCell = cells.groupBy(t => (t._1, t._2)).map { case (k, g) => (k, g.map(_._3).sum) }
    val series = (0 until 25).map(nk =>
      months.map(m => byCell.getOrElse((m, nk), 0L)).toArray).toArray
    val t = months.length.toLong
    var srho = 0L; var np = 0
    for (i <- 0 until 25; j <- (i + 1) until 25) {
      val (a, b) = (series(i), series(j))
      val sa = a.map(BigInt(_)).sum.toDouble; val sb = b.map(BigInt(_)).sum.toDouble
      val saa = a.map(x => BigInt(x) * x).sum.toDouble
      val sbb = b.map(x => BigInt(x) * x).sum.toDouble
      val sab = a.zip(b).map { case (x, y) => BigInt(x) * y }.sum.toDouble
      val rho = (t * sab - sa * sb) /
        math.sqrt(t * saa - sa * sa) / math.sqrt(t * sbb - sb * sb)
      srho += math.floor(rho * 1e9 + 0.5).toLong; np += 1
    }
    val row = queries.Extras253.statPesaranCd(spark, sf).collect().head
    assert(row.getAs[Long]("n_pairs") == np)
    assert(row.getAs[Long]("n_months") == t)
    assert(math.abs(row.getAs[Double]("cd_stat") -
      math.sqrt(2 * t.toDouble / (25 * 24)) * (srho / 1e9)) < 1e-3)
  }

  test("multimodal_image_entropy: matches a plain-Scala byte-histogram replay") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hist = new Array[Long](256)
    for ((id, t) <- texts) {
      val blob = graft.sources.MediaCodec.encodePng(t.getBytes("UTF-8"))
      val px = graft.sources.MediaCodec.decodePayload(id, blob)
      px.foreach(b => hist(b & 0xff) += 1)
    }
    val n = hist.sum
    val slnq = hist.filter(_ > 0)
      .map(c => BigInt(math.floor(c * math.log(c.toDouble) * 1e6 + 0.5).toLong)).sum
    val ent = math.log(n.toDouble) - slnq.toDouble / 1e6 / n
    val row = queries.Extras253.multimodalImageEntropy(spark, sf).collect().head
    assert(row.getAs[Long]("n_bytes") == n)
    assert(row.getAs[Long]("n_distinct_bytes") == hist.count(_ > 0))
    assert(math.abs(row.getAs[Double]("entropy_nats") - ent) < 1e-5)
    assert(ent > 0 && ent <= math.log(256.0))
  }

  test("analytics_zenga_index: matches a plain-Scala Lorenz replay") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).map(_._1)
    val n = vs.length
    val sv = vs.map(BigInt(_)).sum
    var cum = BigInt(0); var sz = BigInt(0)
    for (i <- 1 until n) { // i < n splits
      cum += vs(i - 1)
      val l = cum.toDouble / sv.toDouble
      val p = i.toDouble / n
      sz += math.floor((1 - l / p * ((1 - p) / (1 - l))) * 1e12 + 0.5).toLong
    }
    val z = sz.toDouble / (n - 1) / 1e12
    val row = queries.Extras253.analyticsZengaIndex(spark, sf).collect().head
    assert(row.getAs[Long]("n_orders") == n)
    assert(math.abs(row.getAs[Double]("zenga_index") - z) < 1e-5)
    assert(z > 0 && z < 1)
  }
}
