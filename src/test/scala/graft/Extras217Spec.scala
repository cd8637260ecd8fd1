package graft

/** Wave-117 properties: IPTW arithmetic replay, the conformal coverage
  * guarantee, the linear MMD pair replay, and exact BFS closeness —
  * at sf0.001.
  */
class Extras217Spec extends SparkSpec {

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("stat_propensity_iptw: matches the binned Hajek replay") {
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey AS ck", "c_mktsegment = 'BUILDING' AS t",
        """least(greatest((CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)
          + 100000) div 22000, 0L), 49L) AS b""")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val rev = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val per = cust.map { case (ck, t, b) => (b, t, rev.getOrElse(ck, 0L)) }
    val byBin = per.groupBy(_._1).filter { case (_, g) =>
      g.exists(_._2) && g.exists(!_._2)
    }
    var st1 = BigInt(0); var st0 = BigInt(0); var nUsed = 0L
    byBin.foreach { case (_, g) =>
      val nb = g.length; val nt = g.count(_._2)
      val syt = g.filter(_._2).map(x => BigInt(x._3)).sum
      val syc = g.filterNot(_._2).map(x => BigInt(x._3)).sum
      st1 += BigInt(math.floor(syt.toDouble * nb / nt + 0.5).toLong)
      st0 += BigInt(math.floor(syc.toDouble * nb / (nb - nt) + 0.5).toLong)
      nUsed += nb
    }
    val row = queries.Extras217.statPropensityIptw(spark, sf).collect().head
    assert(row.getLong(0) == byBin.size.toLong)
    assert(row.getLong(1) == nUsed)
    val mu1 = st1.toDouble / nUsed / 100
    val mu0 = st0.toDouble / nUsed / 100
    assert(math.abs(row.getDouble(2) - mu1) < 1e-3)
    assert(math.abs(row.getDouble(3) - mu0) < 1e-3)
    assert(math.abs(row.getDouble(4) - (mu1 - mu0)) < 2e-3)
  }

  test("stat_conformal_interval: quantile replay; coverage near the 90% guarantee") {
    val base = Tables.orders(spark, sf)
      .selectExpr("o_orderkey AS okey", "o_orderpriority AS g",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cal = base.filter(_._1 % 2 == 1)
    val test0 = base.filter(_._1 % 2 == 0)
    val fit = cal.groupBy(_._2).map { case (g, rows) =>
      (g, rows.map(x => BigInt(x._3)).sum.toDouble / rows.length)
    }
    val scores = cal.map(r => (math.abs(r._3 - fit(r._2)), r._1)).sortBy(identity)
    val rStar = math.min(math.ceil(0.9 * (scores.length + 1)).toLong, scores.length.toLong)
    val qhat = scores(rStar.toInt - 1)._1
    val cov = test0.count(r => math.abs(r._3 - fit(r._2)) <= qhat).toDouble / test0.length
    val row = queries.Extras217.statConformalInterval(spark, sf).collect().head
    assert(row.getLong(0) == cal.length.toLong)
    assert(row.getLong(1) == test0.length.toLong)
    assert(math.abs(row.getDouble(2) - qhat / 100) < 1e-5)
    assert(math.abs(row.getDouble(3) - cov) < 1e-6)
    assert(row.getDouble(3) > 0.85 && row.getDouble(3) <= 1.0,
      s"split-conformal coverage ${row.getDouble(3)} near the nominal 0.9")
  }

  test("stat_mmd_linear: matches the pairwise replay; magnitude bounded by 2") {
    val base = Tables.customer(spark, sf)
      .filter("c_mktsegment IN ('BUILDING','MACHINERY')")
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("c_custkey = o_custkey"))
      .selectExpr("c_mktsegment = 'BUILDING' AS ga",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv", "o_orderkey")
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    val n = base.length.toDouble
    val s1 = base.map(r => BigInt(r._2)).sum.toDouble
    val s2 = base.map(r => BigInt(r._2) * r._2).sum.toDouble
    val v2 = (n * s2 - s1 * s1) / (n * (n - 1))
    def ordered(flag: Boolean) = base.filter(_._1 == flag)
      .map(r => (md5hex(r._3.toString), r._3, r._2))
      .sortBy(t => (t._1, t._2)).map(_._3)
    val xs = ordered(true); val ys = ordered(false)
    def k(a: Long, b: Long): Double =
      math.exp(-(a.toDouble - b) * (a.toDouble - b) / (2 * v2))
    val np = math.min(xs.length / 2, ys.length / 2)
    var sh = BigInt(0)
    (0 until np).foreach { i =>
      val (x1, x2, y1, y2) = (xs(2 * i), xs(2 * i + 1), ys(2 * i), ys(2 * i + 1))
      val h = k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1)
      sh += BigInt(math.floor(h * 1e12 + 0.5).toLong)
    }
    val row = queries.Extras217.statMmdLinear(spark, sf).collect().head
    assert(row.getLong(0) == np.toLong)
    assert(math.abs(row.getDouble(1) - math.sqrt(v2) / 100) < 1e-2)
    assert(math.abs(row.getDouble(2) - sh.toDouble / 1e12 / np) < 1e-8)
    assert(math.abs(row.getDouble(2)) <= 2.0, "h-statistic mean bounded by kernel range")
  }

  test("graph_closeness_centrality: exact BFS replay over the deterministic graph") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val n = users.length.toLong
    val edges = users.flatMap(u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n).filter(_ != u).map(d => (u, d)))
      .distinct.groupBy(_._1).map { case (s0, g) => (s0, g.map(_._2).toSet) }
    val rows = queries.Extras217.graphClosenessCentrality(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      val src = r.getLong(0)
      var dist = Map(src -> 0L)
      var frontier = Set(src)
      for (k <- 1 to 8) {
        frontier = frontier.flatMap(v => edges.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        dist = dist ++ frontier.map(_ -> k.toLong)
      }
      assert(r.getLong(1) == dist.size.toLong, s"reached from $src")
      assert(r.getLong(2) == dist.values.max, s"ecc8 from $src")
      val sd = dist.values.sum
      assert(math.abs(r.getDouble(3) - (dist.size - 1).toDouble / sd) < 1e-9)
    }
  }
}
