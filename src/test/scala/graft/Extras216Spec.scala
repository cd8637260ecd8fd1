package graft

/** Wave-116 properties: bracketing-replay interpolation, EM vs an
  * unquantized double replay + mean preservation, Kalman recursion
  * replay + gain bounds, and ARI vs the textbook double formula — at
  * sf0.001.
  */
class Extras216Spec extends SparkSpec {

  test("join_interpolation_asof: per-user brute-force bracket replay; interp bounded") {
    val ev = Tables.events(spark, sf)
      .filter("event_type IN ('view','purchase')")
      .selectExpr("event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS t",
        "event_type AS et", "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val byUser = ev.groupBy(_._2).map { case (u, g) =>
      (u, g.sortBy(e => (e._3, e._1)))
    }
    val expected = byUser.values.flatten.filter(_._4 == "view").flatMap { v =>
      val seq0 = byUser(v._2)
      val idx = seq0.indexWhere(_._1 == v._1)
      val prev = seq0.take(idx).filter(_._4 == "purchase").lastOption
      val next = seq0.drop(idx + 1).filter(_._4 == "purchase").headOption
      (prev, next) match {
        case (None, None) => None
        case (Some(p), None) => Some((v._1, "locf", p._5.toDouble / 100))
        case (None, Some(nx)) => Some((v._1, "lead", nx._5.toDouble / 100))
        case (Some(p), Some(nx)) =>
          val iv = p._5 + (nx._5.toDouble - p._5) *
            ((v._3 - p._3).toDouble / (nx._3 - p._3))
          Some((v._1, "interp", iv / 100))
      }
    }.toSeq.sortBy(_._1)
    val rows = queries.Extras216.joinInterpolationAsof(spark, sf).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (eid, kind, value)) =>
      assert(r.getLong(0) == eid)
      assert(r.getString(2) == kind, s"bracket for $eid")
      assert(math.abs(r.getDouble(3) - value) < 1e-5, s"value for $eid")
    }
    assert(expected.exists(_._2 == "interp"), "fixture exercises interpolation")
  }

  test("stat_gaussian_mixture_em: close to the unquantized replay; preserves the mean") {
    val bins = Tables.orders(spark, sf)
      .selectExpr("""least(greatest(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        div 200000, 0L), 299L) AS b""")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (b, g) => (2000.0 * b + 1000, g.length.toLong) }
      .toSeq.sortBy(_._1)
    val n = bins.map(_._2).sum.toDouble
    val mean = bins.map { case (m, c) => m * c }.sum / n
    val vr = bins.map { case (m, c) => m * m * c }.sum / n - mean * mean
    var (mu1, v1, mu2, v2, pi) = (mean - math.sqrt(vr), vr, mean + math.sqrt(vr), vr, 0.5)
    for (_ <- 1 to 8) {
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      bins.foreach { case (m, c) =>
        val p1 = pi * math.exp(-(m - mu1) * (m - mu1) / (2 * v1)) / math.sqrt(v1)
        val p2 = (1 - pi) * math.exp(-(m - mu2) * (m - mu2) / (2 * v2)) / math.sqrt(v2)
        val r = p1 / (p1 + p2)
        s0 += r * c; s1 += r * c * m; s2 += r * c * m * m
      }
      pi = s0 / n
      mu1 = s1 / s0; v1 = math.max(s2 / s0 - mu1 * mu1, 1.0)
      val t0 = n - s0
      val t1 = bins.map { case (m, c) => m * c }.sum - s1
      val t2 = bins.map { case (m, c) => m * m * c }.sum - s2
      mu2 = t1 / t0; v2 = math.max(t2 / t0 - mu2 * mu2, 1.0)
    }
    val row = queries.Extras216.statGaussianMixtureEm(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - pi) < 1e-4)
    assert(math.abs(row.getDouble(2) - mu1) < 1.0, s"mu1 ${row.getDouble(2)} vs $mu1")
    assert(math.abs(row.getDouble(4) - mu2) < 1.0)
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 1)
    assert(row.getDouble(2) < row.getDouble(4), "components stay ordered")
    val mixMean = row.getDouble(1) * row.getDouble(2) +
      (1 - row.getDouble(1)) * row.getDouble(4)
    assert(math.abs(mixMean - mean) / mean < 1e-3, "EM preserves the binned mean")
  }

  test("time_kalman_level: matches the recursion replay; gain in (0,1)") {
    val ms = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS m",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cv")
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(x => BigInt(x._2)).sum.toLong)
    val ds = (1 until ms.length).map(t => ms(t) - ms(t - 1))
    val nd = ds.length.toDouble
    val sd1 = ds.map(BigInt(_)).sum.toDouble
    val sd2 = ds.map(x => BigInt(x) * x).sum.toDouble
    val vd = (nd * sd2 - sd1 * sd1) / (nd * (nd - 1))
    var lvl = ms(0).toDouble; var p = vd; var k = 0.0
    for (t <- 1 until ms.length) {
      val pp = p + vd / 10
      k = pp / (pp + vd / 2)
      lvl += k * (ms(t) - lvl)
      p = (1 - k) * pp
    }
    val row = queries.Extras216.timeKalmanLevel(spark, sf).collect().head
    assert(row.getLong(0) == ms.length.toLong)
    assert(math.abs(row.getDouble(1) - lvl / 100) < 1e-2)
    assert(math.abs(row.getDouble(2) - k) < 1e-6)
    assert(math.abs(row.getDouble(3) - math.sqrt(p) / 100) < 1e-2)
    assert(row.getDouble(2) > 0 && row.getDouble(2) < 1, "gain strictly inside (0,1)")
  }

  test("embed_adjusted_rand_index: matches the textbook double formula; ari <= 1") {
    val pts = Tables.embeddings(spark, sf)
      .selectExpr("embedding[0] >= 0 AS b8", "embedding[16] >= 0 AS b4",
        "embedding[32] >= 0 AS b2", "embedding[48] >= 0 AS b1", "label")
      .collect().map(r => ((if (r.getBoolean(0)) 8 else 0) + (if (r.getBoolean(1)) 4 else 0)
        + (if (r.getBoolean(2)) 2 else 0) + (if (r.getBoolean(3)) 1 else 0), r.getInt(4)))
    def c2(x: Long): Double = x.toDouble * (x - 1) / 2
    val nij = pts.groupBy(identity).map(_._2.length.toLong)
    val ai = pts.groupBy(_._1).map(_._2.length.toLong)
    val bj = pts.groupBy(_._2).map(_._2.length.toLong)
    val n = pts.length.toLong
    val index = nij.map(c2).sum
    val ea = ai.map(c2).sum; val eb = bj.map(c2).sum
    val expd = ea * eb / c2(n)
    val ari = (index - expd) / ((ea + eb) / 2 - expd)
    val row = queries.Extras216.embedAdjustedRandIndex(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == ai.size.toLong && row.getLong(2) == bj.size.toLong)
    assert(math.abs(row.getDouble(3) - ari) < 1e-6, s"ARI ${row.getDouble(3)} vs $ari")
    assert(row.getDouble(3) <= 1.0)
  }
}
