package graft

import org.apache.spark.sql.functions._

/** Wave-71 properties: demand quadrants, Jonckheere, FPC interval,
  * prune curve replays against brute force on sf0.001.
  */
class Extras171Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("analytics_demand_classification: per-part quadrant replay") {
    val parts = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong,
        r.getAs[java.time.LocalDateTime](2).toLocalDate.toEpochDay))
      .groupBy(_._1).filter(_._2.length >= 2)
    val cls = parts.values.map { g =>
      val n = g.length.toLong
      val sq = g.map(_._2).sum; val qq = g.map(t => t._2 * t._2).sum
      val span = g.map(_._3).max - g.map(_._3).min
      val inter = span * 25 > 33 * (n - 1)
      val err = BigInt(100) * (BigInt(n) * qq - BigInt(sq) * sq) > BigInt(49) * sq * sq
      val c = if (inter && err) "lumpy" else if (inter) "intermittent"
        else if (err) "erratic" else "smooth"
      (c, sq)
    }.toSeq
    val expect = cls.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = queries.Extras171.analyticsDemandClassification(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (np, td) = expect(r.getString(0))
      assert(r.getLong(1) == np && r.getLong(2) == td)
    }
  }

  test("stat_jonckheere_terpstra: O(n^2) brute-force pair replay") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1).take(1).toLong)).toMap
    val v = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity").collect()
      .map(r => (ord(r.getLong(0)), r.getDouble(1).toLong))
    val groups = v.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gs = groups.keys.toSeq.sorted
    var j = 0.0
    for (i <- gs.indices; k <- i + 1 until gs.length) {
      for (x <- groups(gs(i)); y <- groups(gs(k))) {
        if (x < y) j += 1 else if (x == y) j += 0.5
      }
    }
    val n = v.length.toLong
    val ngs = gs.map(g => groups(g).length.toLong)
    val e = (n.toDouble * n - ngs.map(x => x.toDouble * x).sum) / 4
    val vv = (n.toDouble * n * (2 * n + 3) -
      ngs.map(x => x.toDouble * x * (2 * x + 3)).sum) / 72
    val z = (j - e) / math.sqrt(vv)
    val row = queries.Extras171.statJonckheereTerpstra(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - j) < 1.0)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
    assert(row.getBoolean(3) == (math.abs(z) > 1.96))
  }

  test("sample_fpc_interval: deterministic sample replay; CI brackets estimate") {
    val pop = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    def hex2(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16)
    }
    val smp = pop.filter(t => hex2(t._1) < 26).map(_._2)
    val n = smp.length; val bigN = pop.length
    val ybar = smp.map(BigInt(_)).sum.toDouble / n
    val ss = smp.map(BigInt(_)).sum; val qs = smp.map(c => BigInt(c) * c).sum
    val sd = math.sqrt((BigInt(n) * qs - ss * ss).toDouble) / math.sqrt(n.toDouble) /
      math.sqrt(n - 1.0)
    val half = 1.96 * sd / math.sqrt(n.toDouble) * math.sqrt(1 - n.toDouble / bigN)
    val row = queries.Extras171.sampleFpcInterval(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == bigN.toLong)
    assert(math.abs(row.getDouble(2) - ybar / 100) < 0.02)
    assert(math.abs(row.getDouble(3) - (ybar - half) / 100) < 0.02)
    assert(math.abs(row.getDouble(4) - (ybar + half) / 100) < 0.02)
    assert(row.getDouble(3) < row.getDouble(2) && row.getDouble(2) < row.getDouble(4))
  }

  test("pipeline_quality_prune_curve: per-doc ppm replay; curve monotone") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val scored = docs.map { t =>
      val len = t.length.toLong
      val letters = t.toLowerCase.count(c => (c >= 'a' && c <= 'z') || c == ' ').toLong
      (letters * 1000000L / len, len)
    }
    val nd = scored.length; val nc = scored.map(_._2).sum
    val got = queries.Extras171.pipelineQualityPruneCurve(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == (5 to 11).map(_ * 50000L))
    var prev = Long.MaxValue
    got.foreach { r =>
      val thr = r.getLong(0)
      val kept = scored.filter(_._1 >= thr)
      assert(r.getLong(1) == kept.length.toLong)
      assert(math.abs(r.getDouble(2) - kept.length.toDouble / nd) < 1e-6)
      assert(math.abs(r.getDouble(3) - kept.map(_._2).sum.toDouble / nc) < 1e-6)
      assert(r.getLong(1) <= prev); prev = r.getLong(1) // monotone curve
    }
  }
}
