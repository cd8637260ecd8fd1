package graft

/** Wave-89 properties: multiclass MCC, balanced accuracy, weighted
  * kappa, Markov entropy rate replayed against brute force.
  */
class Extras189Spec extends SparkSpec {

  /** (true lang, predicted = majority lang of source) pairs. */
  private def confPairs(): Array[(String, String)] = {
    val docs = Tables.documents(spark, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val pred = docs.groupBy(_._1).view.mapValues { g =>
      g.groupBy(_._2).view.mapValues(_.size).toSeq.sortBy(t => (-t._2, t._1)).head._1
    }.toMap
    docs.map { case (src, lang) => (lang, pred(src)) }
  }

  test("stat_mcc_multiclass: Gorodkin R_K replay; |mcc| <= 1") {
    val pairs = confPairs()
    val s0 = pairs.length.toLong
    val c = pairs.count(p => p._1 == p._2).toLong
    val tk = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val pk = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cross = tk.keys.map(k => tk(k) * pk.getOrElse(k, 0L)).sum
    val t2 = tk.values.map(v => v * v).sum; val p2 = pk.values.map(v => v * v).sum
    val mcc = if (s0 * s0 == p2 || s0 * s0 == t2) 0.0 // single-class degenerate convention
      else (c.toDouble * s0 - cross) /
        math.sqrt((s0.toDouble * s0 - p2) * (s0.toDouble * s0 - t2))
    val row = queries.Extras189.statMccMulticlass(spark, sf).collect().head
    assert(row.getLong(0) == s0 && row.getLong(1) == c)
    assert(math.abs(row.getDouble(2) - mcc) < 1e-5)
    assert(math.abs(row.getDouble(2)) <= 1)
    assert(math.abs(row.getDouble(3) - c.toDouble / s0) < 1e-6)
  }

  test("stat_balanced_accuracy: macro recall replay; <= max recall") {
    val pairs = confPairs()
    val recalls = pairs.groupBy(_._1).values.map { g =>
      math.floor(g.count(p => p._1 == p._2).toDouble / g.size * 1e6 + 0.5) / 1e6
    }.toSeq
    val row = queries.Extras189.statBalancedAccuracy(spark, sf).collect().head
    assert(row.getLong(0) == recalls.size.toLong)
    assert(math.abs(row.getDouble(1) - recalls.sum / recalls.size) < 1e-5)
    assert(math.abs(row.getDouble(2) - recalls.min) < 1e-6)
    assert(row.getDouble(1) >= row.getDouble(2))
  }

  test("stat_weighted_kappa: linear-weight replay; kw <= ~1") {
    val cells = Tables.orders(spark, sf).select("o_orderpriority", "o_totalprice").collect()
      .map { r =>
        val x = r.getString(0).substring(0, 1).toInt
        val p = r.getDouble(1)
        val y = if (p < 60000) 1 else if (p < 120000) 2 else if (p < 180000) 3
          else if (p < 240000) 4 else 5
        (x, y)
      }
    val n = cells.length
    val wo = cells.map(c => math.abs(c._1 - c._2).toLong).sum
    val mx = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val my = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val we = (for (x <- mx.keys; y <- my.keys) yield
      math.abs(x - y).toLong * mx(x) * my(y)).sum
    val kw = 1 - wo.toDouble * n / we.toDouble
    val row = queries.Extras189.statWeightedKappa(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - kw) < 1e-5)
    assert(row.getDouble(1) <= 1)
  }

  test("time_markov_entropy_rate: H1 <= H0, predictive info >= 0") {
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).values.flatMap { g =>
      val s0 = g.sortBy(e => (e._2, e._3)).map(_._4)
      s0.zip(s0.tail)
    }.toSeq
    val nn = trans.size
    val nij = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ni = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val h1 = nij.map { case ((a, _), m) =>
      math.floor(m.toDouble * math.log(ni(a).toDouble / m) * 1e6 + 0.5).toLong
    }.sum.toDouble / 1e6 / nn
    val h0 = ni.values.map { m =>
      math.floor(m.toDouble * math.log(nn.toDouble / m) * 1e6 + 0.5).toLong
    }.sum.toDouble / 1e6 / nn
    val row = queries.Extras189.timeMarkovEntropyRate(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong)
    assert(math.abs(row.getDouble(1) - h1) < 1e-4)
    assert(math.abs(row.getDouble(2) - h0) < 1e-4)
    assert(row.getDouble(3) >= -1e-6) // conditioning cannot add entropy
  }
}
