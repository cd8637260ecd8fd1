package graft

/** Wave-79 properties: Katz, 4-cycles, k_nn curve, heavy-tail audit
  * replayed against brute force on the sf0.001 deterministic graph.
  */
class Extras179Spec extends SparkSpec {

  /** Rebuild the deterministic graph exactly as the queries do. */
  private def graph(): (Array[Long], Set[(Long, Long)], Set[(Long, Long)]) = {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val n = users.length.toLong
    val dir = users.flatMap(u =>
      Seq((u * 7 + 3) % n, (u * 13 + 11) % n, (u * 29 + 17) % n).map(v => (u, v))).toSet
    val und = dir.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    (users, dir, und)
  }

  test("graph_katz_centrality: integer-mu fixed-point replay") {
    val (users, dir, _) = graph()
    var x = users.map(u => u -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val inflow = dir.toSeq.groupBy(_._2).view.mapValues(_.map(e => x(e._1)).sum).toMap
      x = users.map(u => u -> (1000000L + 50 * inflow.getOrElse(u, 0L) / 1000)).toMap
    }
    val top = x.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = queries.Extras179.graphKatzCentrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == top, s"got=$got want=$top")
  }

  test("graph_four_cycles: brute-force common-neighbor replay") {
    val (_, _, und) = graph()
    val adjM = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val verts = adjM.keys.toSeq.sorted
    val cns = for {
      i <- verts.indices; j <- i + 1 until verts.length
      cn = adjM(verts(i)).intersect(adjM(verts(j))).size if cn > 0
    } yield cn
    val c4 = cns.map(c => c.toLong * (c - 1) / 2).sum
    val row = queries.Extras179.graphFourCycles(spark, sf).collect().head
    assert(row.getLong(0) == cns.size.toLong)
    assert(row.getLong(1) == c4)
    assert(row.getLong(2) == cns.max.toLong)
  }

  test("graph_avg_neighbor_degree: k_nn(k) curve replay") {
    val (_, _, und) = graph()
    val adjM = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val deg = adjM.view.mapValues(_.size.toLong).toMap
    val knnMu = adjM.map { case (v, nbrs) =>
      v -> nbrs.map(deg).sum * 1000000L / deg(v)
    }
    val expect = knnMu.groupBy(kv => deg(kv._1)).map { case (d0, m) =>
      (d0, m.size.toLong, m.values.sum.toDouble / m.size / 1e6)
    }.toSeq.sortBy(_._1)
    val got = queries.Extras179.graphAvgNeighborDegree(spark, sf).collect()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (d0, nv, avg)) =>
      assert(r.getLong(0) == d0 && r.getLong(1) == nv)
      assert(math.abs(r.getDouble(2) - avg) < 1e-3)
    }
  }

  test("graph_degree_heavy_tail: Gini/Molloy-Reed/top-share replay") {
    val (_, _, und) = graph()
    val deg = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.size.toLong).values.toSeq.sorted
    val n = deg.length
    val sd = deg.sum.toDouble
    val gini = deg.zipWithIndex.map { case (d0, i) => (2.0 * (i + 1) - n - 1) * d0 }.sum / (n * sd)
    val mr = deg.map(d0 => d0.toDouble * d0).sum / sd
    val k = (n + 99) / 100
    val top = deg.takeRight(k).sum.toDouble / sd
    val row = queries.Extras179.graphDegreeHeavyTail(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - gini) < 1e-5)
    assert(math.abs(row.getDouble(2) - mr) < 1e-3)
    assert(math.abs(row.getDouble(3) - top) < 1e-5)
    assert(row.getDouble(2) >= 2.0 || row.getDouble(1) < 0.5) // sane graph shape
  }
}
