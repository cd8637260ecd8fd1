package graft

/** Wave-129 properties: the four spatial statistics vs driver-side
  * grid replays (hash cells recomputed through Spark itself so the
  * replay checks the ALGEBRA, not the md5) — at sf0.001.
  */
class Extras229Spec extends SparkSpec {

  private def grid(): Map[(Long, Long), (BigInt, Long)] =
    Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey"), Seq("o_custkey"))
      .selectExpr(
        "CAST(pmod(conv(substring(md5(concat('x', CAST(o_custkey AS STRING))), 1, 4), 16, 10), 32) AS LONG) AS cx",
        "CAST(pmod(conv(substring(md5(concat('y', CAST(o_custkey AS STRING))), 1, 4), 16, 10), 32) AS LONG) AS cy",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> (xs.map(x => BigInt(x._3)).sum, xs.length.toLong) }

  test("stat_getis_ord_g: matches the torus rook replay") {
    val g = grid()
    var num = BigInt(0)
    g.foreach { case ((cx, cy), (v, _)) =>
      Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L)).foreach { case (dx, dy) =>
        g.get((((cx + dx) % 32 + 32) % 32, ((cy + dy) % 32 + 32) % 32))
          .foreach { case (vn, _) => num += v * vn }
      }
    }
    val sv = g.values.map(_._1).sum
    val sv2 = g.values.map(x => x._1 * x._1).sum
    val n = g.size
    val gg = num.toDouble / (sv.toDouble * sv.toDouble - sv2.toDouble)
    val eg = 4.0 * n / (n.toDouble * (n - 1))
    val row = queries.Extras229.statGetisOrdG(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - gg) < 1e-7, s"G ${row.getDouble(1)} vs $gg")
    assert(math.abs(row.getDouble(2) - eg) < 1e-7)
    assert(math.abs(row.getDouble(3) - gg / eg) < 1e-4)
    assert(row.getString(4) == (if (gg > eg) "high_clustering" else "dispersed_or_low"))
  }

  test("stat_join_count: edge counts add up; matches the replay") {
    val g = grid()
    val n = g.size
    val sorted = g.toSeq.sortBy { case ((cx, cy), (v, _)) => (v, cx, cy) }
    val gm = sorted(math.ceil(n / 2.0).toInt - 1)._2._1
    val hot = g.map { case (k, (v, _)) => k -> (if (v > gm) 1L else 0L) }
    var (bb, ww, bw, w) = (0L, 0L, 0L, 0L)
    hot.foreach { case ((cx, cy), h) =>
      Seq(((cx + 1) % 32, cy), (cx, (cy + 1) % 32)).foreach { k2 =>
        hot.get(k2).foreach { h2 =>
          w += 1
          if (h == 1 && h2 == 1) bb += 1
          else if (h == 0 && h2 == 0) ww += 1
          else bw += 1
        }
      }
    }
    val row = queries.Extras229.statJoinCount(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == w)
    assert(row.getLong(2) == bb && row.getLong(3) == ww && row.getLong(4) == bw)
    assert(bb + ww + bw == w, "every edge classified once")
    val nb = hot.values.sum
    assert(math.abs(row.getDouble(6) - 2.0 * w * nb / n * (n - nb) / n) < 1e-3)
  }

  test("stat_knox_spacetime: matches histogram algebra; X <= min(S, T)") {
    val e = Tables.events(spark, sf)
      .selectExpr(
        "CAST(pmod(conv(substring(md5(CAST(user_id AS STRING)), 1, 4), 16, 10), 16) AS LONG) AS cell",
        "CAST(date_trunc('hour', ts) AS STRING) AS h")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def pairs[K](key: ((Long, String)) => K): BigInt =
      e.groupBy(key).values.map(xs => BigInt(xs.length) * (xs.length - 1) / 2).sum
    val x = pairs(identity)
    val s2 = pairs(_._1)
    val t2 = pairs(_._2)
    val n = e.length
    val ex = s2.toDouble * t2.toDouble / (n.toDouble * (n - 1) / 2)
    val row = queries.Extras229.statKnoxSpacetime(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == x.toLong && row.getLong(2) == s2.toLong && row.getLong(3) == t2.toLong)
    assert(x <= s2.min(t2), "close-close pairs bounded by each margin")
    assert(math.abs(row.getDouble(4) - ex) < math.abs(ex) * 1e-6 + 1e-3)
    assert(math.abs(row.getDouble(5) - (x.toDouble - ex) / math.sqrt(ex)) < 1e-3)
  }

  test("stat_ripley_k: matches the ring replay; K grows with r") {
    val g = grid()
    val n = g.values.map(_._2).sum
    def ringPairs(r: Int): BigInt = {
      var p = BigInt(0)
      g.foreach { case ((cx, cy), (_, np)) =>
        for (dx <- -r to r; dy <- -r to r) {
          val k2 = (((cx + dx) % 32 + 32) % 32, ((cy + dy) % 32 + 32) % 32)
          g.get(k2).foreach { case (_, np2) =>
            p += BigInt(np) * np2 - (if (dx == 0 && dy == 0) BigInt(np) else BigInt(0))
          }
        }
      }
      p
    }
    val k1 = 1024.0 * ringPairs(1).toDouble / (n.toDouble * n)
    val k2 = 1024.0 * ringPairs(2).toDouble / (n.toDouble * n)
    val row = queries.Extras229.statRipleyK(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - k1) < 1e-4, s"K1 ${row.getDouble(1)} vs $k1")
    assert(math.abs(row.getDouble(2) - k2) < 1e-4, s"K2 ${row.getDouble(2)} vs $k2")
    assert(row.getDouble(2) > row.getDouble(1), "K monotone in r")
    assert(math.abs(row.getDouble(3) - k1 / 9) < 1e-5 && math.abs(row.getDouble(4) - k2 / 25) < 1e-5)
  }
}
