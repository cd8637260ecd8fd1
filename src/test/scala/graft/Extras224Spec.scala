package graft

/** Wave-124 properties: NW/CO vs sequential regression replays (exact
  * quantized-residual arithmetic), Games–Howell vs exact group moments,
  * Duane vs a log-log OLS replay — at sf0.001.
  */
class Extras224Spec extends SparkSpec {

  private def dailyCents(): Array[Long] =
    Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(x => BigInt(x._2)).sum.toLong).toArray

  private def olsFit(vs: Array[Long]): (Double, Double, Array[Long], Array[Long]) = {
    val n = vs.length
    val ts = (1 to n).map(_.toLong).toArray
    val st = ts.sum; val stt = ts.map(t => t * t).sum
    val sv = vs.map(BigInt(_)).sum; val stv = ts.zip(vs).map { case (t, v) => BigInt(t) * v }.sum
    val b = (n.toDouble * stv.toDouble - st.toDouble * sv.toDouble) /
      (n.toDouble * stt - st.toDouble * st)
    val a = (sv.toDouble - b * st) / n
    val eq = ts.zip(vs).map { case (t, v) => math.floor(v - a - b * t + 0.5).toLong }
    val x = ts.map(t => n * t - st)
    (b, a, eq, x)
  }

  test("stat_newey_west: matches the sequential HAC replay; HAC inflates the naive SE") {
    val vs = dailyCents()
    val n = vs.length
    val (b, _, eq, x) = olsFit(vs)
    val sxx = x.map(xi => BigInt(xi) * xi).sum
    val s0 = x.zip(eq).map { case (xi, ei) => BigInt(xi) * xi * ei * ei }.sum
    val gl = (1 to 5).map { l =>
      (l until n).map(i => BigInt(x(i)) * x(i - l) * eq(i) * eq(i - l)).sum
    }
    val see = eq.map(e => BigInt(e) * e).sum
    val varHac = n.toDouble * n *
      (s0.toDouble + 2 * (5 * gl(0).toDouble + 4 * gl(1).toDouble + 3 * gl(2).toDouble
        + 2 * gl(3).toDouble + gl(4).toDouble) / 6) / (sxx.toDouble * sxx.toDouble)
    val varOls = see.toDouble / (n - 2) * n.toDouble * n / sxx.toDouble
    val row = queries.Extras224.statNeweyWest(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - b / 100) < 1e-4, "slope")
    assert(math.abs(row.getDouble(2) - math.sqrt(varOls) / 100) < 1e-4, "ols se")
    assert(math.abs(row.getDouble(3) - math.sqrt(varHac) / 100) < 1e-4, "hac se")
    assert(math.abs(row.getDouble(5) - math.sqrt(varHac / varOls)) < 1e-3)
    assert(row.getDouble(3) > 0 && row.getDouble(2) > 0)
  }

  test("stat_cochrane_orcutt: matches the sequential CO replay; rho in (-1,1)") {
    val vs = dailyCents()
    val n = vs.length
    val (bOls, _, eq, _) = olsFit(vs)
    val num = (1 until n).map(i => BigInt(eq(i)) * eq(i - 1)).sum
    val den = (1 until n).map(i => BigInt(eq(i - 1)) * eq(i - 1)).sum
    val rho = num.toDouble / den.toDouble
    val sdd = (1 until n).map(i => BigInt(eq(i) - eq(i - 1)) * (eq(i) - eq(i - 1))).sum
    val see = eq.map(e => BigInt(e) * e).sum
    val dw = sdd.toDouble / see.toDouble
    val xs = (2 to n).map(t => math.floor((t - rho * (t - 1)) * 1e6 + 0.5).toLong)
    val ys = (2 to n).map(t => math.floor(vs(t - 1) - rho * vs(t - 2) + 0.5).toLong)
    val m = xs.length
    val sx = xs.map(BigInt(_)).sum; val sxx2 = xs.map(v => BigInt(v) * v).sum
    val sy = ys.map(BigInt(_)).sum; val sxy = xs.zip(ys).map { case (a2, b2) => BigInt(a2) * b2 }.sum
    val slopeCo = (m.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (m.toDouble * sxx2.toDouble - sx.toDouble * sx.toDouble) * 1e6
    val row = queries.Extras224.statCochraneOrcutt(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rho) < 1e-5, s"rho ${row.getDouble(1)} vs $rho")
    assert(row.getDouble(1) > -1 && row.getDouble(1) < 1)
    assert(math.abs(row.getDouble(2) - dw) < 1e-5, "DW")
    assert(math.abs(row.getDouble(3) - bOls / 100) < 1e-4)
    assert(math.abs(row.getDouble(4) - slopeCo / 100) < 1e-3, "CO slope")
    assert(math.abs(dw - 2 * (1 - rho)) < 0.3, "DW ~ 2(1-rho) sanity")
  }

  test("stat_games_howell: matches exact group moments; 10 ordered pairs") {
    val vs = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    def mom(g: String) = {
      val x = vs(g); val n = x.length
      val s1 = x.sum; val s2 = x.map(v => v * v).sum
      (n, s1.toDouble / n,
        (n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble) / (n.toDouble * (n - 1)))
    }
    val rows = queries.Extras224.statGamesHowell(spark, sf).collect()
    assert(rows.length == 10, "C(5,2) pairs")
    rows.foreach { r =>
      val (n1, m1, v1) = mom(r.getString(0)); val (n2, m2, v2) = mom(r.getString(1))
      assert(r.getString(0) < r.getString(1), "ordered pair")
      val w1 = v1 / n1; val w2 = v2 / n2
      val q = math.abs(m1 - m2) / math.sqrt((w1 + w2) / 2)
      val df = (w1 + w2) * (w1 + w2) / (w1 * w1 / (n1 - 1) + w2 * w2 / (n2 - 1))
      assert(math.abs(r.getDouble(2) - (m1 - m2) / 100) < 0.02)
      assert(math.abs(r.getDouble(3) - q) < 1e-3, s"q for ${r.getString(0)}/${r.getString(1)}")
      assert(math.abs(r.getDouble(4) - df) < 0.2 + df * 1e-4)
      assert(r.getLong(5) == (if (q > 3.858) 1L else 0L))
    }
  }

  test("analytics_duane_growth: matches the log-log OLS replay") {
    val hours = Tables.events(spark, sf).filter("event_type = 'purchase'")
      .selectExpr("CAST(date_trunc('hour', ts) AS LONG) AS h")
      .collect().map(_.getLong(0)).groupBy(identity).map { case (h, xs) => (h, xs.length.toLong) }
      .toSeq.sortBy(_._1)
    val h0 = hours.head._1
    var cum = 0L
    val pts = hours.map { case (h, c) =>
      cum += c
      val tt = (h - h0) / 3600L + 1 // CAST(ts AS LONG) = epoch seconds
      (math.floor(math.log(tt.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(cum.toDouble) * 1e6 + 0.5).toLong)
    }
    val k = pts.length
    val sx = pts.map(p => BigInt(p._1)).sum; val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sy = pts.map(p => BigInt(p._2)).sum; val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val beta = (k.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (k.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val lam = math.exp((sy.toDouble - beta * sx.toDouble) / k / 1e6)
    val row = queries.Extras224.analyticsDuaneGrowth(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(math.abs(row.getDouble(1) - beta) < 1e-4, s"beta ${row.getDouble(1)} vs $beta")
    assert(math.abs(row.getDouble(2) - lam) < 1e-3 * math.max(1, lam), "lambda")
    assert(row.getString(3) == (if (beta < 1) "improving" else "degrading"))
    assert(row.getDouble(1) > 0, "cumulative counts grow")
  }
}
