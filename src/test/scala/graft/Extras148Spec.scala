package graft

import org.apache.spark.sql.functions._

/** Wave-48 properties: PH/MATTR/candlestick/halving replays. */
class Extras148Spec extends SparkSpec {

  test("stat_page_hinkley: BigInt replay of the drift statistic and alarm day") {
    val rows = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val n = BigInt(rows.length)
    val sc = rows.map(r => BigInt(r._2)).sum
    var u = BigInt(0); var rm = BigInt(Long.MinValue)
    var best = BigInt(Long.MinValue); var bestDay = rows.head._1
    rows.foreach { case (day, c) =>
      u += BigInt(c) * n - sc
      if (u > rm) rm = u
      val ph = rm - u
      if (ph > best) { best = ph; bestDay = day }
    }
    val row = queries.Extras148.statPageHinkley(spark, sf).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getTimestamp(1) == bestDay)
    assert(math.abs(row.getDouble(2) - best.toDouble / n.toDouble / 100) < 1e-4)
  }

  test("text_mattr_diversity: per-doc integer replay; MATTR within (0, 1]") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val perLang = docs.map { case (lang, toks) =>
      val n = toks.length.toLong
      val m =
        if (n <= 50) toks.distinct.length.toLong * 1000000 / n
        else {
          val sumw = (0 until (n - 49).toInt).map { i =>
            toks.slice(i, i + 50).distinct.length.toLong * 1000000 / 50
          }.sum
          sumw / (n - 49)
        }
      (lang, m)
    }.groupBy(_._1).view.mapValues(ms => (ms.size.toLong, ms.map(_._2).sum)).toMap
    val got = queries.Extras148.textMattrDiversity(spark, sf).collect()
    got.foreach { r =>
      val (nd, sm) = perLang(r.getString(0))
      assert(r.getLong(1) == nd)
      assert(math.abs(r.getDouble(2) - sm.toDouble / nd / 1e6) < 1e-5)
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("win_candlestick_patterns: censuses bounded and consistent") {
    val row = queries.Extras148.winCandlestickPatterns(spark, sf).collect().head
    val (n, doji, bull, bear) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n > 0)
    assert(doji >= 0 && doji <= n)
    assert(bull + bear <= n, "engulfing categories are mutually exclusive per bar")
    // engulfing requires opposite-direction bodies: recompute directly
    val bars = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
          r.getAs[Number](3).longValue)))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (_, xs) =>
        val ps = xs.map(_._2)
        val o = ps.minBy(t => (t._1, t._2))._3
        val c = ps.maxBy(t => (t._1, t._2))._3
        (o, c, ps.map(_._3).max, ps.map(_._3).min)
      }
    val brute = bars.sliding(2).collect { case Seq((po, pc, _, _), (o, c, h, l)) =>
      (if (20 * math.abs(o - c) <= h - l) 1 else 0,
        if (pc < po && c > o && o <= pc && c >= po) 1 else 0,
        if (pc > po && c < o && o >= pc && c <= po) 1 else 0)
    }.toSeq
    assert(doji == brute.map(_._1).sum.toLong)
    assert(bull == brute.map(_._2).sum.toLong)
    assert(bear == brute.map(_._3).sum.toLong)
  }

  test("sample_successive_halving: schedule counts 10/5/3/2; ranks respect mean order") {
    val rows = queries.Extras148.sampleSuccessiveHalving(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 20)
    assert(rows.count(_._3 == 1L) == 10)
    assert(rows.count(_._3 == 2L) == 5)
    assert(rows.count(_._3 == 3L) == 3)
    assert(rows.count(_._3 == 0L) == 2)
    // any survivor of round k has mean >= every source eliminated in round k
    val byRound = rows.groupBy(_._3)
    assert(byRound(0L).map(_._2).min >= byRound(3L).map(_._2).max - 1e-9)
    assert(byRound(3L).map(_._2).min >= byRound(2L).map(_._2).max - 1e-9)
    assert(byRound(2L).map(_._2).min >= byRound(1L).map(_._2).max - 1e-9)
  }
}
