package graft

import org.apache.spark.sql.functions._

/** Wave-30 properties the DuckDB oracle can't express. */
class Extras130Spec extends SparkSpec {

  test("text_yule_k: spectrum identities hold and K matches a brute-force recompute") {
    val rows = queries.Extras130.textYuleK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, v1, v2) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTyp <= nTok, "more types than tokens")
      assert(v1 + v2 <= nTyp, "spectrum head exceeds type count")
      assert(r.getDouble(5) >= 0.0, "Yule K is a sum of squares minus N over N^2, >= 0")
    }
    // brute-force one lang driver-side
    val lang0 = rows.head.getString(0)
    val counts = Tables.documents(spark, sf).filter(col("lang") === lang0)
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map(_._2.length.toLong)
    val n = counts.sum
    val k = 1e4 * (counts.map(c => c * c).sum - n) / (n.toDouble * n)
    assert(math.abs(rows.head.getDouble(5) - math.rint(k * 1e6) / 1e6) < 1e-6,
      s"$lang0: engine ${rows.head.getDouble(5)} vs brute $k")
  }

  test("sample_neyman_allocation: seats sum exactly to the 1000 budget, within ±1 of exact share") {
    val rows = queries.Extras130.sampleNeymanAllocation(spark, sf).collect()
    assert(rows.length == 5, "five language strata")
    assert(rows.map(_.getLong(3)).sum == 1000L, "largest-remainder seats must sum to budget")
    rows.foreach { r =>
      val exact = r.getDouble(2)
      val alloc = r.getLong(3)
      assert(alloc >= math.floor(exact).toLong && alloc <= math.ceil(exact).toLong,
        s"${r.getString(0)}: alloc $alloc outside [floor,ceil] of exact $exact")
    }
  }

  test("time_seasonal_naive_mase: eval window is days-7, errors positive, MASE consistent") {
    val r = queries.Extras130.timeSeasonalNaiveMase(spark, sf).head()
    val days = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate"))).distinct().count()
    assert(r.getLong(0) == days - 7, "one eval row per day with a lag-7 ancestor")
    val (maeS, maeN, mase) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(maeS > 0 && maeN > 0)
    assert(math.abs(mase - maeS / maeN) < 1e-4, "MASE is the ratio of the two MAEs")
    assert(r.getBoolean(4) == (mase < 1.0))
  }
}
