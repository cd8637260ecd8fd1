package graft

import org.apache.spark.sql.functions._

/** Wave-31 properties the DuckDB oracle can't express. */
class Extras131Spec extends SparkSpec {

  private def dailyCents() = Tables.lineitem(spark, sf)
    .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
    .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
      .cast("long").as("c"))
    .orderBy("day").collect().map(_.getLong(1))

  test("stat_durbin_watson: dw in [0,4], rho consistent, matches a float brute force") {
    val r = queries.Extras131.statDurbinWatson(spark, sf).head()
    val dw = r.getDouble(1)
    assert(dw >= 0.0 && dw <= 4.0)
    assert(math.abs(r.getDouble(2) - math.rint((1.0 - dw / 2) * 1e6) / 1e6) < 1e-9)
    // driver-side brute force with plain doubles (tolerance: quantization grain)
    val c = dailyCents().map(_.toDouble)
    val n = c.length
    assert(r.getLong(0) == n.toLong)
    val t = (1 to n).map(_.toDouble).toArray
    val (st, sc, stt, stc) = (t.sum, c.sum, t.map(x => x * x).sum,
      t.zip(c).map { case (a, b) => a * b }.sum)
    val b = (n * stc - st * sc) / (n * stt - st * st)
    val a = (sc - b * st) / n
    val e = t.zip(c).map { case (x, y) => y - a - b * x }
    val num = e.zip(e.drop(1)).map { case (p, q) => (q - p) * (q - p) }.sum
    val den = e.map(x => x * x).sum
    assert(math.abs(dw - num / den) < 1e-3, s"engine $dw vs brute ${num / den}")
  }

  test("stat_hodges_lehmann: per-month HL bounded by month min/max, brute-forced for one month") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"),
        date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .collect().groupBy(_.get(0)).view.mapValues(_.map(_.getLong(2)).sorted).toMap
    val rows = queries.Extras131.statHodgesLehmann(spark, sf).collect()
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val cs = daily(r.get(0))
      val hlCents = r.getDouble(2) * 100
      assert(hlCents >= cs.min - 0.01 && hlCents <= cs.max + 0.01,
        s"${r.get(0)}: HL outside [min,max]")
      assert(r.getLong(1) == cs.length.toLong * (cs.length + 1) / 2, "pair count")
    }
    // brute force the first month: lower median of all doubled Walsh sums
    val m0 = rows.head
    val cs = daily(m0.get(0))
    val walsh = (for (i <- cs.indices; j <- i until cs.length) yield cs(i) + cs(j)).sorted
    val med = walsh((walsh.length + 1) / 2 - 1)
    assert(math.abs(m0.getDouble(2) - math.rint(med / 200.0 * 1e6) / 1e6) < 1e-6,
      s"${m0.get(0)}: engine ${m0.getDouble(2)} vs brute ${med / 200.0}")
  }

  test("text_heaps_law: cumulative curves monotone, decile 10 hits corpus totals, beta in (0,1)") {
    val rows = queries.Extras131.textHeapsLaw(spark, sf).collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(p, q) =>
      assert(q.getLong(1) >= p.getLong(1) && q.getLong(2) >= p.getLong(2) &&
        q.getLong(3) >= p.getLong(3), "cumulative curves must be nondecreasing")
    }
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val last = rows.last
    assert(last.getLong(1) == docs.length.toLong)
    assert(last.getLong(2) == docs.map(_.split(" ").length.toLong).sum)
    val trigrams = docs.flatMap(_.split(" ").sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")))
    assert(last.getLong(3) == trigrams.distinct.length.toLong)
    val beta = last.getDouble(4)
    assert(beta > 0.0 && beta < 1.0, s"Heaps exponent $beta outside (0,1)")
  }

  test("stat_seasonal_mann_kendall: 12 seasons, |S| bounded by pair count, one season brute-forced") {
    val r = queries.Extras131.statSeasonalMannKendall(spark, sf).head()
    assert(r.getLong(0) == 12L)
    val daily = Tables.lineitem(spark, sf)
      .groupBy(month(col("l_shipdate")).cast("long").as("g"),
        date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("g", "day").collect()
    assert(r.getLong(1) == daily.length.toLong)
    val byG = daily.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2))).toMap
    val maxPairs = byG.values.map(v => v.length.toLong * (v.length - 1) / 2).sum
    assert(math.abs(r.getLong(2)) <= maxPairs)
    // brute-force S for season 1 and confirm it contributes to the total
    val sPer = byG.view.mapValues { cs =>
      (for (i <- cs.indices; j <- i + 1 until cs.length)
        yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
    }.toMap
    assert(r.getLong(2) == sPer.values.sum, s"S ${r.getLong(2)} vs brute ${sPer.values.sum}")
    assert(!r.isNullAt(3) && !r.getDouble(3).isNaN)
  }
}
