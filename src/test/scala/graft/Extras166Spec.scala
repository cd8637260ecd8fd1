package graft

import org.apache.spark.sql.functions._

/** Wave-66 properties: Bowker, Lin CCC, OU half-life, silence runs
  * replays against brute force on sf0.001.
  */
class Extras166Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_bowker_symmetry: first/last transition replay") {
    val fl = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getString(2)))
      .groupBy(_._1).values.map { g =>
        // linenumbers repeat in this schema: the struct orders by (ln, flag)
        (g.minBy(t => (t._2, t._3))._3, g.maxBy(t => (t._2, t._3))._3)
      }.toSeq
    val cellMap = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    fl.foreach(t => cellMap(t) += 1)
    val flags = fl.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    var chi6 = 0L; var np = 0L
    for (i <- flags.indices; j <- i + 1 until flags.length) {
      val nij = cellMap((flags(i), flags(j)))
      val nji = cellMap((flags(j), flags(i)))
      if (nij > 0) { // the query emits pairs from existing (i<j) cells
        np += 1
        chi6 += math.floor((nij - nji).toDouble * (nij - nji) / (nij + nji) * 1e6 + 0.5).toLong
      }
    }
    val row = queries.Extras166.statBowkerSymmetry(spark, sf).collect().head
    assert(row.getLong(0) == np)
    assert(math.abs(row.getDouble(1) - chi6.toDouble / 1e6) < 1e-3)
    assert(row.getBoolean(2) == (chi6.toDouble / 1e6 > 7.815))
  }

  test("stat_lin_ccc: cleared-moment replay; CCC <= |r|") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val v = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .flatMap(r => li.get(r.getLong(0)).map(y => (cents(r.getDouble(1)), y)))
    val n = v.length
    val sx = v.map(t => BigInt(t._1)).sum; val sy = v.map(t => BigInt(t._2)).sum
    val cxy = (BigInt(n) * v.map(t => BigInt(t._1) * t._2).sum - sx * sy).toDouble
    val cxx = (BigInt(n) * v.map(t => BigInt(t._1) * t._1).sum - sx * sx).toDouble
    val cyy = (BigInt(n) * v.map(t => BigInt(t._2) * t._2).sum - sy * sy).toDouble
    val d0 = (sx - sy).toDouble
    val ccc = 2 * cxy / (cxx + cyy + d0 * d0)
    val r = cxy / math.sqrt(cxx * cyy)
    val row = queries.Extras166.statLinCcc(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - ccc) < 1e-5)
    assert(math.abs(row.getDouble(2) - r) < 1e-5)
    assert(math.abs(row.getDouble(1)) <= math.abs(row.getDouble(2)) + 1e-9)
  }

  test("time_mean_reversion_halflife: cleared ACF replay") {
    val x = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val n = x.length
    val sc = x.map(BigInt(_)).sum
    val cl = x.map(c => BigInt(n) * c - sc)
    val c0 = cl.map(v => v * v).sum
    val c1 = cl.zip(cl.tail).map { case (a, b) => a * b }.sum
    val rho1 = c1.toDouble / c0.toDouble
    val row = queries.Extras166.timeMeanReversionHalflife(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rho1) < 1e-5)
    if (rho1 > 0 && rho1 < 1) {
      assert(math.abs(row.getDouble(2) - (-math.log(2) / math.log(rho1))) < 1e-2)
      assert(row.getBoolean(3))
    }
  }

  test("multimodal_silence_runs: codec-roundtrip run census equals regex replay") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val per = docs.map { case (lang, text) =>
      val runs = "[a-m]+".r.findAllIn(text).map(_.length).toSeq
      (lang, runs.count(_ >= 4).toLong, if (runs.isEmpty) 0L else runs.max.toLong)
    }
    val got = queries.Extras166.multimodalSilenceRuns(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val g = per.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._2).sum)
      assert(r.getLong(3) == g.map(_._3).max)
      assert(r.getLong(4) == g.count(_._2 > 0).toLong)
    }
  }
}
