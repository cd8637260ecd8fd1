package graft

import org.apache.spark.sql.functions._

/** Wave-47 properties: Haar/rank/underwater/TwoNN replays. */
class Extras147Spec extends SparkSpec {

  private def dailyCents(): Array[Long] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  test("time_haar_energy: BigInt pyramid replay; shares normalize") {
    val c0 = dailyCents()
    val c = c0.take(c0.length / 8 * 8).map(BigInt(_)).toSeq
    def level(xs: Seq[BigInt]): (Seq[BigInt], BigInt) = {
      val pairs = xs.grouped(2).toSeq
      (pairs.map(p => p(0) + p(1)), pairs.map(p => { val d0 = p(1) - p(0); d0 * d0 }).sum)
    }
    val (s1, e1) = level(c)
    val (s2, e2) = level(s1)
    val (_, e3) = level(s2)
    val et = (e1 + e2 + e3).toDouble
    val row = queries.Extras147.timeHaarEnergy(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - e1.toDouble / et) < 1e-5)
    assert(math.abs(row.getDouble(1) - e2.toDouble / et) < 1e-5)
    assert(math.abs(row.getDouble(2) - e3.toDouble / et) < 1e-5)
    assert(math.abs(row.getDouble(0) + row.getDouble(1) + row.getDouble(2) - 1.0) < 1e-5)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= math.log(3) + 1e-9)
  }

  test("stat_bartels_rank: permutation identity makes the denominator closed-form") {
    val c = dailyCents()
    val n = c.length
    val rankByDay = c.zipWithIndex.sortBy { case (v, i) => (v, i) }
      .zipWithIndex.map { case ((_, dayIdx), r) => dayIdx -> (r + 1).toLong }
      .toMap
    val ranks = c.indices.map(rankByDay)
    val nm = ranks.sliding(2).map { p => val d0 = BigInt(p(0) - p(1)); d0 * d0 }.sum
    val rvn = nm.toDouble / (n.toDouble * (n.toDouble * n - 1) / 12)
    val row = queries.Extras147.statBartelsRank(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rvn) < 1e-5)
    assert(math.abs(row.getDouble(2) - (rvn - 2) / math.sqrt(4.0 / n)) < 1e-4)
    // sanity: the permutation variance identity itself
    val mean = (n + 1) / 2.0
    val ssd = ranks.map(r => (r - mean) * (r - mean)).sum
    assert(math.abs(ssd - n.toDouble * (n.toDouble * n - 1) / 12) < 1e-6)
  }

  test("win_underwater_duration: brute replay of runs and depth") {
    val c = dailyCents()
    var rm = Long.MinValue
    var cur = 0L; var longest = 0L; var nU = 0L; var depth = 0L
    c.foreach { v =>
      if (v > rm) rm = v
      if (v < rm) {
        cur += 1; nU += 1
        if (cur > longest) longest = cur
        if (rm - v > depth) depth = rm - v
      } else cur = 0
    }
    val row = queries.Extras147.winUnderwaterDuration(spark, sf).collect().head
    assert(row.getLong(0) == c.length.toLong)
    assert(row.getLong(1) == nU)
    assert(row.getLong(2) == longest)
    assert(math.abs(row.getDouble(3) - depth.toDouble / 100) < 1e-6)
  }

  test("embed_intrinsic_dim: brute TwoNN replay; estimate positive and sane") {
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 500)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        math.max(math.min(math.floor(x.toDouble * 127 + 0.5), 127), -127).toLong).toArray))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val lfx = vecs.flatMap { case (id, qa) =>
      val ds = vecs.filter(_._1 != id)
        .map { case (jb, qb) => (d2(qa, qb), jb) }.sorted
      val (r1, b1) = ds.head
      val r2 = ds.filter(_._2 != b1).head._1
      if (r1 > 0)
        Some(math.floor((math.log(r2.toDouble) - math.log(r1.toDouble)) * 1e9 + 0.5).toLong)
      else None
    }
    val expect = 2.0 * lfx.length / (lfx.sum.toDouble / 1e9)
    val row = queries.Extras147.embedIntrinsicDim(spark, sf).collect().head
    assert(row.getLong(0) == lfx.length.toLong)
    assert(math.abs(row.getDouble(1) - expect) < 1e-4, s"${row.getDouble(1)} vs $expect")
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 200)
  }
}
