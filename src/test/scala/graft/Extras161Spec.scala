package graft

import org.apache.spark.sql.functions._

/** Wave-61 properties: Breslow–Day, DFA, reciprocity, top-N plan
  * replays against brute force on sf0.001.
  */
class Extras161Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_breslow_day: quadratic-root replay; expected cells stay in range") {
    val rows = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), col("l_discount"), col("l_returnflag"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1) >= 0.05, r.getString(2) == "R"))
    val strata = rows.groupBy(_._1).values.map { g =>
      val a = g.count(t => t._2 && t._3).toLong
      val b = g.count(t => t._2 && !t._3).toLong
      val c = g.count(t => !t._2 && t._3).toLong
      val dd = g.count(t => !t._2 && !t._3).toLong
      (a, b, c, dd)
    }.toSeq
    def q6(num: BigInt, den: BigInt): BigInt = num * 1000000 / den
    val sad6 = strata.map { case (a, b, c, dd) => q6(BigInt(a) * dd, a + b + c + dd) }.sum
    val sbc6 = strata.map { case (a, b, c, dd) => q6(BigInt(b) * c, a + b + c + dd) }.sum
    val psi = sad6.toDouble / sbc6.toDouble
    var bd6 = 0L
    strata.foreach { case (a, b, c, dd) =>
      val n1 = (a + b).toDouble; val n0 = (c + dd).toDouble; val m1 = (a + c).toDouble
      val qa = 1 - psi
      val qb = (n0 - m1) + psi * (n1 + m1)
      val qc = -psi * n1 * m1
      val disc = math.sqrt(qb * qb - 4 * qa * qc)
      val r1 = (-qb + disc) / (2 * qa); val r2 = (-qb - disc) / (2 * qa)
      val lo = math.max(0.0, m1 - n0); val hi = math.min(m1, n1)
      val at = if (r1 >= lo && r1 <= hi) r1 else r2
      assert(at >= lo - 1e-6 && at <= hi + 1e-6) // the selected root is feasible
      val va = 1 / (1 / at + 1 / (n1 - at) + 1 / (m1 - at) + 1 / (n0 - m1 + at))
      bd6 += math.floor((a - at) * (a - at) / va * 1e6 + 0.5).toLong
    }
    val row = queries.Extras161.statBreslowDay(spark, sf).collect().head
    assert(row.getLong(0) == strata.length.toLong)
    assert(math.abs(row.getDouble(1) - psi) < 1e-5)
    assert(math.abs(row.getDouble(2) - bd6.toDouble / 1e6) < 1e-3)
    assert(row.getBoolean(3) == (bd6.toDouble / 1e6 > 12.592))
  }

  test("time_dfa_alpha: brute-force box-detrending replay; alpha in a sane band") {
    val x = Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1.getTime).map(_._2)
    val n = x.length
    val sc = x.map(BigInt(_)).sum
    val cleared = x.map(c => BigInt(n) * c - sc)
    val prof = cleared.scanLeft(BigInt(0))(_ + _).tail
    val sizes = Seq(8, 16, 32, 64)
    val fs = sizes.map { sz =>
      val boxes = prof.zipWithIndex.groupBy(_._2 / sz).values
        .filter(_.length == sz)
      val sses = boxes.map { bx =>
        val m = bx.length
        val us = bx.map(t => (t._2 % sz + 1).toLong)
        val ps = bx.map(_._1)
        val su = us.sum.toDouble; val suu = us.map(u => u * u).sum.toDouble
        val sp = ps.sum.toDouble
        val sup = bx.map(t => BigInt(t._2 % sz + 1) * t._1).sum.toDouble
        val spp = ps.map(p => p * p).sum.toDouble
        val sse = ((m * spp - sp * sp) -
          math.pow(m * sup - su * sp, 2) / (m * suu - su * su)) / m
        math.floor(sse / 1e18 + 0.5).toLong
      }
      sz -> math.sqrt(sses.sum.toDouble / sses.size / sz)
    }
    val u = sizes.map(sz => math.log(sz.toDouble))
    val ub = u.sum / 4
    val alpha = sizes.zip(u).map { case (sz, ui) =>
      (ui - ub) * math.log(fs.toMap.apply(sz))
    }.sum / u.map(ui => (ui - ub) * (ui - ub)).sum
    val row = queries.Extras161.timeDfaAlpha(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - alpha) < 1e-3)
    assert(row.getDouble(0) > 0.1 && row.getDouble(0) < 1.6)
  }

  test("graph_reciprocity: brute-force reverse-arc census") {
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val n = users.length.toLong
    val arcs = users.flatMap { u =>
      Seq((u + 1) % n, (u + 2) % n, (u * 7 + 3) % n).filter(_ != u).map(u -> _)
    }.distinct.toSet
    val recip = arcs.count(a => arcs.contains(a.swap)).toLong
    val row = queries.Extras161.graphReciprocity(spark, sf).collect().head
    assert(row.getLong(0) == arcs.size.toLong)
    assert(row.getLong(1) == recip)
    assert(math.abs(row.getDouble(2) - recip.toDouble / arcs.size) < 1e-6)
  }

  test("sort_topn_pushdown: TakeOrderedAndProject plan (no global sort) + exact rows") {
    val df = queries.Extras161.sortTopnPushdown(spark, sf)
    val root = df.queryExecution.executedPlan
    val inner = root.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
    }
    val all = (root +: inner).flatMap(_.collect { case p => p })
    assert(all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.TakeOrderedAndProjectExec]))
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]))
    val expect = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (cents(r.getDouble(2)), r.getLong(0), r.getAs[Number](1).longValue))
      .sortBy(t => (-t._1, t._2, t._3)).take(10)
    val got = df.collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expect.toSeq)
  }
}
