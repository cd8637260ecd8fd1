package graft

import org.apache.spark.sql.functions._

/** Wave-68 properties: Brier-Murphy, Fisher-z meta, DISTRIBUTE BY
  * plan, null-isolation replays against brute force on sf0.001.
  */
class Extras168Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_brier_decomposition: Murphy identity holds within quantization") {
    val v = Tables.lineitem(spark, sf).select("l_discount", "l_returnflag").collect()
      .map(r => (math.round(r.getDouble(0) * 10), if (r.getString(1) == "R") 1L else 0L))
    val n = v.length
    val brier = v.map { case (k, y) => math.pow(k / 10.0 - y, 2) }.sum / n
    val obar = v.map(_._2).sum.toDouble / n
    val unc = obar * (1 - obar)
    val bins = v.groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum))
    val rel = bins.map { case (k, (nk, yk)) =>
      nk * math.pow(k / 10.0 - yk.toDouble / nk, 2) }.sum / n
    val res = bins.map { case (_, (nk, yk)) =>
      nk * math.pow(yk.toDouble / nk - obar, 2) }.sum / n
    val row = queries.Extras168.statBrierDecomposition(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - brier) < 1e-5)
    assert(math.abs(row.getDouble(2) - rel) < 1e-4)
    assert(math.abs(row.getDouble(3) - res) < 1e-4)
    assert(math.abs(row.getDouble(4) - unc) < 1e-5)
    // Murphy identity
    assert(math.abs(row.getDouble(1) -
      (row.getDouble(2) - row.getDouble(3) + row.getDouble(4))) < 1e-3)
  }

  test("stat_fisher_z_meta: per-year correlation pool replay") {
    val v = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("yr"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1).toLong, cents(r.getDouble(2))))
    val zs = v.groupBy(_._1).values.map { g =>
      val n = g.length
      val sx = g.map(t => BigInt(t._2)).sum; val sy = g.map(t => BigInt(t._3)).sum
      val cxy = (BigInt(n) * g.map(t => BigInt(t._2) * t._3).sum - sx * sy).toDouble
      val cxx = (BigInt(n) * g.map(t => BigInt(t._2) * t._2).sum - sx * sx).toDouble
      val cyy = (BigInt(n) * g.map(t => BigInt(t._3) * t._3).sum - sy * sy).toDouble
      val r = cxy / math.sqrt(cxx) / math.sqrt(cyy)
      val zq = math.floor(0.5 * math.log((1 + r) / (1 - r)) * 1e9 + 0.5).toLong
      (n - 3L, zq)
    }.toSeq
    val zbar = zs.map(t => BigInt(t._1) * t._2).sum.toDouble / zs.map(_._1).sum / 1e9
    val pooledR = (math.exp(2 * zbar) - 1) / (math.exp(2 * zbar) + 1)
    val q = zs.map { case (w, zq) =>
      math.floor(w * math.pow(zq / 1e9 - zbar, 2) * 1e6 + 0.5).toLong }.sum / 1e6
    val row = queries.Extras168.statFisherZMeta(spark, sf).collect().head
    assert(row.getLong(0) == zs.length.toLong)
    assert(math.abs(row.getDouble(1) - pooledR) < 1e-5)
    assert(math.abs(row.getDouble(2) - q) < 1e-3)
    assert(row.getBoolean(3) == (q > 12.592))
  }

  test("sql_distribute_sort_by: non-global sort in plan + exact aggregate") {
    val df = queries.Extras168.sqlDistributeSortBy(spark, sf)
    val root = df.queryExecution.executedPlan
    val inner = root.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
    }
    val sorts = (root +: inner).flatMap(_.collect {
      case s0: org.apache.spark.sql.execution.SortExec => s0
    })
    // EliminateSorts drops the useless per-partition SORT BY entirely;
    // the only surviving sort is the final 3-row global ORDER BY
    assert(sorts.forall(_.global),
      "the order-agnostic aggregate must let Catalyst eliminate SORT BY")
    val exchanges = (root +: inner).flatMap(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(exchanges.exists(_.outputPartitioning.toString.contains("l_returnflag")),
      "DISTRIBUTE BY must hash-partition on l_returnflag")
    val expect = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val got = df.collect()
    assert(got.map(_.getString(0)).toSeq == expect.keys.toSeq.sorted)
    got.foreach { r =>
      val (n, t) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == t)
    }
  }

  test("join_null_key_isolation: lossless split census") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val okeys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val (nulls, nonNull) = li.partition(_._1 % 10 == 0)
    val matched = nonNull.filter(t => okeys.contains(t._1))
    val row = queries.Extras168.joinNullKeyIsolation(spark, sf).collect()
    val m = row.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("matched")._1 == matched.length.toLong)
    assert(m("matched")._2 == matched.map(_._2).sum)
    assert(m("null_key")._1 == nulls.length.toLong)
    assert(m("null_key")._2 == nulls.map(_._2).sum)
  }
}
