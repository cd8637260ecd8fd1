package graft

import org.apache.spark.sql.functions._

/** Wave-146 properties at sf0.001: DL pooling identities, Egger vs a
  * direct WLS replay, Stouffer algebra, and the PLAN assertion that
  * InjectRuntimeFilter actually pushes a bloom filter into the fact
  * scan.
  */
class Extras246Spec extends SparkSpec {

  private lazy val eff: Array[(Long, Double, Double)] = {
    val xs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey AS l_orderkey", "o_orderdate"),
        Seq("l_orderkey"))
      .selectExpr("year(o_orderdate) AS yr", "l_discount > 0.05 AS e", "l_returnflag = 'R' AS y")
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getBoolean(2)))
      .groupBy(_._1)
    xs.toArray.sortBy(_._1).map { case (_, g) =>
      val a = g.count(x => x._2 && x._3) + 0.5
      val b = g.count(x => x._2 && !x._3) + 0.5
      val c = g.count(x => !x._2 && x._3) + 0.5
      val dd = g.count(x => !x._2 && !x._3) + 0.5
      val lq = math.floor(math.log(a * dd / (b * c)) * 1e12 + 0.5) / 1e12
      val vq = math.floor((1 / a + 1 / b + 1 / c + 1 / dd) * 1e12 + 0.5) / 1e12
      (g.size.toLong, lq, vq)
    }
  }

  test("stat_dersimonian_laird: tau2 >= 0, I2 in [0,1), RE CI wider than FE") {
    val row = queries.Extras246.statDersimonianLaird(spark, sf).collect().head
    assert(row.getLong(0) == eff.length.toLong)
    assert(row.getDouble(1) >= 0, "tau2 nonneg")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) < 1, "I2 in [0,1)")
    assert(row.getDouble(4) < row.getDouble(3) && row.getDouble(3) < row.getDouble(5),
      "CI brackets the pooled estimate")
    // pooled RE is inside the range of stratum effects
    val lors = eff.map(_._2)
    assert(row.getDouble(3) >= lors.min - 1e-6 && row.getDouble(3) <= lors.max + 1e-6)
  }

  test("stat_egger_test: matches a direct OLS replay on the funnel points") {
    val pts = eff.map { case (_, l, v) =>
      (math.floor(1 / math.sqrt(v) * 1e9 + 0.5) / 1e9,
        math.floor(l / math.sqrt(v) * 1e9 + 0.5) / 1e9)
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val a = (sy - b * sx) / m
    val sse = syy - sy * sy / m - b * (sxy - sx * sy / m)
    val t = a / math.sqrt(sse / (m - 2) * sxx / (m * sxx - sx * sx))
    val row = queries.Extras246.statEggerTest(spark, sf).collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(math.abs(row.getDouble(1) - a) < 1e-2, s"intercept ${row.getDouble(1)} vs $a")
    assert(math.abs(row.getDouble(2) - t) < 1e-2, s"t ${row.getDouble(2)} vs $t")
    assert(row.getBoolean(3) == (math.abs(t) > 2.571))
  }

  test("stat_stouffer_combined: matches the z algebra; p consistent with z") {
    val zs = eff.map { case (_, l, v) => math.floor(l / math.sqrt(v) * 1e9 + 0.5) / 1e9 }
    val z = zs.sum / math.sqrt(zs.length.toDouble)
    val row = queries.Extras246.statStoufferCombined(spark, sf).collect().head
    assert(row.getLong(0) == zs.length.toLong)
    assert(math.abs(row.getDouble(1) - z) < 1e-3, s"Z ${row.getDouble(1)} vs $z")
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1, "p in [0,1]")
    // bigger |z| -> smaller p
    if (math.abs(row.getDouble(1)) > 1.96) assert(row.getDouble(3) < 0.05)
  }

  test("exec_runtime_filter: bloom filter IS injected into the fact side") {
    val s = spark.newSession()
    val df = queries.Extras246.execRuntimeFilter(s, sf)
    val row = df.collect().head
    // correctness: matches the plain join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"))
      .count()
    assert(row.getLong(0) == plain, "filtered-join row count")
    // plan: re-run the body with the confs set and check the optimized plan
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    val probe = Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"))
      .groupBy().count()
    val optimized = probe.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") || optimized.contains("BloomFilter"),
      s"runtime bloom filter not injected:\n${optimized.take(2000)}")
  }
}
