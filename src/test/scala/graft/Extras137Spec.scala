package graft

import org.apache.spark.sql.functions._

/** Wave-37 properties: exact-arithmetic brute-force replicas of the
  * regression rows (BigInt sums, same final IEEE chain) and census
  * identities for the calibration row.
  */
class Extras137Spec extends SparkSpec {

  private def dailyCents(): Array[Long] =
    Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"))
      .orderBy("day").collect().map(_.getLong(1))

  test("stat_dickey_fuller: engine matches a BigInt-exact brute force; diff series anti-persistent") {
    val c = dailyCents()
    val x = c.dropRight(1).map(BigInt(_))
    val y = c.sliding(2).map(p => BigInt(p(1) - p(0))).toArray
    val n = BigInt(x.length)
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val syy = y.map(v => v * v).sum
    val num = (n * sxy - sx * sy).toDouble
    val dx = (n * sxx - sx * sx).toDouble
    val syyc = (n * syy - sy * sy).toDouble
    val nn = x.length
    val rho = num / dx
    val dfT = rho / math.sqrt((syyc - rho * num) / nn / (nn - 2) * nn / dx)
    val row = queries.Extras137.statDickeyFuller(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong)
    assert(math.abs(row.getDouble(1) - rho) < 1e-9, s"rho ${row.getDouble(1)} vs $rho")
    assert(math.abs(row.getDouble(2) - dfT) < 1e-5, s"df_t ${row.getDouble(2)} vs $dfT")
    // daily revenue is mean-reverting noise around a level: rho must be
    // strongly negative (the differenced regression recovers -1-ish for
    // an uncorrelated level series), df_t deep in rejection territory
    assert(rho < 0 && row.getString(3) == "reject_unit_root")
  }

  test("stat_granger_lag1: brute-force F agrees; RSS_u <= RSS_r (extra regressor never hurts)") {
    val daily = Tables.lineitem(spark, sf)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("c"), count(lit(1)).cast("long").as("v"))
      .orderBy("day").collect().map(r => (r.getLong(1), r.getLong(2)))
    val u = daily.dropRight(1).map(t => BigInt(t._1))
    val vl = daily.dropRight(1).map(t => BigInt(t._2))
    val w = daily.drop(1).map(t => BigInt(t._1))
    val n = BigInt(u.length)
    def dot(a: Array[BigInt], b: Array[BigInt]) = a.zip(b).map(p => p._1 * p._2).sum
    val (su, sv, sw) = (u.sum, vl.sum, w.sum)
    val cuu = (n * dot(u, u) - su * su).toDouble
    val cvv = (n * dot(vl, vl) - sv * sv).toDouble
    val cuv = (n * dot(u, vl) - su * sv).toDouble
    val cuw = (n * dot(u, w) - su * sw).toDouble
    val cvw = (n * dot(vl, w) - sv * sw).toDouble
    val cww = (n * dot(w, w) - sw * sw).toDouble
    val det = cuu * cvv - cuv * cuv
    val b1n = cvv * cuw - cuv * cvw
    val b2n = cuu * cvw - cuv * cuw
    val nn = u.length
    val rssU = (cww - b1n / det * cuw - b2n / det * cvw) / nn
    val rssR = (cww - cuw / cuu * cuw) / nn
    val f = (rssR - rssU) * (nn - 3) / rssU
    val row = queries.Extras137.statGrangerLag1(spark, sf).collect().head
    assert(row.getLong(0) == nn.toLong)
    assert(math.abs(row.getDouble(1) - b2n / det) < 1e-9)
    assert(math.abs(row.getDouble(2) - f) < 1e-4, s"F ${row.getDouble(2)} vs $f")
    assert(rssU <= rssR + 1e-9, "unrestricted RSS exceeded restricted RSS")
    assert(f >= 0 || math.abs(f) < 1e-9)
  }

  test("stat_shapiro_francia: brute force agrees; W' in (0, 1]") {
    val c = dailyCents().sorted
    val n = c.length
    val mfx = (1 to n).map { i =>
      val p = (i - 0.375) / (n + 0.25)
      val q = if (p <= 0.5) p else 1 - p
      val t = math.sqrt(-2 * math.log(q))
      val z = t - (2.30753 + 0.27061 * t) / (1 + 0.99229 * t + 0.04481 * t * t)
      val m = if (p <= 0.5) -z else z
      BigInt(math.floor(m * 1e9 + 0.5).toLong)
    }.toArray
    val xs = c.map(BigInt(_))
    val smx = mfx.zip(xs).map(p => p._1 * p._2).sum
    val smm = mfx.map(v => v * v).sum
    val sc = xs.sum
    val scc = xs.map(v => v * v).sum
    val sxxc = (BigInt(n) * scc - sc * sc).toDouble
    val w = n * (smx.toDouble / smm.toDouble * smx.toDouble) / sxxc
    val row = queries.Extras137.statShapiroFrancia(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - w) < 1e-5, s"W' ${row.getDouble(1)} vs $w")
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1.0 + 1e-9)
  }

  test("pipeline_calibration_ece: census adds to corpus; ECE = weighted bin gaps; conf in-bin") {
    val rows = queries.Extras137.pipelineCalibrationEce(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTotal = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nTotal, "bin census != corpus size")
    val ece = rows.head.getDouble(5)
    assert(rows.forall(r => math.abs(r.getDouble(5) - ece) < 1e-12),
      "ece column must be constant")
    // ECE is the n-weighted mean of the per-bin gaps (round-off tolerance)
    val recomposed = rows.map(r => r.getLong(1).toDouble * r.getDouble(4)).sum / nTotal
    assert(math.abs(recomposed - ece) < 1e-4, s"recomposed $recomposed vs $ece")
    rows.foreach { r =>
      val (bin, conf) = (r.getLong(0), r.getDouble(2))
      assert(conf >= bin / 10.0 - 1e-9 &&
        (conf <= (bin + 1) / 10.0 + 1e-9 || bin == 9),
        s"bin $bin mean confidence $conf outside its bin")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }
}
