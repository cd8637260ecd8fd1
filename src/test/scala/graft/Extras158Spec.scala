package graft

import org.apache.spark.sql.functions._

/** Wave-58 properties: Rayleigh, Gumbel, spectral entropy, Parkinson
  * replays against definitional brute force on sf0.001.
  */
class Extras158Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def dailyBars(): Seq[(java.sql.Timestamp, Seq[(Long, Long, Long)])] =
    Tables.lineitem(spark, sf)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getTimestamp(0),
        (r.getLong(1), r.getAs[Number](2).longValue, cents(r.getDouble(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (d0, xs) => (d0, xs.map(_._2).toSeq) }

  test("stat_rayleigh_seasonality: circular moment replay") {
    val doys = Tables.orders(spark, sf)
      .select(dayofyear(col("o_orderdate")).as("doy")).collect().map(_.getInt(0))
    val n = doys.length
    def q(x: Double) = math.floor(x * 1e9 + 0.5)
    val byD = doys.groupBy(identity).view.mapValues(_.length.toLong)
    val c = byD.map { case (d0, nd) => nd * q(math.cos(2 * math.Pi * (d0 - 1) / 365.25)) }.sum
    val s0 = byD.map { case (d0, nd) => nd * q(math.sin(2 * math.Pi * (d0 - 1) / 365.25)) }.sum
    val rbar = math.sqrt(c * c + s0 * s0) / (n * 1e9)
    val ang0 = math.atan2(s0, c)
    val meanDoy = (if (ang0 < 0) ang0 + 2 * math.Pi else ang0) / (2 * math.Pi) * 365.25 + 1
    val row = queries.Extras158.statRayleighSeasonality(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rbar) < 1e-5)
    assert(math.abs(row.getDouble(2) - meanDoy) < 0.02)
    assert(math.abs(row.getDouble(3) - n * rbar * rbar) < 1e-2)
    assert(row.getBoolean(4) == (n * rbar * rbar > 2.996))
  }

  test("stat_gumbel_block_maxima: method-of-moments replay; return level above mu") {
    val daily = dailyBars().map { case (d0, xs) => (d0, xs.map(_._3).sum) }
    val blocks = daily.groupBy(t => (t._1.toLocalDateTime.getYear,
        t._1.toLocalDateTime.getMonthValue))
      .values.map(_.map(_._2).max).toSeq
    val b = blocks.length
    val mean = blocks.map(BigInt(_)).sum.toDouble / b
    val sm = blocks.map(BigInt(_)).sum; val qm = blocks.map(x => BigInt(x) * x).sum
    val sd = math.sqrt((BigInt(b) * qm - sm * sm).toDouble) / b
    val beta = sd * math.sqrt(6) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    val x100 = mu - beta * math.log(-math.log(1 - 1.0 / 100))
    val row = queries.Extras158.statGumbelBlockMaxima(spark, sf).collect().head
    assert(row.getLong(0) == b.toLong)
    assert(math.abs(row.getDouble(1) - mu / 100) < 0.05)
    assert(math.abs(row.getDouble(2) - beta / 100) < 0.05)
    assert(math.abs(row.getDouble(3) - x100 / 100) < 0.05)
    assert(row.getDouble(3) > row.getDouble(1)) // return level exceeds location
  }

  test("time_spectral_entropy: brute-force periodogram replay; entropy in [0,1]") {
    val daily = dailyBars().map { case (_, xs) => xs.map(_._3).sum }
    val n = daily.length
    val sc = daily.map(BigInt(_)).sum
    val x = daily.zipWithIndex.map { case (c, i) => (i + 1L, (BigInt(n) * c - sc)) }
    def q6(v: Double) = BigInt(math.floor(v * 1e6 + 0.5).toLong)
    val energies = (2 to 30).map { p =>
      val a = x.map { case (t, xv) => xv * q6(math.cos(2 * math.Pi * t / p)) }.sum
      val b = x.map { case (t, xv) => xv * q6(math.sin(2 * math.Pi * t / p)) }.sum
      p -> (a.toDouble * a.toDouble + b.toDouble * b.toDouble)
    }
    val tot = energies.map(_._2).sum
    val ent = energies.map { case (_, e) =>
      if (e > 0) -(e / tot) * math.log(e / tot) else 0.0
    }.sum / math.log(29.0)
    val peak = energies.maxBy(_._2)._1
    val row = queries.Extras158.timeSpectralEntropy(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - ent) < 1e-4)
    assert(row.getDouble(0) >= 0 && row.getDouble(0) <= 1)
    assert(row.getDouble(1) == peak.toDouble)
  }

  test("win_parkinson_volatility: OHLC log-range replay; GK and P agree in order") {
    val bars = dailyBars().map { case (_, xs) =>
      val h = xs.map(_._3).max; val l = xs.map(_._3).min
      val o = xs.minBy(t => (t._1, t._2))._3; val c = xs.maxBy(t => (t._1, t._2))._3
      (h, l, o, c)
    }
    def q(v: Double) = math.floor(v * 1e9 + 0.5).toLong
    val shl = bars.map { case (h, l, _, _) => BigInt(q(math.log(h.toDouble / l))).pow(2) }.sum
    val sco = bars.map { case (_, _, o, c) => BigInt(q(math.log(c.toDouble / o))).pow(2) }.sum
    val n = bars.length
    val pv = shl.toDouble / 1e18 / (4 * n * math.log(2))
    val gk = (0.5 * shl.toDouble / 1e18 - (2 * math.log(2) - 1) * sco.toDouble / 1e18) / n
    val row = queries.Extras158.winParkinsonVolatility(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - pv) < 1e-6)
    assert(math.abs(row.getDouble(2) - gk) < 1e-6)
    assert(row.getDouble(1) > 0 && row.getDouble(2) > 0)
  }
}
