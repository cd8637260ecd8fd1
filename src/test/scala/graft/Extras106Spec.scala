package graft

import org.apache.spark.sql.functions._

/** The decomposition's defining identity and the strength summary's
  * bounds — engine-side properties beyond the oracle's value match.
  */
class Extras106Spec extends SparkSpec {

  test("time_seasonal_decompose: cents*Q = trend + seasonal + residual, exactly") {
    val q = queries.Extras106.DecompQ
    val bad = queries.Extras106.timeSeasonalDecompose(spark, sf)
      .filter(col("cents") * q =!=
        col("trend_mc") + col("seasonal_mc") + col("residual_mc"))
      .count()
    assert(bad == 0, s"$bad days violate the decomposition identity")
    // seasonal component must be a pure dow effect: exactly one value
    // per day-of-week
    val distinctSeas = queries.Extras106.timeSeasonalDecompose(spark, sf)
      .select(dayofweek(col("day")).as("dow"), col("seasonal_mc"))
      .distinct().groupBy("dow").count()
      .filter(col("count") > 1).count()
    assert(distinctSeas == 0, "seasonal_mc varies within a day-of-week")
  }

  test("time_seasonal_strength: bounded in [0,1], defined over the trimmed series") {
    val r = queries.Extras106.timeSeasonalStrength(spark, sf).head()
    val (n, ft, fs) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 0)
    assert(ft >= 0.0 && ft <= 1.0, s"f_trend=$ft")
    assert(fs >= 0.0 && fs <= 1.0, s"f_seasonal=$fs")
  }
}
