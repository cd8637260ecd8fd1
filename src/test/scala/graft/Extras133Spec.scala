package graft

import org.apache.spark.sql.functions._

/** Wave-33 properties the DuckDB oracle can't express. */
class Extras133Spec extends SparkSpec {

  test("stat_theil_inequality: decomposition consistent, shares sum to 1, brute-forced total") {
    val rows = queries.Extras133.statTheilInequality(spark, sf).collect()
    assert(rows.length == 25)
    val (tb, tt) = (rows.head.getDouble(5), rows.head.getDouble(6))
    assert(tb >= 0.0 && tt >= tb, "between-group Theil is nonnegative and <= total")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3, "revenue shares sum to 1")
    rows.foreach(r => assert(r.getDouble(4) >= -1e-9, "within-group Theil nonnegative"))
    // driver-side brute force of T_total over all customer spends
    val spends = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .cast("long").as("x")).collect().map(_.getLong(1).toDouble)
    val n = spends.length
    val mu = spends.sum / n
    val t = spends.map(x => x / mu * math.log(x / mu)).sum / n
    assert(math.abs(tt - t) < 1e-3, s"engine Theil $tt vs brute $t")
  }

  test("embed_energy_distance: class sizes match label census, E >= 0 (V-statistic)") {
    val r = queries.Extras133.embedEnergyDistance(spark, sf).head()
    val counts = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 500 && col("label").isin(0, 1))
      .groupBy("label").count().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r.getLong(0) == counts(0), "class-0 size")
    assert(r.getLong(1) == counts(1), "class-1 size")
    assert(r.getDouble(5) >= -1e-6, "V-statistic energy distance is nonnegative")
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0 && r.getDouble(4) > 0)
    // V-statistic within-means are the (n-1)/n-shrunk U-statistic means
    assert(r.getDouble(3) < r.getDouble(2) + 1.0 && r.getDouble(4) < r.getDouble(2) + 1.0)
  }

  test("multimodal_audio_zcr: zcr in [0,1], one doc brute-forced") {
    val rows = queries.Extras133.multimodalAudioZcr(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) < r.getLong(1), "crossings < samples")
    }
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select("text").head().getString(0).getBytes("UTF-8")
    val brute = doc0.sliding(2).count(w => ((w(0) & 0xff) < 64) != ((w(1) & 0xff) < 64))
    assert(rows.head.getLong(2) == brute.toLong,
      s"doc 0: engine ${rows.head.getLong(2)} vs brute $brute crossings")
  }

  test("stat_breusch_pagan: r2 in [0,1], bp = n*r2") {
    val r = queries.Extras133.statBreuschPagan(spark, sf).head()
    val (n, r2, bp) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(bp - math.rint(n * r2 * 1e6) / 1e6) < 1e-9)
    assert(r.getBoolean(3) == (n * r2 > 3.841))
  }
}
