package graft

import org.apache.spark.sql.functions._

/** Wave-57 properties: Krippendorff, typed Aggregator, HOF fold,
  * median polish replays against brute force on sf0.001.
  */
class Extras157Spec extends SparkSpec {

  private def cents(p: Double): Long =
    (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("stat_krippendorff_alpha: textbook replay") {
    val votes = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.length >= 2)
    val n = votes.values.map(_.length.toLong).sum
    val cats = votes.values.flatten.toSeq.distinct
    val doObs = votes.values.map { vs =>
      val nu = vs.length
      cats.map { c =>
        val nuc = vs.count(_ == c).toLong
        nuc.toDouble * (nu - nuc) / (nu - 1)
      }.sum
    }.sum / n
    val deExp = {
      val nc = cats.map(c => votes.values.map(_.count(_ == c).toLong).sum)
      (n.toDouble * n - nc.map(x => x.toDouble * x).sum) / (n.toDouble * (n - 1))
    }
    val alpha = 1 - doObs / deExp
    val row = queries.Extras157.statKrippendorffAlpha(spark, sf).collect().head
    assert(row.getLong(0) == votes.size.toLong)
    assert(row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - doObs) < 1e-5)
    assert(math.abs(row.getDouble(3) - deExp) < 1e-5)
    assert(math.abs(row.getDouble(4) - alpha) < 1e-4)
  }

  test("typed_variance_aggregator: exact-moment merge equals direct variance") {
    val v = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val got = queries.Extras157.typedVarianceAggregator(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == v.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val qs = v.filter(_._1 == r.getString(0)).map(_._2)
      val n = qs.length
      val mean = qs.sum.toDouble / n
      val varr = qs.map(q => (q - mean) * (q - mean)).sum / n
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - varr) < 1e-4)
    }
    // associativity probe: merging two halves equals one pass
    val half = v.length / 2
    val (l, rgt) = v.map(_._2).splitAt(half)
    def mom(xs: Array[Long]) = (xs.length.toLong, xs.sum, xs.map(q => q * q).sum)
    val (n1, s1, q1) = mom(l); val (n2, s2, q2) = mom(rgt)
    val merged = queries.Extras157.VarAgg.merge((n1, s1, q1), (n2, s2, q2))
    assert(merged == mom(v.map(_._2)))
  }

  test("hof_struct_fold: per-doc fold replay") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = queries.Extras157.hofStructFold(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val ds = docs.filter(_._1 == r.getString(0)).map(_._2)
      val folds = ds.map { t =>
        val lens = t.split(" ", -1).map(_.length)
        (lens.min.toLong, lens.max.toLong, lens.map(_.toLong).sum, lens.length.toLong)
      }
      assert(r.getLong(1) == ds.length.toLong)
      assert(math.abs(r.getDouble(2) - folds.map(_._1).sum.toDouble / ds.length) < 1e-3)
      assert(math.abs(r.getDouble(3) - folds.map(_._2).sum.toDouble / ds.length) < 1e-3)
      assert(r.getLong(4) == folds.map(_._4).sum)
      assert(math.abs(r.getDouble(5) -
        folds.map(_._3).sum.toDouble / folds.map(_._4).sum) < 1e-3)
    }
  }

  test("stat_median_polish: brute-force one-sweep replay on the 28-cell matrix") {
    val cells = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), quarter(col("l_shipdate")).as("q"),
        col("l_extendedprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val years = cells.keys.map(_._1).toSeq.distinct.sorted
    val quarters = cells.keys.map(_._2).toSeq.distinct.sorted
    // row sweep: 2*residual = 2c - (S - min - max) per year (4 quarters)
    val r1 = for (y <- years; q <- quarters) yield {
      val row = quarters.map(q2 => cells((y, q2)))
      ((y, q), 2 * cells((y, q)) - (row.sum - row.min - row.max))
    }
    val r1m = r1.toMap
    val got = queries.Extras157.statMedianPolish(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == quarters.map(_.toLong))
    got.foreach { r =>
      val q = r.getLong(0).toInt
      val col0 = years.map(y => (r1m((y, q)), y)).sorted
      val colmed = col0((col0.length - 1) / 2)._1 // odd count exact median
      assert(r.getLong(1) == years.length.toLong)
      assert(math.abs(r.getDouble(2) - colmed.toDouble / 200) < 1e-3)
      val maxres = years.map(y => math.abs(r1m((y, q)) - colmed)).max
      assert(math.abs(r.getDouble(3) - maxres.toDouble / 200) < 1e-3)
    }
  }
}
