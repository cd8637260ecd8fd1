package graft

import org.apache.spark.sql.functions._
import graft.plans.{BoundedPrefix, GlobalRank}

/** r14 optimization helpers must be BIT-IDENTICAL to the GlobalRank
  * formulations they replace: [[BoundedPrefix]] (single-task windows
  * over bounded frames) and [[GlobalRank.withRankAndPrefixSums]] (N
  * prefix columns + rank from ONE two-pass machinery). Each test
  * compares against the original helper on a frame with duplicates,
  * negatives, decimals, and enough rows to span several range
  * partitions.
  */
class BoundedPrefixSpec extends SparkSpec {
  private val s = TestSpark.spark
  import s.implicits._

  private def frame = {
    // 500 rows, keys with ties broken by id, long + decimal values
    val rows = (1 to 500).map { i =>
      (i.toLong, (i % 37).toLong, ((i * 7) % 23).toLong - 11,
        BigDecimal((i % 13) * 100 + i % 7).setScale(2))
    }
    rows.toDF("id", "k", "v", "dv")
  }

  test("BoundedPrefix.prefixSums == GlobalRank.withExclusivePrefixSum (long + decimal)") {
    val df = frame
    val sort = Seq(col("k").asc, col("id").asc)
    val a = BoundedPrefix.prefixSums(df,
        Seq((col("v"), "pv"), (col("dv"), "pdv")), sort)
      .orderBy("k", "id").select("id", "k", "v", "dv", "pv", "pdv").collect()
    val b0 = GlobalRank.withExclusivePrefixSum(df, "pv", col("v"), sort)
    val b = GlobalRank.withExclusivePrefixSum(b0, "pdv", col("dv"), sort)
      .orderBy("k", "id").select("id", "k", "v", "dv", "pv", "pdv").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
  }

  test("BoundedPrefix.rowNumberAndTotal == GlobalRank.withGlobalRowNumberAndTotal") {
    val df = frame
    val sort = Seq(col("k").asc, col("id").asc)
    val a = BoundedPrefix.rowNumberAndTotal(df, "rn", "nn", sort)
      .orderBy("k", "id").select("id", "rn", "nn").collect()
    val b = GlobalRank.withGlobalRowNumberAndTotal(df, "rn", "nn", sort)
      .orderBy("k", "id").select("id", "rn", "nn").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("withRankAndPrefixSums == nested GlobalRank calls (rank + 2 sums, same order)") {
    val df = frame
    val sort = Seq(col("k").asc, col("id").asc)
    val a = GlobalRank.withRankAndPrefixSums(df, Some("rn"),
        Seq((col("v"), "pv"), (col("dv"), "pdv")), sort)
      .orderBy("k", "id").select("id", "rn", "pv", "pdv").collect()
    val b0 = GlobalRank.withGlobalRowNumber(df, "rn", sort)
    val b1 = GlobalRank.withExclusivePrefixSum(b0, "pv", col("v"), sort)
    val b = GlobalRank.withExclusivePrefixSum(b1, "pdv", col("dv"), sort)
      .orderBy("k", "id").select("id", "rn", "pv", "pdv").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("withRankAndPrefixSums output types match sum()/rank types") {
    val df = frame
    val out = GlobalRank.withRankAndPrefixSums(df, Some("rn"),
      Seq((col("v"), "pv"), (col("dv"), "pdv")), Seq(col("id").asc))
    val sch = out.schema.map(f => f.name -> f.dataType).toMap
    assert(sch("rn") == org.apache.spark.sql.types.LongType)
    assert(sch("pv") == org.apache.spark.sql.types.LongType)
    assert(sch("pdv") == df.select(sum(col("dv"))).schema.head.dataType)
  }
}
