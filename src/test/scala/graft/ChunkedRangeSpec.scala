package graft

import org.apache.spark.sql.functions._

/** ChunkedRange contract: the distributed chunked explode emits
  * EXACTLY the rows `explode(sequence(lo, hi))` would — same set, same
  * multiplicity — while never building a range-length array in one
  * task, including the boundary shapes (empty range, single element,
  * range straddling chunk edges, multiple input rows with different
  * per-row bounds).
  */
class ChunkedRangeSpec extends SparkSpec {

  test("matches single-array explode across chunk boundaries") {
    // Range long enough to span several chunks when ChunkSize is
    // shrunk via modular arithmetic checks isn't possible (ChunkSize
    // is a constant), so instead verify exactly at sizes around the
    // real 64k boundary: 0, 1, 65535, 65536, 65537, 131073.
    val lens = Seq(0L, 1L, 65535L, 65536L, 65537L, 131073L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(lens.zipWithIndex.map { case (l, i) =>
        org.apache.spark.sql.Row(i.toLong, 10L, 10L + l - 1)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.LongType))))
    val got = graft.functions.ChunkedRange
      .explodeRange(df, col("lo"), col("hi"), "i")
      .groupBy("id").agg(count(lit(1)).as("n"), sum(col("i")).as("s"),
        min(col("i")).as("mn"), max(col("i")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    lens.zipWithIndex.foreach { case (l, id) =>
      if (l == 0L) assert(!got.contains(id.toLong), s"len=0 row must emit nothing")
      else {
        val (n, s, mn, mx) = got(id.toLong)
        assert(n == l, s"len=$l count")
        assert(mn == 10L && mx == 10L + l - 1, s"len=$l endpoints")
        assert(s == (10L + (10L + l - 1)) * l / 2, s"len=$l sum")
      }
    }
  }

  test("per-row columns pass through; hi < lo emits nothing") {
    import spark.implicits._
    val df = Seq(("a", 5L, 3L), ("b", 3L, 5L)).toDF("tag", "lo", "hi")
    val rows = graft.functions.ChunkedRange
      .explodeRange(df, col("lo"), col("hi"), "i")
      .select("tag", "i").as[(String, Long)].collect().sorted
    assert(rows.toSeq == Seq(("b", 3L), ("b", 4L), ("b", 5L)))
  }

  test("no single-task range-length array: max per-explode array is ChunkSize") {
    // Structural check on the plan: the inner sequence() step size is
    // bounded by the ChunkSize constant (the generator expression
    // contains the least(...) cap), and a chunk-index repartition sits
    // between the two Generates.
    val df = spark.range(1).select(lit(0L).as("lo"), lit(1000000L).as("hi"))
    val out = graft.functions.ChunkedRange.explodeRange(df, col("lo"), col("hi"), "i")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("least"), "inner sub-range must be capped via least()")
    val exchanges = out.queryExecution.executedPlan.toString
    assert(exchanges.contains("Exchange"), "chunk rows must be redistributed across tasks")
    assert(out.agg(count(lit(1))).collect().head.getLong(0) == 1000001L)
  }
}
