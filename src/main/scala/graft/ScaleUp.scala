package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side scale fixture generator: synthesizes sf{N×} data by
  * KEY-SHIFTED upsampling of an existing sf dir (the driver's generator
  * is not available in this container; /root/testdata is read-only).
  *
  * Each copy i shifts every entity key by i × (max_key + 1) within its
  * own key domain, so cross-table references stay consistent INSIDE a
  * copy and never collide ACROSS copies: join fan-outs, group
  * cardinalities per key, and hub degrees are copy-invariant, which is
  * what makes measured scaling exponents meaningful (a linear operator
  * should measure ~linear; a pairwise blowup would measure ~quadratic).
  * region/nation are fixed dimensions and copy through unchanged.
  * Text/embedding payloads repeat verbatim across copies — fine for
  * timing (dedup families find 10× duplicates, which only exercises
  * them harder).
  *
  * Usage: ScaleUp <srcSfDir> <dstDir> <copies>
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <dstDir> <copies>")
    val Array(src, dst, copiesS) = args
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-domain shift bases (max key + 1), read once from the source
    def maxOf(table: String, col0: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(col0))).head().getLong(0) + 1L

    val orderBase = maxOf("orders", "o_orderkey")
    val custBase  = maxOf("customer", "c_custkey")
    val suppBase  = maxOf("supplier", "s_suppkey")
    val partBase  = maxOf("part", "p_partkey")
    val eventBase = maxOf("events", "event_id")
    // documents and embeddings share ONE base: doc_id = vec_id is the
    // fixture's cross-modal alignment (multimodal_join and every
    // doc↔embedding row join on it), so shifting the two tables by
    // independent bases would misalign copy i's docs with copy j's
    // vectors and silently change join cardinality per copy
    val docVecBase = math.max(maxOf("documents", "doc_id"),
      maxOf("embeddings", "vec_id"))

    /** Union of `copies` key-shifted images of the table. */
    def up(table: String, shifts: Map[String, Long]): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, b)) =>
          df.withColumn(c, col(c) + lit(b * i))
        }
      }.reduce(_ unionByName _)
    }

    /** Write as ONE parquet FILE at $dst/<name>.parquet — the driver
      * testdata layout. The streaming replay stager (`Streaming
      * .stageDir`) `Files.copy`s that path as a file; a directory there
      * silently copies as an EMPTY dir and every staged stream replays
      * nothing (found the hard way: sf1 streaming rows measured
      * sentinel-only until this matched the testdata layout).
      */
    def write(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_scaleup_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try listing.filter(p => p.toString.endsWith(".parquet")).findFirst()
          .orElseThrow(() => new IllegalStateException(s"no part file written for $name"))
        finally listing.close()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      java.nio.file.Files.move(part, java.nio.file.Paths.get(dst, s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      System.err.println(s"SCALEUP: $name done")
    }

    write(spark.read.parquet(s"$src/region.parquet"), "region")
    write(spark.read.parquet(s"$src/nation.parquet"), "nation")
    write(up("customer", Map("c_custkey" -> custBase)), "customer")
    write(up("supplier", Map("s_suppkey" -> suppBase)), "supplier")
    write(up("part", Map("p_partkey" -> partBase)), "part")
    write(up("orders", Map("o_orderkey" -> orderBase, "o_custkey" -> custBase)), "orders")
    write(up("lineitem", Map("l_orderkey" -> orderBase, "l_partkey" -> partBase,
      "l_suppkey" -> suppBase)), "lineitem")
    write(up("events", Map("event_id" -> eventBase, "user_id" -> custBase)), "events")
    write(up("documents", Map("doc_id" -> docVecBase)), "documents")
    write(up("embeddings", Map("vec_id" -> docVecBase)), "embeddings")
    spark.stop()
  }
}
