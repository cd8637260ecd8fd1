package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-list of query names for targeted timing runs
    val only: Option[Set[String]] =
      args.headOption.filter(_.nonEmpty).map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen compiler, parquet footer cache, shuffle
    // machinery) so the first measured query isn't charged ~4 s of
    // one-time JVM/session setup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      // measurement isolation: collect the previous query's garbage
      // OUTSIDE the timed region so its GC pauses don't land in this
      // query's wall time (with 100+ queries on one JVM the cross-query
      // pressure inflated isolated-run-sub-second queries to multi-sec)
      System.gc()
      val t0 = System.nanoTime()
      // a failed query must NOT report as a (fast) wall time — record it
      // in an explicit errors list so the bench JSON distinguishes
      // broken from quick
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable =>
          failed += name
          System.err.println(s"BENCH_ERROR: $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal seconds: ~ms resolution is all the comparison needs, and
    // the shorter line keeps the whole JSON inside the driver's log-tail
    // capture window (full-precision doubles overflowed it in r2 →
    // "parsed": null)
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // Emit three ways so any parser finds it: a file, the plain line,
    // and (last — closest to the end of the captured log) a marker line.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
        json.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(json)
    println(s"BENCH_JSON: $json")
    spark.stop()
  }
}
