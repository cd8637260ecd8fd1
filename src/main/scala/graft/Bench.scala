package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given sf.
  *
  * Session lifecycle: one long-lived `local[N]` JVM running ~480 distinct
  * queries ages measurably — r6 measured the 70 queries shared with r5
  * uniformly 1.47× slower late in the run (positions 407-477) than the
  * same queries late in r5's shorter run (276-346), while a fresh JVM
  * re-ran them at ~1.08× once JIT-warm. The aging is session-state
  * accumulation (codegen classloaders, broadcast blocks, listener state,
  * shuffle dirs) plus JIT code-cache pressure from ~480 unique
  * whole-stage-codegen classes. Mitigations here:
  *   - the SparkSession (and its SparkContext) is RESTARTED every
  *     `SPARK_GRAFT_RESTART_EVERY` (default 96) timed queries — JIT
  *     warmth survives (same JVM), session state does not;
  *   - build.sbt raises -XX:ReservedCodeCacheSize so C2 never hits the
  *     default 240 MB ceiling and falls back to interpretation;
  *   - code-cache/metaspace occupancy is logged to stderr every 50
  *     queries (BENCH_JVM lines) so a recurrence is diagnosable from the
  *     round log alone.
  *
  * Staging accounting: the corpus-wide one-time stages (shingle
  * aggregates, mined near-dup pairs, connected-component labels, the BPE
  * merge table) used to be charged to whichever consumer query ran
  * first — r6's `pipeline_dedup_cascade` showed 14.7 s of which ~13 s
  * was stage. A full run now materializes them up front and reports the
  * cost as its own `"staging"` JSON field; `value` (the gate total)
  * still includes it, so round-over-round totals stay like-for-like.
  */
object Bench {

  private def newSession(cpus: String, sfDir: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // warm the session (codegen compiler, parquet footer cache, shuffle
    // machinery) so the first measured query isn't charged setup
    s.range(1000).selectExpr("sum(id)").collect()
    s.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    s
  }

  /** One stderr line of JIT-code-cache + metaspace occupancy — the
    * evidence trail for (or against) code-cache exhaustion. */
  private def jvmDiag(tag: String): Unit = {
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    val lines = pools
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
      .map { p =>
        val u = p.getUsage
        f"${p.getName.replace(' ', '_')}=${u.getUsed / 1e6}%.0f/${u.getMax / 1e6}%.0fMB"
      }
    System.err.println(s"BENCH_JVM[$tag]: ${lines.mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val restartEvery = sys.env.getOrElse("SPARK_GRAFT_RESTART_EVERY", "96").toInt
    // optional comma-list of query names for targeted timing runs
    val only: Option[Set[String]] =
      args.headOption.filter(_.nonEmpty).map(_.split(",").map(_.trim).toSet)
    var spark = newSession(cpus, sfDir)
    jvmDiag("start")

    // One-time corpus stages, materialized up front on a full run so
    // their cost lands on this explicit line instead of inside the first
    // consumer's time. Targeted (`only`) runs skip this and let the
    // consumer stage lazily, as before.
    val stagingSec: Double = if (only.isEmpty) {
      val t0 = System.nanoTime()
      try {
        queries.ShingleStage.sizes(spark, sfDir).count()
        queries.NgramPairStage.pairs(spark, sfDir).count()
        queries.NearDupComponents.labels(spark, sfDir).count()
        queries.Extras24.stageBpeMerges(spark, sfDir)
        queries.LpaStage.labels(spark, sfDir).count()
        queries.CoPurchaseStage.pairStats(spark, sfDir).count()
      } catch {
        case t: Throwable =>
          System.err.println(s"BENCH_ERROR: staging: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    } else 0.0

    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    var restarts = 0
    val results = selected.map { case (name, fn) =>
      if (i > 0 && i % restartEvery == 0) {
        // reset session state outside any timed region; JIT warmth and
        // the path-keyed staging caches survive (same JVM)
        jvmDiag(s"pre-restart@$i")
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = newSession(cpus, sfDir)
        restarts += 1
      }
      if (i % 50 == 0) jvmDiag(s"q$i")
      i += 1
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
    jvmDiag("end")
    // 3-decimal seconds: ~ms resolution is all the comparison needs, and
    // the shorter line keeps the whole JSON inside the driver's log-tail
    // capture window (full-precision doubles overflowed it in r2 →
    // "parsed": null)
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = stagingSec + (if (results.nonEmpty) results.values.sum else 0.0)
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","staging":${f(stagingSec)},"restarts":$restarts,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
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
