package graft

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

/** MULTI-PROCESS DatasetStore contention test (r8 verdict task #3):
  * the store's core guarantee — manifest-CAS via exclusive `link(2)`,
  * pointer chains of immutable generation files — is only meaningful
  * across OS PROCESSES (the shared-store deployment), but until r9 it
  * was proven only with threads in one JVM, where the per-path JVM
  * lock incidentally serializes the CURRENT rewrite too.
  *
  * Here N forked JVMs (each its own SparkSession + DatasetStore
  * instance) interleave `appendAtomic` onto main and `appendBranch`
  * onto one shared branch. Assertions:
  *
  *  - no lost update: main's head = init row + every writer's every
  *    main append, exactly once; the branch head = every branch
  *    append + nothing of main's (lineage isolation — a main append
  *    must never graft branch rows, and vice versa);
  *  - linearizable history: the main-head generation chain is DENSE
  *    (one generation per successful commit, none skipped or
  *    double-claimed) and its version values STRICTLY INCREASE — a
  *    stale-lineage manifest can land in the log as an orphan but can
  *    never become a head generation;
  *  - `read()` (head-chain resolution) agrees with
  *    `readAt(headVersion())`. CURRENT is only a best-effort cache
  *    for external tools: the last process to rewrite it can be a
  *    stale winner, which is exactly why read() does not trust it
  *    (see DatasetStore.liveSegments).
  *
  * Known race this test documents: two processes' CURRENT rewrites
  * are not ordered (the pathLock is JVM-local), so CURRENT may end a
  * run pointing at a superseded snapshot. All AUTHORITATIVE reads go
  * through the monotone head chain, asserted below.
  */
class StoreMultiProcessSpec extends SparkSpec {

  private val NWriters = 3
  private val NAppends = 8

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("appendAtomic + appendBranch linearize across forked OS processes") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_storerace_").toString
    val dir = s"$base/store"
    val store = new graft.sources.DatasetStore(spark, dir, "k")
    store.init(Seq((0L, "init", "main")).toDF("k", "writer", "side"))
    store.createBranch("race", store.headVersion())

    val javaBin = new File(new File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cp = sys.props("java.class.path") // tests fork, so this is the full test classpath
    val procs = (1 to NWriters).map { w =>
      val log = new File(base, s"child_$w.log")
      val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
        "-Xmx1500m", "-XX:ReservedCodeCacheSize=128m",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.StoreRaceChild", dir, w.toString, NAppends.toString)
      val p = new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true).redirectOutput(log).start()
      (w, p, log)
    }
    procs.foreach { case (w, p, log) =>
      assert(p.waitFor(300, TimeUnit.SECONDS), s"writer $w timed out")
      assert(p.exitValue() == 0,
        s"writer $w failed (rc=${p.exitValue()}):\n" +
          new String(Files.readAllBytes(log.toPath), UTF_8).linesIterator.toSeq.takeRight(25).mkString("\n"))
    }

    // --- no lost update + lineage isolation
    val mainRows = store.read().select("k", "side").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectedMain = (for { w <- 1 to NWriters; i <- 0 until NAppends }
      yield w * 1000L + i).toSet + 0L
    assert(mainRows.map(_._1).toSet == expectedMain,
      s"main head lost/gained rows: missing=${expectedMain -- mainRows.map(_._1)}, " +
        s"extra=${mainRows.map(_._1).toSet -- expectedMain}")
    assert(mainRows.length == expectedMain.size, "main head has duplicate rows")
    assert(mainRows.forall(_._2 != "branch"), "branch rows grafted into main lineage")

    val branchRows = store.readBranch("race").select("k", "side").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectedBranch = (for { w <- 1 to NWriters; i <- 0 until NAppends }
      yield w * 1000L + 500 + i).toSet + 0L // + the init row at the fork point
    assert(branchRows.map(_._1).toSet == expectedBranch,
      s"branch head lost/gained rows: missing=${expectedBranch -- branchRows.map(_._1)}, " +
        s"extra=${branchRows.map(_._1).toSet -- expectedBranch}")
    assert(branchRows.count(_._2 == "main") == 1, // only the fork-point init row
      "main appends grafted into branch lineage")

    // --- read() (head chain) == readAt(headVersion())
    val atHead = store.readAt(store.headVersion()).select("k").collect().map(_.getLong(0)).toSet
    assert(atHead == expectedMain, "read() and readAt(headVersion()) diverge")

    // --- linearizable history: dense, strictly-increasing pointer chains
    def chain(prefix: String): Seq[(Long, Long)] =
      new File(dir).list().toSeq
        .filter(n => n.startsWith(prefix) && n.substring(prefix.length).forall(_.isDigit))
        .map { n =>
          val gen = n.substring(prefix.length).toLong
          val v = new String(Files.readAllBytes(new File(dir, n).toPath), UTF_8).trim.toLong
          (gen, v)
        }.sortBy(_._1)
    val mainChain = chain("MAINHEAD.g")
    // one generation per successful main commit: 1 init + N*M appends
    assert(mainChain.map(_._1) == (1L to (1L + NWriters * NAppends)),
      s"main-head generations not dense: ${mainChain.map(_._1)}")
    assert(mainChain.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      s"main-head versions not strictly increasing: ${mainChain.map(_._2)}")
    val branchChain = chain("BRANCH.race.g")
    assert(branchChain.map(_._1) == (1L to (1L + NWriters * NAppends)),
      s"branch generations not dense: ${branchChain.map(_._1)}")
    // gen 1 is createBranch (may point backward by design); appends strictly increase
    assert(branchChain.map(_._2).drop(1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      s"branch versions not strictly increasing after fork: ${branchChain.map(_._2)}")

    info(s"${NWriters} processes x ${NAppends} appends each on main+branch: " +
      s"head v${store.headVersion()}, ${mainChain.size} main gens, ${branchChain.size} branch gens, 0 lost")
  }

  test("pinned readAt(v_old) reader survives concurrent compact+vacuum (grace window contract)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_storegc_").toString
    val dir = s"$base/store"
    val store = new graft.sources.DatasetStore(spark, dir, "k")
    store.init((0L until 100L).map(k => (k, "base")).toDF("k", "tag"))
    store.append((100L until 150L).map(k => (k, "old")).toDF("k", "tag"))
    val vOld = store.headVersion()

    // fork the pinned reader; wait for it to resolve vOld's manifest
    val javaBin = new File(new File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val ready = new File(base, "reader_ready")
    val log = new File(base, "reader.log")
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx1500m", "-XX:ReservedCodeCacheSize=128m",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.StoreReaderChild",
      dir, vOld.toString, "6000", ready.getAbsolutePath)
    val p = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true).redirectOutput(log).start()
    val t0 = System.currentTimeMillis()
    while (!ready.exists && System.currentTimeMillis() - t0 < 120000) Thread.sleep(100)
    assert(ready.exists, "reader never signaled readiness")
    assert(new String(Files.readAllBytes(ready.toPath), UTF_8).trim.toLong == 150L)

    // concurrent writer churn: appends + compacts + vacuums that expire
    // vOld's MANIFEST while the reader's scan loop is live. Default
    // grace keeps the un-referenced segment FILES, so the pinned reader
    // must stay green for its whole window.
    var i = 0L
    while (p.isAlive) {
      store.append(Seq((1000L + i, "churn")).toDF("k", "tag"))
      store.compact()
      store.vacuum(keep = 2)
      i += 1
    }
    assert(p.waitFor(60, TimeUnit.SECONDS), "pinned reader timed out")
    assert(p.exitValue() == 0,
      s"pinned reader failed (rc=${p.exitValue()}):\n" +
        new String(Files.readAllBytes(log.toPath), UTF_8).linesIterator.toSeq.takeRight(25).mkString("\n"))
    assert(i >= 2, s"writer churned only $i cycles — race window too small")

    // vOld's manifest is expired: a FRESH pin at vOld now fails LOUDLY
    // (the time-travel contract — never a silent partial read) …
    val ex = intercept[IllegalArgumentException](store.readAt(vOld))
    assert(ex.getMessage.contains(s"no snapshot v$vOld"))

    // … but its segment files were grace-retained, not deleted: more
    // dirs on disk than the compacted head references, purely by grace
    val headSegs = new String(
      Files.readAllBytes(new File(dir, s"MANIFEST.v${store.headVersion()}").toPath), UTF_8)
      .split('\n').count(_.trim.nonEmpty)
    assert(store.segmentDirsOnDisk > headSegs,
      "expected grace-retained orphan segments after vacuum(keep=2)")

    // grace=0 (single-writer quiesced) reclaims them; head still reads
    store.vacuum(keep = 1, graceMs = 0L)
    assert(store.segmentDirsOnDisk == headSegs,
      s"grace-0 vacuum left orphans: ${store.segmentDirsOnDisk} dirs vs $headSegs live")
    val ks = store.read().select("k").collect().map(_.getLong(0)).toSet
    assert(ks == ((0L until 150L) ++ (1000L until 1000L + i)).toSet,
      "head data lost after grace-0 vacuum")
    info(s"pinned reader green across $i concurrent compact+vacuum cycles; " +
      s"manifest expiry loud; grace-0 reclaimed to $headSegs live segment dirs")
  }
}
