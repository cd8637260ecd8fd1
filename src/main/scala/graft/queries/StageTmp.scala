package graft.queries

import java.nio.file.{Files, Path}

/** Temp-dir factory for the once-per-corpus STAGE caches (LPA edges/
  * labels, shingle aggregates, mined near-dup pairs, IVF indexes, IVM
  * stores): same `Files.createTempDirectory` semantics, plus a single
  * JVM shutdown hook that recursively deletes every dir handed out.
  * Without it, repeated sessions against the same corpus leak the
  * staged parquet on disk — the per-JVM memo maps cache only the PATH
  * and nothing ever reclaimed it (r8 ADVICE). On a cluster the stage
  * target would be a shared, explicitly-lifecycled location; the
  * shutdown hook is the local[] equivalent of that lifecycle.
  */
object StageTmp {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread("graft-stagetmp-cleanup") {
    override def run(): Unit = {
      created.forEach { p =>
        try rmTree(p.toFile)
        catch { case _: Throwable => () } // best-effort: a failed delete leaks space, never data
      }
    }
  })

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  /** A fresh temp directory that will be removed at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
