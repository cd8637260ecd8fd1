package graft.functions

import org.apache.spark.sql.SparkSession

/** Idempotent per-session registration bookkeeping shared by all
  * native function objects. Sessions are WEAK keys, so a long-lived
  * JVM that churns sessions never accumulates references to dead
  * ones, and the membership check happens inside the lock, so two
  * racing threads register exactly once (a duplicate registerFunction
  * would be benign — it overwrites — but the single-registration
  * invariant keeps ExpressionInfo identity stable for tooling).
  */
private[graft] object Registration {
  private val done = new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()

  /** Run `body` once per (session, name); later calls no-op. */
  def once(s: SparkSession, name: String)(body: => Unit): Unit = synchronized {
    val names = done.computeIfAbsent(s, _ => new java.util.HashSet[String]())
    if (names.add(name)) body
  }
}
