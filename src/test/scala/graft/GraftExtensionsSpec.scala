package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions entry point must make every native
  * function resolvable from plain SQL in a fresh session — the
  * "switch your session to this library" story.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions registers all graft functions for SQL use") {
    // getOrCreate would silently reuse the shared test session (whose
    // registry other specs may have populated via register()) — clear
    // the default so a genuinely fresh session is built, then restore
    val saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = s2.sql(
        "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
      assert(dot == 11.0)
      assert(s2.sql("SELECT graft_text_search('Merge Join Rocks', 'join') AS m")
        .head().getBoolean(0))
      assert(!s2.sql("SELECT graft_simhash64(array(1L, 2L)) IS NULL AS n").head().getBoolean(0))
      assert(s2.sql("SELECT size(graft_minhash16(array(1L, 2L))) AS k").head().getInt(0) == 16)
      // zorder: x=0b11 → bits 0,2; y=0b1 → bit 1 ⇒ z=0b111=7
      assert(s2.sql("SELECT graft_zorder2(3L, 1L) AS z").head().getLong(0) == 7L)
    } finally {
      // the new session shares the JVM's SparkContext — do NOT stop it;
      // just restore the shared session for the remaining suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      saved.foreach(SparkSession.setDefaultSession)
    }
  }
}
