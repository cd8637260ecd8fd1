package graft

import org.apache.spark.sql.functions._

/** CdcCuts contract: `graft_cdc_cuts(text)` must emit EXACTLY the cut
  * positions of the exploded md5-gate formulation it replaced in
  * dedup_cdc_chunking —
  * `p in 8..len where conv(substr(md5(substr(text, p-7, 8)), 1, 4),
  * 16, 10) % 64 = 0`, ascending — including multi-byte code points
  * (SQL substring counts code points, not bytes) and the no-hit /
  * too-short edge cases.
  */
class CdcCutsSpec extends SparkSpec {

  test("bit-identical to the exploded md5-gate formulation") {
    graft.functions.CdcCuts.register(spark)
    // deterministic texts spanning: ASCII, repeated content (many
    // gate hits), 2-byte and 3-byte code points around window edges,
    // exactly-8-char, and shorter-than-window
    val texts = Seq(
      "a" * 7, // shorter than the window: empty cuts
      "abcdefgh", // exactly one window
      (0 until 600).map(i => ('a' + i % 26).toChar).mkString,
      ("the quick brown fox jumps over the lazy dog " * 30).trim,
      "héllo wörld ünïcode çhars " * 25,
      "日本語のテキストです。" * 20,
      "mixed ascii と 日本語 and ümlauts " * 18)
    val df = spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
      .withColumn("len", length(col("text")).cast("long"))
    val expected = df
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr("CASE WHEN len >= 8 THEN sequence(8L, len) ELSE array() END")).as("p"))
      .filter(expr(
        "CAST(conv(substring(md5(substring(text, CAST(p - 7 AS INT), 8)), 1, 4), 16, 10) AS BIGINT) % 64 = 0"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("p"))).as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = df
      .select(col("doc_id"), expr("graft_cdc_cuts(text)").as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.indices.foreach { i =>
      val want = expected.getOrElse(i.toLong, Seq.empty[Long])
      assert(got(i.toLong) == want,
        s"doc $i: got ${got(i.toLong)}, want $want")
    }
    // sanity: the fixture family must actually exercise hits
    assert(expected.values.map(_.size).sum > 10, "gate never fired — weak fixture")
  }
}
