package graft

import org.apache.spark.sql.functions._

/** Engine-side properties of the round-8 third wave: RAKE output
  * structure and the semi join's at-most-once/subset semantics vs the
  * inner stream-stream join.
  */
class Extras103Spec extends SparkSpec {

  test("text_keyword_rake: phrases are stopword-free, capped, positively scored") {
    val rows = queries.Extras103.textKeywordRake(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { r =>
      val phrase = r.getString(0)
      val words = phrase.split(" ")
      assert(words.nonEmpty && words.length <= queries.Extras103.RakeMaxPhrase,
        s"phrase over cap: '$phrase'")
      assert(words.forall(w => !queries.Extras103.RakeStops.contains(w)),
        s"stopword leaked into phrase: '$phrase'")
      assert(words.forall(_.matches("[a-z0-9]+")),
        s"unstripped token in phrase: '$phrase'")
      assert(r.getLong(2) > 0L, s"non-positive score for '$phrase'")
    }
    // scores arrive ranked
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
  }

  test("stream_stream_left_semi: each purchase at most once, = distinct inner-join left side") {
    val semi = queries.Extras103.streamStreamLeftSemi(spark, sf)
      .select("p_id").collect().map(_.getLong(0)).toSeq
    assert(semi == semi.distinct, "semi join emitted a purchase twice")
    val innerLeft = queries.Streaming.streamStreamJoin(spark, sf)
      .select("p_id").distinct().collect().map(_.getLong(0)).toSeq.sorted
    assert(semi.sorted == innerLeft,
      "semi result diverges from the inner join's distinct left side")
  }
}
