package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeCoder, BpeTokenizer}

/** Exactness tests for the corpus-trained BPE tokenizer (C152) — the
  * merge table is a fixpoint no single SQL query expresses, so the
  * correctness story lives here: hand-derived merges, the
  * encode/decode identity on the real corpus, and the greedy-encode
  * fixpoint property.
  */
class BpeSpec extends SparkSpec {

  test("training reproduces hand-derived merges with deterministic tie-breaks") {
    // counts: (a,a)=5, (a,b)=3 → merge (a,a)
    // then (aa,a)=2, (a,b)=2 tie → lexicographic: (a,b) wins
    // then (aa,ab)=2 over (aa,b)=1
    val merges = BpeTokenizer.train(Seq(("aaab", 2L), ("aab", 1L)), 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("greedy encode reproduces training segmentation and reaches a fixpoint") {
    val merges = BpeTokenizer.train(Seq(("aaab", 2L), ("aab", 1L)), 3)
    val coder = new BpeCoder(merges)
    assert(coder.encodeWord("aaab").toSeq == Seq("aaab"))
    assert(coder.encodeWord("aab").toSeq == Seq("aa", "b"))
    assert(coder.encodeWord("ba").toSeq == Seq("b", "a")) // no merge applies
    assert(coder.encodeWord("").isEmpty)
    // fixpoint: no adjacent output pair is mergeable
    val rank = merges.toSet
    Seq("aaab", "aab", "ba", "abba", "aaaa").foreach { w =>
      val t = coder.encodeWord(w)
      t.zip(t.drop(1)).foreach { p => assert(!rank.contains(p), s"$w -> ${t.toSeq}: $p mergeable") }
      assert(t.mkString("") == w, s"roundtrip broke on $w")
    }
  }

  test("corpus encode: concat(tokens) reproduces every document's text minus spaces") {
    val df = graft.queries.Extras24.textBpeTokenize(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks >= words && toks <= chars,
        s"doc ${r.getLong(0)}: n_bpe_tokens $toks outside [$words, $chars]")
    }
    // explicit reconstruction check on the raw corpus (not just counts)
    val docs = graft.Tables.documents(spark, sf).limit(100).collect()
    val wc = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val coder = new BpeCoder(BpeTokenizer.train(wc, 40))
    docs.foreach { r =>
      val text = r.getAs[String]("text")
      val rebuilt = text.split(' ').filter(_.nonEmpty)
        .flatMap(coder.encodeWord).mkString("")
      assert(rebuilt == text.replace(" ", ""), s"reconstruction broke on doc")
    }
  }

  test("training is a pure function of the dictionary (input order irrelevant)") {
    val dict = Seq(("hello", 5L), ("help", 3L), ("held", 2L), ("yelp", 4L))
    val a = BpeTokenizer.train(dict, 10)
    val b = BpeTokenizer.train(dict.reverse, 10)
    assert(a == b)
  }
}
