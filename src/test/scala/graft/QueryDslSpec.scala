package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.QueryDsl
import graft.functions.QueryDsl._

/** DSL parser + compiler: example-based parses, print∘parse round-trip
  * as a scalacheck property over generated ASTs, and predicate
  * equivalence against hand-built filters on the real documents table.
  */
class QueryDslSpec extends SparkSpec {

  test("parses every construct") {
    assert(parse("chl") == PhraseQuery("chl"))
    assert(parse("\"deep chl\"") == PhraseQuery("deep chl"))
    assert(parse("cruise:endeavor") == FieldValueQuery("cruise", "endeavor"))
    assert(parse("cruise:end*") == FieldWildcardQuery("cruise", "end*"))
    assert(parse("depth:[0 TO 30]") == FieldRangeQuery("depth", "0", "30"))
    assert(parse("a AND b") == BinaryOpQuery("AND", PhraseQuery("a"), PhraseQuery("b")))
    assert(parse("a OR b AND c") ==
      BinaryOpQuery("OR", PhraseQuery("a"),
        BinaryOpQuery("AND", PhraseQuery("b"), PhraseQuery("c"))))
    assert(parse("NOT a") == UnaryOpQuery("NOT", PhraseQuery("a")))
    assert(parse("-a") == UnaryOpQuery("-", PhraseQuery("a")))
    assert(parse("+a") == UnaryOpQuery("+", PhraseQuery("a")))
    assert(parse("(a OR b) AND c") ==
      BinaryOpQuery("AND", BinaryOpQuery("OR", PhraseQuery("a"), PhraseQuery("b")),
        PhraseQuery("c")))
  }

  test("rejects malformed input") {
    Seq("a AND", "field:", "depth:[0 TO", "(a OR b", "\"unterminated").foreach { bad =>
      assertThrows[IllegalArgumentException](parse(bad))
    }
  }

  // bare words must not collide with grammar keywords (a phrase literally
  // spelled "or"/"not"/"to" is reserved — the reference grammar is the same)
  private val keywords = Set("and", "or", "not", "to")
  private val word: Gen[String] = (for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString).retryUntil(w => !keywords(w))

  private val genQuery: Gen[Query] = {
    val leaf: Gen[Query] = Gen.oneOf(
      word.map(PhraseQuery(_)),
      Gen.zip(word, word).map { case (f, v) => FieldValueQuery(f, v) },
      Gen.zip(word, word).map { case (f, v) => FieldWildcardQuery(f, v + "*") },
      Gen.zip(word, Gen.chooseNum(0, 50), Gen.chooseNum(51, 100)).map {
        case (f, lo, hi) => FieldRangeQuery(f, lo.toString, hi.toString)
      })
    def sized(depth: Int): Gen[Query] =
      if (depth <= 0) leaf
      else Gen.frequency(
        3 -> leaf,
        2 -> (for {
          op <- Gen.oneOf("AND", "OR")
          l <- sized(depth - 1); r <- sized(depth - 1)
        } yield BinaryOpQuery(op, l, r)),
        1 -> sized(depth - 1).map(UnaryOpQuery("NOT", _)))
    sized(3)
  }

  test("property: parse(print(ast)) == ast over 200 generated ASTs") {
    (0 until 200).foreach { i =>
      val q = genQuery.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(parse(QueryDsl.print(q)) == q, s"round-trip failed for: ${QueryDsl.print(q)}")
    }
  }

  test("compiled predicates match hand-built filters on documents") {
    val docs = Tables.documents(spark, sf)
    def n(dsl: String) = docs.filter(QueryDsl.predicate(docs, dsl, Seq("text"))).count()

    assert(n("scan") ==
      docs.filter(lower(col("text")).contains("scan")).count())
    assert(n("lang:en") == docs.filter(col("lang") === "en").count())
    assert(n("source:src1*") == docs.filter(col("source").like("src1%")).count())
    assert(n("n_chars:[100 TO 300]") ==
      docs.filter(col("n_chars").between(100, 300)).count())
    assert(n("lang:en AND NOT scan") ==
      docs.filter(col("lang") === "en" && !lower(col("text")).contains("scan")).count())
    assert(n("lang:de OR lang:fr") ==
      docs.filter(col("lang") === "de" || col("lang") === "fr").count())
    assert(n("-lang:zh") == docs.filter(col("lang") =!= "zh").count())
  }

  test("unknown field fails loudly") {
    val docs = Tables.documents(spark, sf)
    assertThrows[IllegalArgumentException](
      docs.filter(QueryDsl.predicate(docs, "nosuchfield:x", Seq("text"))).count())
  }

  test("phrase terms with backslashes/quotes and odd column names never re-enter the SQL parser") {
    import spark.implicits._
    // the r7 ADVICE hazard: expr()-string compilation mangled
    // backslashes ('a\b' became 'ab') and choked on non-identifier
    // column names; the Column-API compilation must treat both as data
    val df = Seq(
      (1L, """path a\b end"""),
      (2L, "it's quoted"),
      (3L, "plain row"),
      (4L, """double \\ back""")).toDF("id", "text col")
    def hits(q: Query): Seq[Long] =
      df.filter(QueryDsl.compile(q, df.schema, Seq("text col")))
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(hits(PhraseQuery("""a\b""")) == Seq(1L), "single backslash mangled")
    assert(hits(PhraseQuery("it's")) == Seq(2L), "embedded quote mangled")
    assert(hits(PhraseQuery("""\\""")) == Seq(4L), "double backslash mangled")
    // prefix wildcard on the same odd-named text column
    assert(hits(FieldWildcardQuery("text col", "plai*")) == Seq(3L))
  }
}
