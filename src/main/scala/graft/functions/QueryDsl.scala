package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType, StructType}

/** The reference's search-DSL frontend (SURVEY.md §2-A A3–A7, §2-B B50),
  * re-expressed Spark-first: a Lucene-like query string is parsed by a
  * hand-written recursive-descent parser into a small AST and compiled
  * to a Catalyst `Column` predicate tree.
  *
  * In the reference (UPSTREAM ocdb/core/query/parser.py + query.py,
  * ocdb/db/mongo_db_driver.py :: QueryConverter) the same grammar
  * compiles to a MongoDB filter document executed next to Mongo's
  * indexes. Here the compile target is Catalyst: the resulting
  * predicate participates in pushdown/pruning like any hand-written
  * filter, so DSL filters reach the parquet scan for free — steps 3–4
  * of the reference's query lifecycle become a frontend to Catalyst
  * (SURVEY.md §3.2).
  *
  * Grammar (case-insensitive keywords):
  * {{{
  *   expr    := orExpr
  *   orExpr  := andExpr (OR andExpr)*
  *   andExpr := unary (AND unary)*
  *   unary   := NOT unary | '+' unary | '-' unary | primary
  *   primary := '(' expr ')'
  *            | field ':' '[' lit TO lit ']'     -- range (inclusive)
  *            | field ':' value                  -- equality; * ? wildcards
  *            | term | "quoted phrase"           -- free-text contains
  * }}}
  * `+t` is a MUST (identity), `-t` a MUST_NOT (negation), matching the
  * reference's unary operator semantics.
  */
object QueryDsl {

  // ------------------------------------------------------------------ AST
  sealed trait Query
  final case class PhraseQuery(phrase: String) extends Query
  final case class FieldValueQuery(field: String, value: String) extends Query
  final case class FieldWildcardQuery(field: String, pattern: String) extends Query
  final case class FieldRangeQuery(field: String, lo: String, hi: String) extends Query
  final case class BinaryOpQuery(op: String, left: Query, right: Query) extends Query
  final case class UnaryOpQuery(op: String, child: Query) extends Query

  /** Round-trip printer (parse ∘ print = id up to parens; used by the
    * property tests).
    */
  def print(q: Query): String = q match {
    case PhraseQuery(p) => if (p.exists(_.isWhitespace)) s""""$p"""" else p
    case FieldValueQuery(f, v) => s"$f:$v"
    case FieldWildcardQuery(f, p) => s"$f:$p"
    case FieldRangeQuery(f, lo, hi) => s"$f:[$lo TO $hi]"
    case BinaryOpQuery(op, l, r) => s"(${print(l)} $op ${print(r)})"
    case UnaryOpQuery("NOT", c) => s"NOT ${print(c)}"
    case UnaryOpQuery(op, c) => s"$op${print(c)}"
  }

  // ------------------------------------------------------------ tokenizer
  private sealed trait Tok
  private case class Word(s: String) extends Tok
  private case class Quoted(s: String) extends Tok
  private case class Sym(c: Char) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if ("()[]:+-".contains(c)) { toks += Sym(c); i += 1 }
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        if (end < 0) throw new IllegalArgumentException(s"unterminated quote at $i in: $s")
        toks += Quoted(s.substring(i + 1, end)); i = end + 1
      } else {
        val start = i
        while (i < s.length && !s(i).isWhitespace && !"()[]:\"".contains(s(i))) i += 1
        toks += Word(s.substring(start, i))
      }
    }
    toks.toList
  }

  // --------------------------------------------------------------- parser
  def parse(input: String): Query = {
    var toks = tokenize(input)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = {
      if (toks.isEmpty) throw new IllegalArgumentException(s"unexpected end of input in: $input")
      val t = toks.head; toks = toks.tail; t
    }
    def expect(c: Char): Unit = next() match {
      case Sym(`c`) => ()
      case t => throw new IllegalArgumentException(s"expected '$c', got $t in: $input")
    }
    def isKw(t: Tok, kw: String): Boolean = t match {
      case Word(w) => w.equalsIgnoreCase(kw)
      case _ => false
    }

    def orExpr(): Query = {
      var l = andExpr()
      while (peek.exists(isKw(_, "OR"))) { next(); l = BinaryOpQuery("OR", l, andExpr()) }
      l
    }
    def andExpr(): Query = {
      var l = unary()
      while (peek.exists(isKw(_, "AND"))) { next(); l = BinaryOpQuery("AND", l, unary()) }
      l
    }
    def unary(): Query = peek match {
      case Some(t) if isKw(t, "NOT") => next(); UnaryOpQuery("NOT", unary())
      case Some(Sym('+')) => next(); UnaryOpQuery("+", unary())
      case Some(Sym('-')) => next(); UnaryOpQuery("-", unary())
      case _ => primary()
    }
    // a range bound or value may itself tokenize as Word/Sym('-')Word etc.
    def lit(): String = {
      val sb = new StringBuilder
      var done = false
      while (!done) peek match {
        case Some(Word(w)) if !w.equalsIgnoreCase("TO") => sb.append(w); next()
        case Some(Sym('-')) if sb.isEmpty => sb.append('-'); next()
        case _ => done = true
      }
      if (sb.isEmpty) throw new IllegalArgumentException(s"expected literal in: $input")
      sb.toString
    }
    def primary(): Query = next() match {
      case Sym('(') => val e = orExpr(); expect(')'); e
      case Quoted(p) => PhraseQuery(p)
      case Word(w) if peek.contains(Sym(':')) =>
        next() // ':'
        peek match {
          case Some(Sym('[')) =>
            next()
            val lo = lit()
            if (!peek.exists(isKw(_, "TO"))) throw new IllegalArgumentException(s"expected TO in range in: $input")
            next()
            val hi = lit()
            expect(']')
            FieldRangeQuery(w, lo, hi)
          case Some(Word(v)) =>
            next()
            if (v.contains('*') || v.contains('?')) FieldWildcardQuery(w, v)
            else FieldValueQuery(w, v)
          case Some(Quoted(v)) => next(); FieldValueQuery(w, v)
          case t => throw new IllegalArgumentException(s"expected value after '$w:', got $t in: $input")
        }
      case Word(w) => PhraseQuery(w)
      case t => throw new IllegalArgumentException(s"unexpected token $t in: $input")
    }

    val q = orExpr()
    if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens $toks in: $input")
    q
  }

  // ------------------------------------------------------------- compiler
  /** Escape SQL LIKE metacharacters, then map DSL wildcards * ? → % _. */
  private def likePattern(dslPattern: String, contains: Boolean): String = {
    val esc = dslPattern.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    val p = esc.replace('*', '%').replace('?', '_')
    if (contains) s"%$p%" else p
  }

  /** Compile an AST to a Column predicate over `schema`.
    *
    * @param schema      the frame's schema — field names resolve against
    *                    it; numeric fields get numeric equality/ranges
    * @param textColumns free-text phrase terms search these columns
    *                    (lowercased contains, OR across columns)
    */
  def compile(q: Query, schema: StructType, textColumns: Seq[String]): Column = {
    val numeric: Set[String] =
      schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSet
    val integral: Set[String] = schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType) => f.name
    }.toSet
    def field(name: String): Column = {
      require(schema.fieldNames.contains(name), s"unknown field '$name' (have: ${schema.fieldNames.mkString(",")})")
      col(name)
    }
    /** Numeric literal for field `f`: integral fields compare against
      * long literals (no silent double coercion); a non-numeric value
      * against a numeric field is a query error reported with context,
      * like every other parse/compile failure — not a bare
      * NumberFormatException.
      */
    def numLit(f: String, v: String): Column =
      try {
        if (integral(f) && !v.contains('.') && !v.contains('e') && !v.contains('E')) lit(v.toLong)
        else lit(v.toDouble)
      } catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"non-numeric value '$v' for numeric field '$f'")
      }
    def go(q: Query): Column = q match {
      case PhraseQuery(p) =>
        // compile to graft_text_search (identical case-insensitive
        // contains semantics, native codegen'd expression) rather than
        // lower(col).contains: when the session has an inverted index
        // enabled, TextIndexSearchRule rewrites the conjunct into an
        // index semi-join — the DSL front door's hottest predicate then
        // never scans the text bytes. Built as a Catalyst expression
        // directly (not an expr() SQL string): a term containing
        // backslashes/quotes or a non-identifier column name must never
        // re-enter the SQL parser, where escaping rules differ.
        textColumns.map(c =>
          org.apache.spark.sql.graftbridge.Bridge.column(
            graft.plans.GraftTextSearch(
              org.apache.spark.sql.graftbridge.Bridge.expression(col(c)),
              org.apache.spark.sql.catalyst.expressions.Literal(p))))
          .reduce(_ || _)
      case FieldValueQuery(f, v) =>
        if (numeric(f)) field(f) === numLit(f, v) else field(f) === lit(v)
      case FieldWildcardQuery(f, p) =>
        // Lucene wildcard semantics: wildcards match TERMS. A keyword
        // field's whole value is one term → whole-field LIKE. A TEXT
        // column is tokenized → token-level match, the same semantics
        // as C291's graft_token_prefix — a pure prefix pattern compiles
        // to that very expression so TextIndexSearchRule can rewrite
        // the front door onto the inverted index (register via
        // [[predicate]] / TextIndex.registerFunction).
        if (textColumns.contains(f)) {
          field(f) // still validates the field exists
          val purePrefix = "^([^*?\\s']+)\\*$".r
          p match {
            case purePrefix(pre) =>
              // direct expression construction, same rationale as
              // PhraseQuery: no SQL-string round trip
              org.apache.spark.sql.graftbridge.Bridge.column(
                graft.plans.GraftTokenPrefix(
                  org.apache.spark.sql.graftbridge.Bridge.expression(field(f)),
                  org.apache.spark.sql.catalyst.expressions.Literal(pre)))
            case _ =>
              exists(split(lower(field(f)), " "),
                t => t.like(likePattern(p.toLowerCase(java.util.Locale.ROOT),
                  contains = false)))
          }
        } else field(f).like(likePattern(p, contains = false))
      case FieldRangeQuery(f, lo, hi) =>
        if (numeric(f)) field(f).between(numLit(f, lo), numLit(f, hi))
        else field(f).between(lit(lo), lit(hi))
      case BinaryOpQuery("AND", l, r) => go(l) && go(r)
      case BinaryOpQuery("OR", l, r) => go(l) || go(r)
      case BinaryOpQuery(op, _, _) => throw new IllegalArgumentException(s"unknown op $op")
      case UnaryOpQuery("NOT", c) => !go(c)
      case UnaryOpQuery("+", c) => go(c)
      case UnaryOpQuery("-", c) => !go(c)
      case UnaryOpQuery(op, _) => throw new IllegalArgumentException(s"unknown unary $op")
    }
    go(q)
  }

  /** One-call convenience: parse + compile against a DataFrame. Also
    * registers the text-index expressions on the frame's session so a
    * text-column prefix wildcard (compiled to `graft_token_prefix`)
    * resolves whether or not an index is enabled.
    */
  def predicate(df: DataFrame, dsl: String, textColumns: Seq[String]): Column = {
    graft.plans.TextIndex.registerFunction(df.sparkSession)
    compile(parse(dsl), df.schema, textColumns)
  }
}
