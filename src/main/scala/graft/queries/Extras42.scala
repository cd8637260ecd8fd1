package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Forty-second wave: native listagg, regex pre-tokenization, JSON
  * struct roundtrips, RANGE-peer frame semantics, and month-arithmetic
  * clamping.
  */
object Extras42 {

  /** agg_listagg_native — the NATIVE `listagg` aggregate (Spark 4,
    * SQL:2016): DISTINCT + WITHIN GROUP (ORDER BY …) ordered string
    * concatenation as one aggregate — what C25 composed from
    * collect_list/sort_array now exists as a first-class function
    * (and the DISTINCT form C102 needed collect_set for). Determinism
    * comes from the mandatory WITHIN GROUP ordering.
    */
  def aggListaggNative(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_lg_orders")
    s.sql(
      """SELECT o_orderpriority,
        |  listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)
        |    AS statuses,
        |  count(*) AS n
        |FROM g_lg_orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }
  val aggListaggNativeSql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** text_pretokenize_regex — GPT-2-style REGEX PRE-TOKENIZATION: the
    * split every BPE pipeline runs before merges (contractions, words,
    * numbers, punctuation runs — each optionally space-prefixed so
    * whitespace attaches to the following token). The alternation is
    * deliberately restricted to byte-class constructs that Java regex
    * and RE2 implement identically; pre-token counts sit beside the
    * whitespace count (B43's unit) showing exactly where the two
    * tokenizations diverge — punctuation-adjacent text.
    */
  def textPretokenizeRegex(s: SparkSession, d: String): DataFrame = {
    val pat = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
    documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(text, '${pat.replace("'", "\\'")}', 0)"))
          .cast("bigint").as("n_pretokens"))
      .orderBy("doc_id")
  }
  val textPretokenizeRegexSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text,
      |    '''[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_pretokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** json_struct_roundtrip — to_json ∘ from_json identity: a typed
    * struct serializes to a JSON string and parses back under an
    * explicit schema, with every field proven equal to its source —
    * the contract that lets JSON be the wire format between pipeline
    * stages. Parsing uses the SCHEMA'd path (from_json), not
    * per-field path extraction (B34) — one parse, typed output.
    */
  def jsonStructRoundtrip(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 8 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
          .as("j"))
      .select(col("o_orderkey"),
        from_json(col("j"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")).as("p"),
        col("o_orderstatus"), col("o_totalprice"))
      .select(col("o_orderkey"),
        col("p.o_orderstatus").as("parsed_status"),
        col("p.o_totalprice").as("parsed_price"),
        (col("p.o_orderkey") === col("o_orderkey") &&
          col("p.o_orderstatus") === col("o_orderstatus") &&
          col("p.o_totalprice") === col("o_totalprice")).as("roundtrip_ok"))
      .orderBy("o_orderkey")
  val jsonStructRoundtripSql: String =
    """SELECT o_orderkey, o_orderstatus AS parsed_status,
      |  o_totalprice AS parsed_price, CAST(1 AS BOOLEAN) AS roundtrip_ok
      |FROM orders WHERE o_orderkey % 8 = 0 ORDER BY o_orderkey""".stripMargin

  /** win_range_peers — RANGE vs ROWS at CURRENT ROW, the classic
    * frame-semantics trap: a RANGE frame's "current row" includes ALL
    * PEERS (every row sharing the order key — here, the same order
    * date), while a ROWS frame cuts mid-peer-group at the physical
    * row. The RANGE window orders by date alone (peers = same-date
    * orders); the ROWS window needs the full (date, key) total order
    * to be deterministic at all — which is itself the lesson: ROWS
    * frames over non-unique orderings are nondeterministic by
    * construction.
    */
  def winRangePeers(s: SparkSession, d: String): DataFrame = {
    val wRange = Window.partitionBy("o_orderpriority").orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wRows = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).filter(col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(wRange).cast("double").as("range_sum"),
        sum(dec(col("o_totalprice"))).over(wRows).cast("double").as("rows_sum"))
      .orderBy("o_orderkey")
  }
  val winRangePeersSql: String =
    """SELECT o_orderkey, o_orderpriority, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
      |    PARTITION BY o_orderpriority ORDER BY o_orderdate
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
      |    PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rows_sum
      |FROM orders WHERE o_orderkey % 16 = 0 ORDER BY o_orderkey""".stripMargin

  /** date_add_months_semantics — month arithmetic CLAMPS: Jan 31 + 1
    * month is Feb 29/28 (no day overflow into March), and the clamp
    * is NOT invertible (add_months(add_months(d, 1), -1) ≠ d for
    * month-end dates) — proven side by side on planted end-of-month
    * anchors. Both engines implement the SQL-standard clamp; pipelines
    * doing month-offset cohort math must know the non-invertibility.
    */
  def dateAddMonthsSemantics(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey"),
        last_day(col("o_orderdate")).cast("timestamp_ntz").as("eom"),
        add_months(last_day(col("o_orderdate")), 1).cast("timestamp_ntz").as("eom_plus1"),
        add_months(last_day(col("o_orderdate")), -2).cast("timestamp_ntz").as("eom_minus2"),
        add_months(add_months(last_day(col("o_orderdate")), 1), -1)
          .cast("timestamp_ntz").as("roundtrip"),
        (add_months(add_months(last_day(col("o_orderdate")), 1), -1) ===
          last_day(col("o_orderdate"))).as("invertible"))
      .orderBy("o_orderkey")
  val dateAddMonthsSemanticsSql: String =
    """SELECT o_orderkey,
      |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
      |  CAST(last_day(o_orderdate) + INTERVAL 1 MONTH AS TIMESTAMP) AS eom_plus1,
      |  CAST(last_day(o_orderdate) - INTERVAL 2 MONTH AS TIMESTAMP) AS eom_minus2,
      |  CAST(last_day(o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 MONTH AS TIMESTAMP)
      |    AS roundtrip,
      |  (last_day(o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 MONTH
      |    = last_day(o_orderdate)) AS invertible
      |FROM orders WHERE o_orderkey % 16 = 0 ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_listagg_native" -> (aggListaggNative _),
    "text_pretokenize_regex" -> (textPretokenizeRegex _),
    "json_struct_roundtrip" -> (jsonStructRoundtrip _),
    "win_range_peers" -> (winRangePeers _),
    "date_add_months_semantics" -> (dateAddMonthsSemantics _))

  val oracle: Map[String, String] = Map(
    "agg_listagg_native" -> aggListaggNativeSql,
    "text_pretokenize_regex" -> textPretokenizeRegexSql,
    "json_struct_roundtrip" -> jsonStructRoundtripSql,
    "win_range_peers" -> winRangePeersSql,
    "date_add_months_semantics" -> dateAddMonthsSemanticsSql)
}
