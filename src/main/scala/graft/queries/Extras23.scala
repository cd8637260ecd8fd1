package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Twenty-third wave: binary-encoding and timestamp parse/format
  * batteries — each with a DuckDB oracle.
  */
object Extras23 {

  /** str_binary_funcs — the binary-encoding battery: UTF-8 encode →
    * base64 / hex, the decode round trip, and byte lengths. These are
    * the wire formats every ingest/export boundary crosses (blobs in
    * JSON, checksum hex, attachment payloads); the round-trip column
    * proves encode∘decode is the identity on real corpus text, not
    * just ASCII toys. All row-local codegen'd work.
    */
  def strBinaryFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
      .select(
        col("doc_id"),
        base64(col("t").cast("binary")).as("b64"),
        lower(hex(col("t").cast("binary"))).as("hex"),
        octet_length(col("t").cast("binary")).cast("long").as("n_bytes"),
        (unbase64(base64(col("t").cast("binary"))).cast("string") === col("t"))
          .as("roundtrip_ok"))
      .orderBy("doc_id")
  val strBinaryFuncsSql: String =
    """SELECT doc_id,
      |  base64(encode(substring(text, 1, 24))) AS b64,
      |  lower(hex(encode(substring(text, 1, 24)))) AS hex,
      |  CAST(octet_length(encode(substring(text, 1, 24))) AS BIGINT) AS n_bytes,
      |  decode(from_base64(base64(encode(substring(text, 1, 24)))))
      |    = substring(text, 1, 24) AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** date_parse_funcs — timestamp parse/format round trip across the
    * two engines' DIFFERENT pattern languages (Spark's JDK patterns vs
    * strptime directives — the classic ingest portability trap, pinned
    * here by construction): timestamps are formatted to strings with
    * one pattern, parsed back with the same, and reformatted into a
    * second layout. Equality of the parsed timestamp and of the final
    * string proves both engines agree on the round trip even though
    * their pattern syntaxes share nothing.
    */
  def dateParseFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"))
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("iso"),
        to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss")
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("reparsed"),
        date_format(col("o_orderdate"), "dd/MM/yyyy").as("euro"))
      .orderBy("o_orderkey")
  val dateParseFuncsSql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
      |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
      |    '%Y-%m-%d %H:%M:%S') AS reparsed,
      |  strftime(o_orderdate, '%d/%m/%Y') AS euro
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_binary_funcs" -> (strBinaryFuncs _),
    "date_parse_funcs" -> (dateParseFuncs _),
  )

  val oracle: Map[String, String] = Map(
    "str_binary_funcs" -> strBinaryFuncsSql,
    "date_parse_funcs" -> dateParseFuncsSql,
  )
}
