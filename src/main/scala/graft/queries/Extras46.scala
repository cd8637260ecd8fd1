package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Forty-sixth wave: Datasketches HLL, AES roundtrips, the hash
  * battery, display formatting, and array editing.
  */
object Extras46 {

  /** agg_hll_sketch_family — the DATASKETCHES HLL functions (Spark
    * 3.5+, distinct from approx_count_distinct's internal HLL++):
    * `hll_sketch_agg` builds a PORTABLE binary sketch per group,
    * `hll_union_agg` merges the per-group sketches into the grand
    * total, `hll_sketch_estimate` reads both out — the
    * interchange-format sketch a warehouse stores in rollup tables so
    * ANY engine (the Java/C++ datasketches libraries share the wire
    * format) can keep merging. The counted key is a 100-ary cohort
    * (user_id % 100), bounded at EVERY scale factor so the sketch
    * stays in exact (sparse) mode and the estimates carry a REAL
    * count-distinct oracle — the C131/C215 exact-at-fixture contract
    * (raw user_id leaves sparse mode at sf0.1's 1500 users: measured
    * estimate 1488 vs 1500 — the expected ~1% HLL error, which is
    * precisely when the oracle must move to bounds, as B18/C73 do).
    */
  def aggHllSketchFamily(s: SparkSession, d: String): DataFrame = {
    val perType = events(s, d)
      .groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id % 100)").as("sk"))
    val est = perType.select(col("event_type"),
      expr("hll_sketch_estimate(sk)").cast("bigint").as("n_users"))
    val total = perType.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").cast("bigint").as("n_users_total"))
    est.crossJoin(total).orderBy("event_type")
  }
  val aggHllSketchFamilySql: String =
    """SELECT event_type, count(DISTINCT user_id % 100) AS n_users,
      |  (SELECT count(DISTINCT user_id % 100) FROM events) AS n_users_total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** str_aes_roundtrip — `aes_encrypt`/`aes_decrypt` (ECB mode: no
    * random IV, so ciphertext and roundtrip are DETERMINISTIC —
    * exactly why production uses GCM and this exhibit must not):
    * column-level encryption for PII columns at rest, proven by
    * decrypt∘encrypt identity plus the ciphertext length contract
    * (PKCS padding to the 16-byte block). The oracle carries the
    * plaintext truths — an independent engine without the key cannot
    * read the ciphertext, which is the product requirement.
    */
  def strAesRoundtrip(s: SparkSession, d: String): DataFrame = {
    val key = "0123456789abcdef" // 16-byte demo key
    customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        expr(s"aes_encrypt(c_name, '$key', 'ECB')").as("ct"))
      .select(col("c_custkey"),
        expr(s"CAST(aes_decrypt(ct, '$key', 'ECB') AS STRING)").as("decrypted"),
        (expr(s"CAST(aes_decrypt(ct, '$key', 'ECB') AS STRING)") === col("c_name"))
          .as("roundtrip_ok"),
        (length(col("ct")) % 16 === 0 && length(col("ct")) > length(col("c_name")))
          .as("block_padded"))
      .orderBy("c_custkey")
  }
  val strAesRoundtripSql: String =
    """SELECT c_custkey, c_name AS decrypted,
      |  CAST(1 AS BOOLEAN) AS roundtrip_ok, CAST(1 AS BOOLEAN) AS block_padded
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** hash_funcs — the content-hash battery beside B40's md5:
    * sha2-256 (the integrity/fingerprint standard — both engines
    * produce the identical lowercase hex), plus digest length
    * contracts. xxhash64/crc32 exist in Spark but have no independent
    * twin in the oracle engine, so the graded columns stay on the
    * cross-implementable pair — same bar as every no-oracle exclusion.
    */
  def hashFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        sha2(col("text"), 256).as("sha256_hex"),
        md5(col("text")).as("md5_hex"),
        length(sha2(col("text"), 256)).cast("bigint").as("sha_len"))
      .orderBy("doc_id")
  val hashFuncsSql: String =
    """SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex,
      |  CAST(64 AS BIGINT) AS sha_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** str_format_number — DISPLAY formatting: thousands-grouped
    * integers (format_number) and fixed-decimal strings
    * (format_string's %.2f). Inputs are measured-exact 2-decimal
    * values, so no formatting call ever sits on a rounding boundary
    * (where Java's HALF_UP and C's round-half-even would part ways) —
    * the determinism note is the exhibit.
    */
  def strFormatNumber(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 8 === 0)
      .select(col("o_orderkey"),
        format_number(col("o_orderkey") * 1000, 0).as("key_grouped"),
        format_string("%.2f", col("o_totalprice")).as("price_2dp"))
      .orderBy("o_orderkey")
  val strFormatNumberSql: String =
    """SELECT o_orderkey,
      |  format('{:,}', o_orderkey * 1000) AS key_grouped,
      |  printf('%.2f', o_totalprice) AS price_2dp
      |FROM orders WHERE o_orderkey % 8 = 0 ORDER BY o_orderkey""".stripMargin

  /** array_edit_funcs — positional ARRAY EDITING (Spark 3.4+):
    * array_insert (1-based, negative-from-end), array_remove (by
    * value), array_position (first index or 0), array_compact (strip
    * nulls). The oracle rebuilds each edit from slicing primitives —
    * independent formulations of the same positional semantics.
    */
  def arrayEditFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey"),
        expr("array(o_orderkey, o_orderkey + 1, o_orderkey + 2, o_orderkey + 1)").as("a"))
      .select(col("o_orderkey"),
        concat_ws(",", expr("array_insert(a, 2, -1L)")).as("inserted"),
        concat_ws(",", expr("array_remove(a, o_orderkey + 1)")).as("removed"),
        expr("array_position(a, o_orderkey + 2)").cast("bigint").as("pos_of_plus2"),
        concat_ws(",", expr("array_compact(array(o_orderkey, NULL, o_orderkey + 2, NULL))"))
          .as("compacted"))
      .orderBy("o_orderkey")
  val arrayEditFuncsSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |    [o_orderkey, o_orderkey + 1, o_orderkey + 2, o_orderkey + 1] AS a
      |  FROM orders WHERE o_orderkey % 40 = 0)
      |SELECT o_orderkey,
      |  array_to_string(list_concat(a[1:1], list_concat([-1], a[2:4])), ',') AS inserted,
      |  array_to_string(list_filter(a, x -> x <> o_orderkey + 1), ',') AS removed,
      |  CAST(list_position(a, o_orderkey + 2) AS BIGINT) AS pos_of_plus2,
      |  array_to_string(list_filter([o_orderkey, NULL, o_orderkey + 2, NULL],
      |    x -> x IS NOT NULL), ',') AS compacted
      |FROM t ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_hll_sketch_family" -> (aggHllSketchFamily _),
    "str_aes_roundtrip" -> (strAesRoundtrip _),
    "hash_funcs" -> (hashFuncs _),
    "str_format_number" -> (strFormatNumber _),
    "array_edit_funcs" -> (arrayEditFuncs _))

  val oracle: Map[String, String] = Map(
    "agg_hll_sketch_family" -> aggHllSketchFamilySql,
    "str_aes_roundtrip" -> strAesRoundtripSql,
    "hash_funcs" -> hashFuncsSql,
    "str_format_number" -> strFormatNumberSql,
    "array_edit_funcs" -> arrayEditFuncsSql)
}
