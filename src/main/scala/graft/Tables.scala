package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders and determinism helpers shared by every operator.
  *
  * Scale notes (100 TB design): every loader returns a bare parquet scan so
  * Catalyst predicate pushdown / column pruning reach the file source
  * unimpeded; nothing here materializes, caches, or collects. On a real
  * cluster these paths would be directories of many files — the code is
  * identical.
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events.parquet's ts is TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark reads natively as TIMESTAMP_NTZ — naive wall time,
    * exactly DuckDB's TIMESTAMP, so parquet dumps compare directly.
    * (Earlier generator builds wrote TIMESTAMP(NANOS) as INT64, which
    * needed the nanosAsLong conf plus an explicit ns→µs truncation
    * here; the current files need no conversion. This loader stays the
    * single adaptation point should the physical type change again.)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Exact-decimal arithmetic (SURVEY §2-B R2, hardened).
    *
    * MEASURED 2026-08-12: every double column in the testdata is an exact
    * 2-decimal value (max |x - round(x,2)| = 0.0 on all of lineitem,
    * orders, customer, supplier, part, events.value). Therefore casting a
    * source column to DECIMAL(14,2) is EXACT in both engines, and all
    * derived arithmetic stays in decimal where + - * are exact, so sums
    * are shuffle-order independent and bit-identical between Spark 4.1.2
    * and DuckDB 1.0.0.
    *
    * Do NOT cast a computed double product to decimal (the old R2
    * pattern): Spark rounds the exact binary expansion (BigDecimal) while
    * DuckDB scales in floating point, and near-boundary products diverge
    * (observed on sum_charge at sf0.001). Multiply decimals instead.
    */
  val M = DecimalType(14, 2) // exact image of any testdata money column
  val F = DecimalType(4, 2)  // small factor domain: discount/tax in [0, 1)

  /** Exact decimal image of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast(M)
  /** (1 - c) / (1 + c) as exact decimals, for discount/tax factors. */
  def oneMinus(c: Column): Column = lit(1).cast(F) - c.cast(F)
  def onePlus(c: Column): Column  = lit(1).cast(F) + c.cast(F)

  /** Deterministic double sum of a 2-decimal source column. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Deterministic double sum of an already-decimal expression. */
  def dsumx(c: Column): Column = sum(c).cast(DoubleType)
  /** Deterministic average: exact decimal sum / count, one final IEEE
    * double division (identical on both sides).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB fragments mirroring the same exact-decimal patterns. */
  def decSql(e: String): String      = s"CAST($e AS DECIMAL(14,2))"
  def oneMinusSql(e: String): String = s"(CAST(1 AS DECIMAL(4,2)) - CAST($e AS DECIMAL(4,2)))"
  def onePlusSql(e: String): String  = s"(CAST(1 AS DECIMAL(4,2)) + CAST($e AS DECIMAL(4,2)))"
  def dsumSql(e: String): String     = s"CAST(sum(${decSql(e)}) AS DOUBLE)"
  def dsumxSql(e: String): String    = s"CAST(sum($e) AS DOUBLE)"
  def davgSql(e: String): String     = s"(${dsumSql(e)} / count(*))"
}
