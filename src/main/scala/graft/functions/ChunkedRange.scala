package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed integer-range generation — the scale-safe replacement
  * for `explode(sequence(lo, hi))` when `hi - lo` is corpus-scale.
  *
  * `sequence(lo, hi)` materializes the WHOLE range as one in-memory
  * array inside a single task before Generate streams it: ~150k
  * elements at sf0.1 is fine, ~120 MB per array at 100×, and past the
  * JVM array-element limit it throws. Worse, every downstream row of
  * the range is produced by that one task — a serial generation point
  * even when the array fits (the r11 verdict finding on
  * `stat_fisher_exact` / `stat_median_ci_exact`, whose ln-factorial
  * spines span 0..|orders|).
  *
  * The fix is two-level generation: explode a bounded CHUNK INDEX
  * (⌈range/64k⌉ rows — a ~1.2 MB array even at range = 10^10), hash-
  * repartition the chunk rows across the cluster, then explode each
  * chunk's ≤64k-element sub-range in parallel. Peak per-task array is
  * 64k longs (~512 KB); generation parallelism is
  * min(#chunks, shuffle partitions); the emitted (row × i) set is
  * EXACTLY the single-array explode's, so downstream exact-integer
  * pipelines are bit-identical.
  *
  * Supported range length is ChunkSize × max-array ≈ 2^47 — far past
  * any per-row spine this engine generates (the spines are O(corpus)).
  */
object ChunkedRange {
  val ChunkSize = 65536L

  /** For each input row, append `iName` = lo, lo+1, …, hi (both ends
    * inclusive, evaluated per-row); rows with hi < lo emit nothing
    * (matching `explode` of an empty range, never a descending one).
    * All other columns pass through unchanged.
    */
  def explodeRange(df: DataFrame, lo: Column, hi: Column, iName: String): DataFrame =
    df.withColumn("_cr_lo", lo.cast("long"))
      .withColumn("_cr_hi", hi.cast("long"))
      .filter(col("_cr_hi") >= col("_cr_lo"))
      .withColumn("_cr_chk",
        explode(expr(s"sequence(0L, (_cr_hi - _cr_lo) DIV ${ChunkSize}L)")))
      .repartition(col("_cr_chk"), col("_cr_lo"))
      .withColumn(iName, explode(expr(
        s"""sequence(_cr_lo + _cr_chk * ${ChunkSize}L,
           |least(_cr_lo + _cr_chk * ${ChunkSize}L + ${ChunkSize - 1}L, _cr_hi))""".stripMargin)))
      .drop("_cr_lo", "_cr_hi", "_cr_chk")
}
