package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guarded bounded-dimension broadcast: `df.limit(k)` on a frame
  * ASSUMED to have ≤ k rows silently drops an arbitrary subset the day
  * the assumption breaks (non-TPC-H nation/brand/quantity
  * cardinality), producing silent oracle divergence instead of an
  * error. `capped(df, k)` keeps the limit (so the plan still carries
  * the GlobalLimit bound the plan gate recognizes on broadcast sides)
  * but prefixes it with a lazy execution-time assertion that the FULL
  * frame fits the cap.
  *
  * The count is taken with a global window over the frame itself (one
  * task over ≤ k rows once the assertion holds — no second scan of the
  * corpus-scale subtree feeding the aggregate), and every emitted row
  * carries the full-partition count, so the assertion fires even if a
  * downstream limit stops pulling early. Plan-gate-legal: the window
  * sits above the frame's own aggregate.
  */
object BoundedDim {
  def capped(df: DataFrame, bound: Int, what: String): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(lit(0)))
    df.withColumn("_bd_n", n)
      .filter(assert_true(col("_bd_n") <= lit(bound.toLong),
        lit(s"bounded-dim '$what' exceeded its declared cap of $bound rows")).isNull)
      .drop("_bd_n")
      .limit(bound)
  }
}
