package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Karp–Rabin kernel: text → the polynomial rolling hash of
  * EVERY `win`-char window (mod 2⁶⁴ by natural overflow), position
  * order. O(1) per offset after the first window — the reason
  * every-offset substring mining is affordable at all: recomputing even
  * a cheap hash per offset is O(win) each, a 64× constant on the
  * corpus-dominating stage. Windows are CODE-POINT-based to stay
  * aligned with SQL `substr` semantics (both Spark and DuckDB count
  * code points, not UTF-16 units), so a downstream exact verify can
  * extract precisely the hashed span.
  *
  * The raw polynomial (base FNV-prime) is NOT collision-safe and not
  * avalanched — by design: consumers use it strictly as a GROUPING
  * prefilter and re-verify candidates on the span content (md5), so a
  * collision costs a wasted candidate, never a wrong answer.
  */
object RollingHashKernel {
  def compute(s: UTF8String, win: Int): ArrayData = {
    // code-point array, NOT String.charAt: SQL substr (Spark and
    // DuckDB both) counts code points, and charAt counts UTF-16 units —
    // one supplementary character (emoji, rare CJK) before a duplicated
    // region would shift every downstream position and break the
    // exact-verify alignment. ASCII corpora hit the same fast path
    // either way (one int per char).
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (win <= 0 || n < win) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - win + 1)
    val B = 0x100000001b3L
    var pw = 1L
    var e = 0
    while (e < win - 1) { pw *= B; e += 1 }
    var h = 0L
    var i = 0
    while (i < win) { h = h * B + cps(i); i += 1 }
    out(0) = h
    var k = 1
    while (k + win - 1 < n) {
      h = (h - cps(k - 1) * pw) * B + cps(k + win - 1)
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `RollingHash64(text, win)` → array of
  * the rolling hashes of every win-char window (see
  * [[RollingHashKernel]]); empty array when the text is shorter than
  * the window. Codegen emits one static kernel call per row — the
  * whole corpus scan stays inside whole-stage codegen.
  */
case class RollingHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arguments must be (string, int), got $other")
    }

  override protected def nullSafeEval(text: Any, win: Any): Any =
    RollingHashKernel.compute(
      text.asInstanceOf[UTF8String], win.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.RollingHashKernel.compute($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHash64 =
    copy(left = newLeft, right = newRight)
}
