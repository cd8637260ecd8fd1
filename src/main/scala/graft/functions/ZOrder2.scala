package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Z-order (Morton) interleave of the
  * low 10 bits of each input — bit i of `x` lands at output bit 2i,
  * bit i of `y` at 2i+1 (a 20-bit key).
  *
  * Semantics are identical to the unrolled 20-term shift/mask column
  * expression it replaces (see `Extras7.sortZorderKey`'s oracle, which
  * mirrors exactly that arithmetic), but the native form is one tight
  * codegen'd loop instead of a 20-node expression tree — constant
  * per-row cost that survives whole-stage codegen, which matters when
  * the key is computed for every row of a 100 TB table right before a
  * `repartitionByRange` layout write.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be (bigint, bigint), got $other")
    }

  override protected def nullSafeEval(xv: Any, yv: Any): Any = {
    val x = xv.asInstanceOf[Long]
    val y = yv.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < 10) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 10; $i++) {
         |  $z |= (($x >>> $i) & 1L) << (2 * $i);
         |  $z |= (($y >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  val name = "graft_zorder2"
  def register(s: SparkSession): Unit =
    Registration.once(s, name) {
      s.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[ZOrder2].getName, name),
        (children: Seq[Expression]) => ZOrder2(children(0), children(1)))
    }
}
