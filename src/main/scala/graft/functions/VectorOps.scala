package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float-array columns.
  *
  * The composable form (`zip_with` + `aggregate`) materializes an
  * intermediate array per row pair — fatal in similarity joins that
  * evaluate millions of pairs. This expression loops directly over the
  * two ArrayData buffers (no allocation) and stays inside whole-stage
  * codegen via a static call. Accumulation is left-to-right in index
  * order, bit-identical to the composable form and to the DuckDB oracle.
  */
object VectorOps {
  /** Static kernel shared by interpreted eval and generated code. */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** dot(a, b) as a Column over array<float> columns. */
  def dotf(a: Column, b: Column): Column =
    GraftShims.column(VectorDotExpression(GraftShims.expression(a), GraftShims.expression(b)))

  def normf(a: Column): Column = org.apache.spark.sql.functions.sqrt(dotf(a, a))
}

case class VectorDotExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two array<float> inputs, got ${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotFloat($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotExpression =
    copy(left = newLeft, right = newRight)
}
