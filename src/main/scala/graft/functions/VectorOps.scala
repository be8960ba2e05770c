package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-vector dot product as a codegen-participating Catalyst
  * expression.
  *
  * The higher-order-function route (`aggregate(zip_with(...))`) allocates a
  * lambda-evaluated intermediate array per row and, with DECIMAL math, a
  * BigDecimal per element — ~300× slower than this tight primitive loop
  * over the UnsafeArrayData. Used as the cheap prefilter in similarity /
  * embedding-dedup pipelines: candidate pairs are cut down with this in
  * double precision, then the survivors are re-scored with exact DECIMAL
  * arithmetic for engine-exact output (see Dedup.dotDec).
  */
case class FloatVecDot(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    FloatVecDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.FloatVecDot.dot($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object FloatVecDot {
  /** Sequential-order double accumulation — deterministic per pair. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def float_vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
