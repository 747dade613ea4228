package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of a float embedding with a
  * double vector (typically a CONSTANT hyperplane — ConstantFolding
  * collapses an `array(lit...)` argument to a single Literal, so
  * generated code loads it once per task, not per row).
  *
  * Replaces the interpreted `aggregate(zip_with(...))` fold in the LSH
  * hyperplane signatures ([[graft.operators.VectorOps.lshNearDups]]),
  * where the hazard compounds: 32 sign bits × one interpreted fold
  * each per row. Arithmetic matches the fold exactly (left-to-right
  * double accumulation from 0.0, float promoted per element); length
  * mismatch truncates to the shorter side.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"requires (array<float>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductD.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductD.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def dotD(a: Column, b: Column): Column =
    Bridge.column(DotProductD(Bridge.expression(a), Bridge.expression(b)))

  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }
}
