package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * signatures (`Long.bitCount(a ^ b)`).
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY §7.3):
  * a scalar the built-in function set lacks, implemented as a codegen'd
  * `Expression` rather than a Scala UDF — it inlines into whole-stage
  * codegen (no boxing, no closure dispatch), which matters because
  * SimHash pair pruning evaluates it once per candidate pair.
  * DuckDB mirror for the oracle: `bit_count(xor(a, b))`.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def hamming(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration: `SELECT hamming(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerTemp(spark, "hamming",
      exprs => HammingDistance(exprs(0), exprs(1)))
}
