package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: |A ∩ B| for two SORTED arrays, by merge
  * walk — the overlap-count kernel of the exact similarity joins
  * (q201/q209's verify stage evaluates it once per candidate pair).
  *
  * `size(array_intersect(a, b))` computes the same number but builds a
  * hash set AND materializes the intersection array per row, only to
  * take its length; the merge walk over pre-sorted inputs allocates
  * NOTHING and runs one comparison per element step, fully inside
  * whole-stage codegen. Sortedness is the caller's contract (the
  * similarity joins sort each document's shingle set once at build
  * time) — unsorted inputs produce an undercount, so callers own the
  * invariant, as with any merge join.
  *
  * Supports string and bigint element types (the shingle and id-set
  * cases). Null ELEMENTS are defined to never intersect (skipped by the
  * merge walk) — the function is registered session-wide as SQL
  * `sorted_intersect_count`, so arbitrary user arrays must not read
  * null slots as garbage. DuckDB oracle mirror:
  * length(list_intersect(a, b)) — counts agree because both inputs are
  * distinct sets.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("requires two sorted arrays of string or " +
            s"bigint, got (${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val str = elemType == StringType
    while (i < x.numElements() && j < y.numElements()) {
      // the function is registered session-wide as SQL
      // `sorted_intersect_count`, so a user can hand it
      // array('a', NULL, 'b'); null slots are DEFINED to never
      // intersect and are skipped rather than read as garbage
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp =
          if (str) x.getUTF8String(i).compareTo(y.getUTF8String(j))
          else java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cmp = elemType match {
      case StringType => (a: String, i: String, b: String, j: String) =>
        s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      case _ => (a: String, i: String, b: String, j: String) =>
        s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val k = ctx.freshName("cmp")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $k = ${cmp(a, i, b, j)};
         |    if ($k == 0) { $c++; $i++; $j++; }
         |    else if ($k < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.graftbridge.Bridge

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(
      SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
