package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BANDED (bounded) Levenshtein distance —
  * the at-scale form of edit-distance joins.
  *
  * Spark's builtin `levenshtein` fills the full O(|a|·|b|) DP matrix
  * per pair; a fuzzy join only ever ASKS "is the distance ≤ k" with
  * k = 1–3, and the Ukkonen band answers that in O(k·min(|a|,|b|))
  * with two early exits: a length-difference gate before any DP, and
  * a whole-row-saturated bail mid-DP (once every band cell is > k no
  * later row can come back down — DP values are non-decreasing along
  * diagonals). Returns the exact distance when ≤ k and k+1 otherwise,
  * so `lev_bounded(a, b, k) <= k` is EXACTLY `levenshtein(a, b) <= k`
  * (the oracle states the builtin form; `BoundedLevenshteinSpec`
  * cross-checks the full matrix on randomized pairs). Custom-operator
  * ladder tier (b): codegen'd scalar, no UDF boxing on the blocked
  * candidate-pair hot path (q323).
  */
case class BoundedLevenshteinExpr(left: Expression, right: Expression,
    bound: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_bounded"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType
        && bound >= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires (string, string) and bound >= 0, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, " +
        s"$bound)")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BoundedLevenshtein.distance($a, $b, $bound)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point (bound is a plan-time constant). */
  def levBounded(a: Column, b: Column, bound: Int): Column =
    Bridge.column(BoundedLevenshteinExpr(
      Bridge.expression(a), Bridge.expression(b), bound))

  /** Called from both interpreted eval and generated code. UTF-16
    * char-wise, matching Spark's builtin `levenshtein` (and DuckDB's,
    * for the ASCII identifiers the fuzzy joins target). */
  def distance(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    val inf = k + 1
    if (math.abs(n - m) > k) return inf
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val j0 = math.max(1, i - k)
      val j1 = math.min(m, i + k)
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      var rowMin = cur(0)
      j = j0
      while (j <= j1) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf // band saturated: no way back down
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }
}
