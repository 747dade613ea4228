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

  /** Decode a UTF8String's raw bytes into code points (one int per
    * Unicode character, surrogate-free) without materializing a
    * java.lang.String — `numChars` gives the exact length, so one
    * allocation + one linear byte walk per side per call. */
  private def codePoints(u: UTF8String): Array[Int] = {
    val out = new Array[Int](u.numChars())
    val bytes = u.getBytes
    var i = 0
    var p = 0
    while (p < bytes.length) {
      val len = UTF8String.numBytesForFirstByte(bytes(p))
      out(i) = len match {
        case 1 => bytes(p) & 0x7f
        case 2 => ((bytes(p) & 0x1f) << 6) | (bytes(p + 1) & 0x3f)
        case 3 => ((bytes(p) & 0x0f) << 12) |
          ((bytes(p + 1) & 0x3f) << 6) | (bytes(p + 2) & 0x3f)
        case _ => ((bytes(p) & 0x07) << 18) |
          ((bytes(p + 1) & 0x3f) << 12) |
          ((bytes(p + 2) & 0x3f) << 6) | (bytes(p + 3) & 0x3f)
      }
      i += 1
      p += len
    }
    out
  }

  /** Called from both interpreted eval and generated code. CODE-POINT
    *-wise — matching Spark's builtin `levenshtein` (UTF8String
    * .levenshteinDistance walks UTF-8 characters) for ALL inputs,
    * surrogate pairs included, so the identity
    * `lev_bounded(a, b, k) <= k  ⇔  levenshtein(a, b) <= k` holds
    * unconditionally against the Spark builtin. (DuckDB's levenshtein
    * is BYTE-wise — 'é'→2 edits — so the DuckDB oracle identity holds
    * exactly on ASCII, which is all q323's part names contain; neither
    * engine's semantics can be matched by the other off-ASCII.)
    * Per row only the band cells are touched: the
    * row buffers start at `inf` once, and each row re-infs just the
    * two FRINGE cells the band exposes as it slides right (cur(j0−1),
    * read as the insertion source this row, and cur(j1+1), read as
    * prev(j1) by the next row) — the real cost is O(k·min(n, m)) work
    * as the band promises, not an O(m) fill per row. */
  def distance(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val inf = k + 1
    val n = ua.numChars()
    val m = ub.numChars()
    if (math.abs(n - m) > k) return inf
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    val a = codePoints(ua)
    val b = codePoints(ub)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    java.util.Arrays.fill(cur, inf) // once; rows maintain the fringes
    var i = 1
    while (i <= n) {
      val j0 = math.max(1, i - k)
      val j1 = math.min(m, i + k)
      cur(0) = if (i <= k) i else inf
      if (j0 > 1) cur(j0 - 1) = inf // stale band cell from row i-2
      var rowMin = cur(0)
      j = j0
      while (j <= j1) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
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
      if (j1 < m) cur(j1 + 1) = inf // next row reads this as prev(j1+1)
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }
}
