package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler string similarity.
  *
  * Spark has `levenshtein` but no Jaro-Winkler; it's the standard
  * second distance for entity resolution (short strings, typo-heavy,
  * prefix-weighted). Custom-operator ladder tier (b) (SURVEY §7.3): a
  * codegen'd scalar `Expression` that inlines into whole-stage codegen
  * — no UDF boxing on the blocked-pairs hot path (q87), where it runs
  * once per candidate pair.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the
  * oracle), verified bit-exact on 3k+ adversarial cases:
  * empty-on-either-side → 0.0; Jaro match window `max(l1,l2)/2 - 1`;
  * Winkler prefix boost (scale 0.1, prefix ≤ 4) applied only when the
  * Jaro score exceeds 0.7. Both engines then evaluate the identical
  * IEEE op sequence, so results agree bit-for-bit and survive the
  * exact hash gate (through `Portable.val6` at the output edge).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(
      JaroWinklerSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** SQL registration: `SELECT jaro_winkler(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerTemp(spark, "jaro_winkler",
      exprs => JaroWinklerSimilarity(exprs(0), exprs(1)))

  /** Called from both interpreted eval and generated code. Works on
    * UTF-16 chars; identical to byte-wise for the ASCII identifiers
    * this targets (and still well-defined beyond). */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
