package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count regex matches WITHOUT materializing them. Spark's own
  * `regexp_count` is `RuntimeReplaceable` sugar for
  * `size(regexp_extract_all(...))` — it builds an ArrayData of every
  * match (each a copied UTF8String) just to take its length. This
  * expression walks `Matcher.find()` and counts; per-document-per-
  * pattern in the token-statistics shape (q56) that removes all
  * per-match allocation. Installed by [[RewriteRegexCount]].
  */
case class RegexCountFast(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "regex_count_fast"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(s: Any, p: Any): Any =
    RegexCountFast.count(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"graft.functions.RegexCountFast.count($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexCountFast =
    copy(left = newLeft, right = newRight)
}

object RegexCountFast {
  // patterns are almost always literals → a 1-entry per-thread cache
  // makes compile-once the steady state without any shared-state locking
  private val lastPattern = new ThreadLocal[(String, Pattern)]

  /** Called from both interpreted eval and generated code. */
  def count(subject: UTF8String, regex: UTF8String): Int = {
    val p = regex.toString
    var cached = lastPattern.get()
    if (cached == null || cached._1 != p) {
      cached = (p, Pattern.compile(p))
      lastPattern.set(cached)
    }
    val m = cached._2.matcher(subject.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
