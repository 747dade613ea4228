package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — tier (c) of the custom-operator ladder (SURVEY
  * §7.3): `size(regexp_extract_all(s, p, 0))` only needs the MATCH
  * COUNT, but evaluates by materializing every match into an array
  * (Spark's own `regexp_count` is RuntimeReplaceable sugar for exactly
  * that array form, so it is no escape). Rewrite to our codegen'd
  * [[RegexCountFast]], which walks the matcher and counts — the
  * token-statistics shape (q56) runs this once per document per
  * pattern, so at corpus scale the per-match allocations are pure
  * garbage-collector load.
  *
  * Only the `idx = 0` form is rewritten (group extraction changes what
  * is returned; counting is only equivalent for the full match), and
  * both sides use Spark's Java-regex semantics, so the rewrite is
  * exact — including null propagation (both are null-intolerant
  * binary expressions over the same children). Installed via
  * [[GraftExtensions]] (`injectOptimizerRule`);
  * `RewriteRegexCountSpec` asserts plan shape and result equality.
  */
object RewriteRegexCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false only: the legacy mode returns -1 for null
      // input where the counting form correctly yields null
      case Size(RegExpExtractAll(s, p, Literal(0, _)), false) =>
        RegexCountFast(s, p)
    }
}
