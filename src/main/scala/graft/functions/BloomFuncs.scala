package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface over Spark's built-in bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same
  * expressions Catalyst's runtime row-level filtering injects, exposed
  * here for EXPLICIT semi-join pruning).
  *
  * Scale rationale (SURVEY §2.3 J1/J4 at 100 TB): a fact⋈dim semi join
  * normally shuffles every fact row to the join exchange. Aggregating
  * the dim keys into a ~MB bloom filter (one row, broadcast as a scalar
  * subquery) and filtering the fact scan with `bloom_might_contain`
  * drops non-qualifying rows BEFORE the exchange — the shuffle then
  * carries only candidate rows (false-positive rate ε), and the exact
  * join afterwards removes the false positives. This is the manual form
  * of Spark's `spark.sql.optimizer.runtime.bloomFilter.enabled`
  * rewrite, usable when the filter side is a pre-computed key set the
  * optimizer can't see through (e.g. a curated dim snapshot).
  */
object BloomFuncs {

  private[functions] def bloomAggBuilder(exprs: Seq[Expression]): Expression = (exprs match {
    case Seq(c)       => new BloomFilterAggregate(c)
    case Seq(c, n)    => new BloomFilterAggregate(c, n)
    case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
    case _ => throw new IllegalArgumentException(
      "bloom_agg(key[, estimatedItems[, numBits]])")
  }).toAggregateExpression()

  /** Registers `bloom_agg` and `bloom_might_contain` in the session.
    * The membership probe requires the bloom argument to be foldable or
    * a scalar subquery — use `(SELECT bloom_agg(k) FROM dim)` inline. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerTemp(spark, "bloom_agg", bloomAggBuilder)
    Bridge.registerTemp(spark, "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))
  }
}
