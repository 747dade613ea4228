package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer for graft's custom Catalyst functions —
  * the deployment-grade registration path (SURVEY §7.3 tier (c)
  * machinery): `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) makes `hamming` and
  * `kmv_distinct` available in EVERY session of the application,
  * including pure-SQL contexts (thriftserver, SQL files), without
  * per-session `register` calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      info("hamming", "hamming(a, b) - bit distance between two int64 signatures"),
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(hash) - KMV distinct-count sketch over portable32 hashes"),
      (exprs: Seq[Expression]) => KmvDistinct(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(key[, estItems[, numBits]]) - bloom-filter sketch of a key set"),
      (exprs: Seq[Expression]) => BloomFuncs.bloomAggBuilder(exprs)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain", "bloom_might_contain(bloom, key) - probabilistic membership probe"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - fused one-pass cosine over float arrays"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      info("dot_d", "dot_d(a_float_arr, b_double_arr) - codegen'd left-fold dot product"),
      (exprs: Seq[Expression]) => DotProductD(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-pinned semantics)"),
      (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("lev_bounded"),
      info("lev_bounded",
        "lev_bounded(a, b, k) - banded Levenshtein: exact distance if <= k, else k+1"),
      (exprs: Seq[Expression]) => {
        // arity first (exprs(i) on a short list would throw an opaque
        // IndexOutOfBounds instead of an analysis-time message), then
        // accept ANY foldable integral bound — a bare literal, a cast
        // (CAST(2 AS INT)), or a bigint literal 2L — by folding it at
        // plan time; the band width must be a plan-time constant
        // because it is baked into the generated code.
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"lev_bounded(a, b, k) takes exactly 3 arguments, " +
              s"got ${exprs.length}")
        import org.apache.spark.sql.types.{ByteType, IntegerType,
          LongType, ShortType}
        val isIntegral = (dt: org.apache.spark.sql.types.DataType) =>
          dt == ByteType || dt == ShortType || dt == IntegerType ||
            dt == LongType
        val bound = exprs(2) match {
          case e if e.foldable && isIntegral(e.dataType) =>
            e.eval() match {
              case null => throw new IllegalArgumentException(
                "lev_bounded bound must not be null")
              case i: java.lang.Integer => i.intValue()
              case l: java.lang.Long =>
                if (l < 0 || l > Int.MaxValue)
                  throw new IllegalArgumentException(
                    s"lev_bounded bound out of int range: $l")
                l.intValue()
              case s: java.lang.Short => s.intValue()
              case b: java.lang.Byte => b.intValue()
              case other => throw new IllegalArgumentException(
                s"lev_bounded bound folded to unexpected $other")
            }
          case other => throw new IllegalArgumentException(
            s"lev_bounded bound must be a foldable integral " +
              s"expression, got $other")
        }
        BoundedLevenshteinExpr(exprs(0), exprs(1), bound)
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - merge-walk overlap count of two sorted arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => RewriteRegexCount)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
