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
      (exprs: Seq[Expression]) => BoundedLevenshteinExpr(
        exprs(0), exprs(1), exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"lev_bounded bound must be an int literal, got $other")
        })))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - merge-walk overlap count of two sorted arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => RewriteRegexCount)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
