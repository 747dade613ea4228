package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextOps}

/** The two-phase distributed prefix-sum must be bit-identical to the
  * single-partition global window form it replaces (q160's engine). */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("globalRankedPrefixSum equals ROW_NUMBER + running SUM over a " +
      "global ORDER BY, on keys crossing many range partitions") {
    val df = (1 to 5000)
      .map(i => (f"k${(i * 7919) % 5000}%05d", ((i * 31) % 100 + 1).toLong))
      .toDF("k", "v")
    val got = Relational.globalRankedPrefixSum(df, "k", "v", "rk", "cum")
      .select("k", "v", "rk", "cum").orderBy("k").collect().toSeq
    val w = Window.orderBy("k")
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "v", "rk", "cum").orderBy("k").collect().toSeq
    assert(got == want)
    // and the plan truly avoids the single-partition sort
    val plan = Relational.globalRankedPrefixSum(df, "k", "v", "rk", "cum")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("q159: exactly one canonical per component, and it has the " +
      "component's max token count") {
    val out = TextOps.qualityCanonical(spark, sf("sf0.001")).cache()
    val perComp = out.groupBy("component")
      .agg(sum($"is_canonical".cast("long")).as("n_canon"),
        max("n_tokens").as("max_tok"))
    assert(perComp.filter($"n_canon" =!= 1).count() == 0)
    val winners = out.filter($"is_canonical")
      .select($"component", $"n_tokens".as("win_tok"))
    assert(winners.join(perComp, "component")
      .filter($"win_tok" =!= $"max_tok").count() == 0)
    // the policy must actually diverge from min-id canonicality
    // somewhere (otherwise the query tests nothing new)
    assert(out.filter($"is_canonical" && $"doc_id" =!= $"component")
      .count() > 0)
    out.unpersist()
  }

  test("q160: coverage is monotone, ends at the top-k prefix of the " +
      "full vocabulary, and rank 1 is the modal token") {
    val out = TextOps.vocabCoverage(spark, sf("sf0.001"), topK = 20)
      .collect()
    assert(out.length == 20) // the fixture vocabulary holds 31 types
    assert(out.map(_.getLong(2)).toSeq == (1L to 20L))
    val cums = out.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    val cnts = out.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a })
    val cov = out.map(_.getDouble(4))
    assert(cov.last <= 1.0 && cov.head > 0.0)
  }
}
