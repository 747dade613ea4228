package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy
import graft.sources.Tables

/** Privacy release operators (q238/q239): pseudonymization invariants
  * and the k-anonymity guarantee itself. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  val dir = sf("sf0.001")

  test("q238: masking destroys digits, pseudonyms are deterministic " +
      "and collision-free on this table, bands generalize") {
    val red = Privacy.piiRedaction(spark, dir).cache()
    val n = Tables.customer(spark, dir).count()
    assert(red.count() == n)
    // no digit survives in the display form
    assert(red.filter(col("name_masked").rlike("[0-9]")).count() == 0)
    // keyed pseudonym: still unique per customer (joins keep working)
    assert(red.select("name_hash").distinct().count() == n)
    // banding is a generalization: strictly coarser than the raw value
    assert(red.select("acct_band").distinct().count() < n)
    // band reconstructs the interval the raw value lies in
    val joined = red.join(Tables.customer(spark, dir), "c_custkey")
      .select($"acct_band", $"c_acctbal").as[(Long, Double)].collect()
    joined.foreach { case (b, v) =>
      assert(v >= b * 1000.0 - 0.005 && v < (b + 1) * 1000.0 + 0.005,
        s"band $b does not contain $v")
    }
    red.unpersist()
  }

  test("q239: every released/generalized cell satisfies k; suppressed " +
      "cells violate it; accounting is total") {
    val k = 5L
    val a = Privacy.kAnonymity(spark, dir, k).cache()
    val bad = a.filter(col("status").isin("released", "generalized")
      && col("n") < k)
    assert(bad.count() == 0, "a shipped cell is under k")
    assert(a.filter(col("status") === "suppressed" && col("n") >= k)
      .count() == 0, "a suppressed cell did not violate k")
    // no customer is lost or double-counted by the lattice climb
    assert(a.agg(sum("n")).as[Long].head() ==
      Tables.customer(spark, dir).count())
    // generalized/suppressed rows are at nation grain exactly once
    val starDupes = a.filter(col("segment") === "*")
      .groupBy("c_nationkey").count().filter(col("count") > 1)
    assert(starDupes.count() == 0)
    a.unpersist()
  }

  test("q241: the released table satisfies k-anonymity on its own " +
      "quasi-identifiers by construction") {
    val k = 5L
    val rel = Privacy.anonymizedRelease(spark, dir, k).cache()
    // every (nation, segment_out) cell in what actually ships has >= k
    // members — the audit applied, not just reported
    val thin = rel.groupBy("c_nationkey", "segment_out").count()
      .filter(col("count") < k)
    assert(thin.count() == 0, "released table has a cell under k")
    // suppressed customers are absent; nobody else is
    val audit = Privacy.kAnonymity(spark, dir, k)
    val suppressed = audit.filter(col("status") === "suppressed")
      .agg(sum("n")).as[Long].head()
    assert(rel.count() ==
      Tables.customer(spark, dir).count() - suppressed)
    rel.unpersist()
  }
}
