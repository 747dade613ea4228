package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, Relational}
import graft.sources.Compaction

/** Specs for the round-6 additions: sketch accuracy envelopes (HLL,
  * approximate quantiles), small-file compaction, and AQE skew-join
  * splitting.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("hllDistinct: both HLL paths land within 5% of exact") {
    // The envelope math now lives in the query itself (the oracle gate
    // asserts the verdict columns TRUE); here we bind the same contract
    // in-suite so a drift shows up as a named failure, not a hash diff.
    val rows = Events.hllDistinct(spark, dir)
      .select($"event_type", $"direct_within_5pct", $"merged_within_5pct")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, direct, merged) =>
      assert(direct, s"$t: approx_count_distinct outside 5% envelope")
      assert(merged, s"$t: merged hll_sketch outside 5% envelope")
    }
  }

  test("approxQuantiles: GK value error within the accuracy contract") {
    val rows = Relational.approxQuantiles(spark, dir)
      .select($"l_returnflag", $"p50_within_1pct", $"p99_within_1pct")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, p50, p99) =>
      assert(p50, s"$f: p50 approx outside 1% of exact")
      assert(p99, s"$f: p99 approx outside 1% of exact")
    }
  }

  test("compaction: many small files become the computed target count") {
    val tmp = System.getProperty("java.io.tmpdir")
    val in = s"$tmp/graft_compact_in"
    val out = s"$tmp/graft_compact_out"
    graft.sources.Tables.events(spark, dir)
      .repartition(32).write.mode("overwrite").parquet(in)
    val (before, _) = Compaction.profile(spark, in)
    assert(before == 32)
    val (_, totalBytes) = Compaction.profile(spark, in)
    // target half the data per file → expect 2 files
    val (b, after) = Compaction.compact(spark, in, out, totalBytes / 2 + 1)
    assert(b == 32 && after == 2, s"before=$b after=$after")
    // content identical
    val a = spark.read.parquet(in).orderBy("event_id")
    val c = spark.read.parquet(out).orderBy("event_id")
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("AQE splits a skewed sort-merge join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "32KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    import s2.implicits._
    // 95% of the fact lands on key 0 — the canonical hot key
    val fact = s2.range(0, 200000)
      .select((when(rand(42) < 0.95, 0L).otherwise(pmod($"id", lit(100L))))
        .as("k"), ($"id" % 1000).as("payload"))
    val dim = s2.range(0, 100).select($"id".as("k"), ($"id" * 7).as("attr"))
    // aggregate globally: a keyed agg downstream would REQUIRE the
    // join's hash partitioning and AQE would refuse to split the skewed
    // partitions (it won't introduce an extra shuffle unless forced)
    val joined = fact.join(dim, "k").agg(sum("payload").as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"no skew-split SMJ in final adaptive plan:\n$plan")
  }
}
