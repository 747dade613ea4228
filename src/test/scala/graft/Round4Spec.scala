package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.{Events, Graphs, Relational, TextOps, VectorOps}

/** Specs for the round-4 additions: rolling distinct, entropy, PageRank,
  * HOF sweep, label centroids, and dynamic partition pruning.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("rollingDistinctUsers: wau ≥ dau, and wau equals brute-force recount") {
    val rows = Events.rollingDistinctUsers(spark, dir)
    assert(rows.filter($"wau" < $"dau").count() == 0)
    // brute force: distinct users whose activity day falls in [day-6, day]
    val pairs = graft.sources.Tables.events(spark, dir)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    val probe = rows.orderBy(desc("day")).limit(1).select("day", "wau")
      .as[(java.sql.Date, Long)].head()
    val brute = pairs
      .filter($"d" <= lit(probe._1) && $"d" >= date_sub(lit(probe._1), 6))
      .select("user_id").distinct().count()
    assert(probe._2 == brute)
  }

  test("tokenEntropy: bounded by ln(n_types) and positive on real text") {
    val rows = TextOps.tokenEntropy(spark, dir)
      .select($"lang", $"n_types", $"entropy_nats")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, types, h) =>
      assert(h > 0.0)
      // uniform distribution maximizes H at ln(n_types); allow the
      // floor-scaling's 1e-6 slack
      assert(h <= math.log(types.toDouble) + 1e-5)
    }
  }

  test("brandPageRank: total mass conserved within integer-floor loss") {
    val ranks = Graphs.brandPageRank(spark, dir)
    val n = ranks.count()
    val total = ranks.agg(sum("rank_i")).as[Long].head()
    // Σ ranks ≈ SCALE (mass preserved up to floor losses: each of the
    // n teleport terms and each edge contribution floors away < 1 unit,
    // and the 85% damping of lost dangling mass only shrinks the total)
    assert(total <= Graphs.PrScale)
    assert(total > Graphs.PrScale * 80L / 100L)
    assert(n == 25)
    // a rank is never below the teleport floor
    val minRank = ranks.agg(min("rank_i")).as[Long].head()
    assert(minRank >= Graphs.PrScale * 15L / 100L / n)
  }

  test("hofSweep: fold total equals sum of token lengths") {
    val row = TextOps.hofSweep(spark, dir).filter($"doc_id" === 7)
      .select("total_token_chars").as[Long].head()
    val text = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select("text").as[String].head()
    assert(row == text.split(" ", -1).map(_.length).sum)
  }

  test("labelCentroids: grain is labels × dim and mean is within bounds") {
    val e = graft.sources.Tables.embeddings(spark, dir)
    val nLabels = e.select("label").distinct().count()
    val rows = VectorOps.labelCentroids(spark, dir)
    assert(rows.count() == nLabels * 64)
    // every centroid component lies within the observed min/max of that
    // component — a mean cannot leave the hull
    val bounds = e.select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(min("x").as("lo"), max("x").as("hi"))
    val bad = rows.join(bounds, Seq("label", "pos"))
      .filter($"centroid" < $"lo" - lit(1e-6) || $"centroid" > $"hi" + lit(1e-6))
    assert(bad.count() == 0)
  }

  test("dppRevenue: scan reads only the quarter's partitions (DPP active)") {
    // AQE wraps finished stages in leaf QueryStageExec nodes, hiding the
    // scan from collect(); DPP itself is independent of AQE, so assert
    // on a non-adaptive session clone where the tree is plain.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Relational.dppRevenue(s2, dir)
    df.collect() // force execution so runtime pruning actually runs
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collect {
      case s: FileSourceScanExec if s.output.exists(_.name == "ship_month") => s
    }
    assert(scans.nonEmpty, "partitioned fact scan not found")
    // the scan must carry a runtime (dynamic) partition filter...
    import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
    assert(scans.exists(_.partitionFilters.exists(
      _.find(_.isInstanceOf[DynamicPruningExpression]).isDefined)),
      s"no DynamicPruningExpression in partition filters:\n$executed")
    // ...and at execution time touch exactly the 3 matching partitions
    // (selectedPartitions is the STATIC listing — runtime pruning shows
    // up in the scan's numPartitions metric)
    val scanned = scans.head.metrics("numPartitions").value
    assert(scanned == 3, s"expected 3 pruned partitions, scanned $scanned")
  }
}
