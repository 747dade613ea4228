package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injected planner strategy must take over the row_number-filter
  * pattern (plan shape) and produce EXACTLY WindowExec's results on
  * the library's own first/last-per-group queries.
  */
class TopKPerKeySpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = graft.util.Sessions.withGraftDefaults(SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-test")
      .config("spark.sql.shuffle.partitions", "4"))
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      saved.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }

  test("strategy fires on first-item-per-order and matches WindowExec") {
    withExtSession { spark =>
      val dir = "/root/testdata/sf0.001"
      val df = graft.operators.Relational.firstItemPerOrder(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"strategy did not fire:\n$plan")
      assert(!plan.contains("WindowExec"), s"window survived:\n$plan")
      // absorbing the WindowGroupLimit prune removes its sorts too: the
      // only Sort left is the final output ORDER BY
      assert(!plan.contains("WindowGroupLimit"),
        s"group-limit prune (and its sorts) survived:\n$plan")
      assert(df.collect().nonEmpty)
    }
  }

  test("q100 shape (cast above the filter) still fires the strategy") {
    withExtSession { spark =>
      val df = graft.operators.Relational
        .topPartsPerBrand(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"strategy did not fire:\n$plan")
      assert(!plan.contains("WindowExec"), s"window survived:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("exact equality vs WindowExec across k=1 and k=5 shapes") {
    // reference results from the DEFAULT session (no extensions)
    val plainSpark = graft.util.Sessions.withGraftDefaults(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    val dir = "/root/testdata/sf0.001"
    val refFirst = graft.operators.Relational.firstItemPerOrder(plainSpark, dir)
      .collect().map(_.toSeq).toSeq
    val refKnn = graft.operators.VectorOps.knnCosine(plainSpark, dir)
      .collect().map(_.toSeq).toSeq

    withExtSession { spark =>
      val gotFirst = graft.operators.Relational.firstItemPerOrder(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(gotFirst == refFirst, "k=1 shape diverged from WindowExec")
      val knn = graft.operators.VectorOps.knnCosine(spark, dir)
      assert(knn.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val gotKnn = knn.collect().map(_.toSeq).toSeq
      assert(gotKnn == refKnn, "k=5 shape diverged from WindowExec")
    }
  }
}
