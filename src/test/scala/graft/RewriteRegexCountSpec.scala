package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule must rewrite size(regexp_extract_all)
  * to regexp_count (plan shape) without changing results.
  */
class RewriteRegexCountSpec extends AnyFunSuite {

  test("size(regexp_extract_all(s, p, 0)) optimizes to regexp_count") {
    val saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rule-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      // a real datasource, not a LocalRelation — ConvertToLocalRelation
      // would otherwise fold the whole query before we can inspect it
      val tmp = java.nio.file.Files.createTempDirectory("rrc").toString
      Seq("a1 b22 c", "no digits here", "9 9 9").toDF("text")
        .write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).createOrReplaceTempView("rrc_in")
      val df = spark.sql(
        "SELECT size(regexp_extract_all(text, '[0-9]+', 0)) AS n FROM rrc_in")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("regex_count_fast"),
        s"rule did not fire:\n$optimized")
      assert(!optimized.contains("regexp_extract_all"),
        s"array form survived:\n$optimized")
      assert(df.as[Int].collect().sorted.sameElements(Array(0, 2, 3)))

      // group-extraction form (idx != 0) must NOT be rewritten
      val grouped = spark.sql(
        "SELECT size(regexp_extract_all(text, '([0-9])[0-9]*', 1)) AS n FROM rrc_in")
      assert(grouped.queryExecution.optimizedPlan.toString
        .contains("regexp_extract_all"))
      assert(grouped.as[Int].collect().sorted.sameElements(Array(0, 2, 3)))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      saved.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
