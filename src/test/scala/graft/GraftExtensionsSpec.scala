package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path must make both custom functions SQL-visible in a
  * session built with `.withExtensions` — no per-session register()
  * calls. (Own session on purpose: extensions bind at session build.)
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs hamming and kmv_distinct for SQL") {
    // getOrCreate returns any existing default session and silently skips
    // extensions — clear it first (the shared SparkContext survives) and
    // restore afterwards so other suites keep their sessions.
    val saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val h = spark.sql("SELECT hamming(CAST(5 AS BIGINT), CAST(6 AS BIGINT)) AS d")
        .collect()(0).getInt(0)
      assert(h == 2) // 101 xor 110 = 011
      spark.range(0, 500).createOrReplaceTempView("ext_ids")
      val est = spark.sql(
        """SELECT kmv_distinct(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT))
          |FROM ext_ids""".stripMargin).collect()(0).getLong(0)
      assert(est > 250 && est < 1000, s"estimate $est")
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
