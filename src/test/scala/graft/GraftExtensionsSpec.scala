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

  test("lev_bounded: arity is validated and any foldable integral " +
      "bound is accepted (bare, CAST, bigint literal)") {
    val saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-lev-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      def one(sql: String): Int =
        spark.sql(s"SELECT $sql AS d").collect()(0).getInt(0)
      assert(one("lev_bounded('kitten', 'sitting', 2)") == 3) // k+1 cap
      assert(one("lev_bounded('kitten', 'sitting', CAST(3 AS INT))") == 3)
      assert(one("lev_bounded('kitten', 'sitting', 3L)") == 3)
      assert(one("lev_bounded('kitten', 'sitting', CAST(3 AS SMALLINT))")
        == 3)
      val tooFew = intercept[Exception] {
        spark.sql("SELECT lev_bounded('a', 'b')").collect()
      }
      assert(tooFew.getMessage.contains("3 arguments"),
        s"wrong arity error: ${tooFew.getMessage}")
      val nonFoldable = intercept[Exception] {
        spark.range(1).createOrReplaceTempView("lb_ids")
        spark.sql(
          "SELECT lev_bounded('a', 'b', CAST(id AS INT)) FROM lb_ids")
          .collect()
      }
      assert(nonFoldable.getMessage.contains("foldable"),
        s"wrong bound error: ${nonFoldable.getMessage}")
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
