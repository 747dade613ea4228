package graft

import org.apache.spark.sql.functions._
import graft.operators.Bronze

class BronzeSpec extends SparkSpec {
  import spark.implicits._

  test("CSV directory ingest: tag, heterogeneous union, truncate-load") {
    val dir = java.nio.file.Files.createTempDirectory("bronze")
    java.nio.file.Files.writeString(dir.resolve("cust.csv"),
      "id,name,city\n1,ann,berlin\n2,bob,paris\n")
    java.nio.file.Files.writeString(dir.resolve("sell.csv"),
      "id,name,rating\n7,zoe,4.5\n")

    val tagged = Bronze.readTagged(spark, Map(
      "cust" -> s"$dir/cust.csv", "sell" -> s"$dir/sell.csv"))
    assert(tagged("cust").columns.contains("source_table"))

    val raw = Bronze.rawUnion(tagged.values.toSeq)
    // schema union: city and rating both present, null where missing
    assert(raw.columns.toSet == Set("id", "name", "city", "rating", "source_table"))
    assert(raw.count() == 3)
    assert(raw.filter($"source_table" === "sell" && $"city".isNull).count() == 1)
    assert(raw.filter($"source_table" === "cust" && $"rating".isNull).count() == 2)

    val out = dir.resolve("raw").toString
    val loaded = Bronze.loadRaw(spark,
      Map("cust" -> s"$dir/cust.csv", "sell" -> s"$dir/sell.csv"), out)
    assert(loaded.count() == 3)
    // truncate semantics: second load replaces, not appends
    val reloaded = Bronze.loadRaw(spark, Map("cust" -> s"$dir/cust.csv"), out)
    assert(reloaded.count() == 2)
  }
}
