package graft

import org.apache.spark.sql.functions._

import graft.sources.ParquetMerge

class ParquetMergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched keys, appends new ones, keeps the rest; " +
      "delete filters; swaps are re-readable states") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pmerge").toString

    // initial state via upsert into an empty table
    val s0 = ParquetMerge.upsert(spark, root,
      Seq((1L, "open", 10.0), (2L, "open", 20.0), (3L, "paid", 30.0))
        .toDF("id", "status", "amount"), Seq("id"))
    assert(s0.count() == 3)

    // composite behavior: 1 updated, 4 inserted, 2 & 3 untouched
    val s1 = ParquetMerge.upsert(spark, root,
      Seq((1L, "shipped", 11.0), (4L, "open", 40.0))
        .toDF("id", "status", "amount"), Seq("id"))
    val byId = s1.orderBy("id")
      .as[(Long, String, Double)].collect().toList
    assert(byId == List((1L, "shipped", 11.0), (2L, "open", 20.0),
      (3L, "paid", 30.0), (4L, "open", 40.0)))

    // delete by predicate
    val s2 = ParquetMerge.delete(spark, root, col("status") === "open")
    assert(s2.select("id").as[Long].collect().sorted.toList == List(1L, 3L))

    // the on-disk state is what current() reads back
    assert(ParquetMerge.current(spark, root).get.count() == 2)

    // multi-column keys
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_pmerge2").toString
    ParquetMerge.upsert(spark, root2,
      Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"))
    val m = ParquetMerge.upsert(spark, root2,
      Seq((1L, "b", 9.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    assert(m.orderBy("k2").as[(Long, String, Double)].collect().toList ==
      List((1L, "a", 1.0), (1L, "b", 9.0)))
  }

  test("delete keeps rows whose predicate evaluates to NULL " +
      "(SQL DELETE removes only TRUE)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pmerge_null").toString
    ParquetMerge.upsert(spark, root,
      Seq((1L, Some("open")), (2L, None), (3L, Some("paid")))
        .toDF("id", "status"), Seq("id"))
    // status = 'open' is NULL for id=2 — that row must survive
    val s = ParquetMerge.delete(spark, root, col("status") === "open")
    assert(s.select("id").as[Long].collect().sorted.toList == List(2L, 3L))
  }

  test("swap is crash-safe: the table is never absent mid-swap, and a " +
      "crash after cur moved aside recovers from cur_old") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pmerge_crash").toString
    ParquetMerge.upsert(spark, root,
      Seq((1L, 1.0)).toDF("id", "v"), Seq("id"))
    // simulate a swap that died after renaming cur aside but before
    // renaming staged in: cur_old holds the only copy
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/cur"),
      new org.apache.hadoop.fs.Path(s"$root/cur_old")))
    // current() must recover the old version, not report an empty table
    val recovered = ParquetMerge.current(spark, root)
    assert(recovered.isDefined && recovered.get.count() == 1)
    // and the next merge proceeds normally from the recovered state
    val s = ParquetMerge.upsert(spark, root,
      Seq((2L, 2.0)).toDF("id", "v"), Seq("id"))
    assert(s.count() == 2)
  }
}
