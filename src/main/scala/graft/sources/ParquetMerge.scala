package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** MERGE INTO semantics on plain parquet directories — the operational
  * upsert/delete surface a table format provides, reduced to its
  * dataflow: read current → key-anti-join the untouched rows →
  * union the updates → staged write → atomic swap (write-new + rename,
  * the same two-step the streaming [[graft.streaming.ForeachBatchMerge]]
  * sink uses; a production table format carries the swap in its commit
  * log instead of the filesystem).
  *
  * Scale: one key-shuffled anti join per merge, sized by the TARGET
  * (the updates side is broadcast when small — AQE decides); the swap
  * is O(1) metadata. The swap never leaves the table absent: the old
  * version is renamed ASIDE (cur→cur_old), the staged version renamed
  * in, and only then is the old version deleted — a crash between any
  * two steps leaves either the old or the new version recoverable
  * (rename is atomic per directory on HDFS-like stores; a production
  * table format carries the same flip in its commit log).
  */
object ParquetMerge {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Readers are STRICTLY read-only: if a swap died after renaming cur
    * aside but before renaming staged in, cur_old is the live version
    * and is read IN PLACE. Renaming it back here would race the writer
    * mid-swap (a reader's cur_old→cur rename between the writer's two
    * renames makes the writer's staged→cur rename fail); recovery is
    * writer-only — the next [[swapIn]] supersedes cur_old atomically. */
  def current(spark: SparkSession, root: String): Option[DataFrame] = {
    val f = fs(spark, root)
    val cur = new Path(s"$root/cur")
    if (f.exists(cur)) Some(spark.read.parquet(cur.toString))
    else {
      val old = new Path(s"$root/cur_old")
      if (f.exists(old)) Some(spark.read.parquet(old.toString)) else None
    }
  }

  /** Single-writer swap (Hadoop `rename` reports failure by RETURNING
    * FALSE, not throwing): every rename is checked, and the old version
    * is deleted only after the new one is verifiably in place — an
    * unchecked `rename(staged, cur)` failure followed by the cleanup
    * delete would destroy the only surviving copy. Concurrent WRITERS
    * need a table format's commit log; this is the documented
    * single-writer contract (readers are safe throughout). */
  private def swapIn(spark: SparkSession, root: String, df: DataFrame): DataFrame = {
    val f = fs(spark, root)
    val staged = s"$root/staged"
    // the staged write EXECUTES df's plan here — when current() resolved
    // to cur_old (prior crashed swap), its bytes are safely copied into
    // staged before any rename below touches that directory
    df.write.mode("overwrite").parquet(staged)
    val cur = new Path(s"$root/cur")
    val old = new Path(s"$root/cur_old")
    // WRITER-side recovery (readers stay read-only — see current()): a
    // prior swap that died between its two renames left cur absent and
    // cur_old as the LIVE version. Complete that swap first; deleting
    // cur_old as "leftover" while cur is absent would destroy the only
    // live copy, and a subsequent failure would leave the table empty.
    if (!f.exists(cur) && f.exists(old) && !f.rename(old, cur))
      throw new java.io.IOException(s"swap: recovery rename $old -> $cur failed")
    f.delete(old, true) // now truly leftover (cur exists, or neither does)
    if (f.exists(cur) && !f.rename(cur, old))
      throw new java.io.IOException(s"swap: rename $cur -> $old failed")
    if (!f.rename(new Path(staged), cur)) {
      // put the old version back before failing: the table must never
      // be left absent
      if (f.exists(old)) f.rename(old, cur)
      throw new java.io.IOException(s"swap: rename $staged -> $cur failed")
    }
    f.delete(old, true)
    spark.read.parquet(s"$root/cur")
  }

  /** Upsert by key: rows matching an update key are replaced, new keys
    * append, everything else survives. Returns the new table state. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val merged = current(spark, root) match {
      case Some(cur) =>
        cur.join(updates.select(keyCols.map(updates(_)): _*), keyCols,
          "left_anti").unionByName(updates)
      case None => updates
    }
    swapIn(spark, root, merged)
  }

  /** Delete rows matching the predicate. SQL DELETE semantics: only
    * rows where the predicate is TRUE go — a NULL predicate result
    * keeps the row (a bare `filter(!predicate)` would drop NULLs too,
    * silently deleting rows the predicate couldn't even evaluate).
    * Returns the new table state. */
  def delete(spark: SparkSession, root: String, predicate: Column): DataFrame =
    current(spark, root) match {
      case Some(cur) =>
        swapIn(spark, root,
          cur.filter(!org.apache.spark.sql.functions.coalesce(
            predicate, org.apache.spark.sql.functions.lit(false))))
      case None => throw new IllegalStateException(s"no table at $root")
    }

  /** The MERGE surface as a gated end-to-end scenario (q151): seed a
    * table from every 3rd order, upsert a status change onto every 6th
    * (a subset — pure matched-update), DELETE every 9th, and return the
    * final table state. Every step is deterministic, so the DuckDB
    * oracle recomputes the final state RELATIONALLY (CASE for the
    * update, predicate for the delete) — the write path's correctness
    * is hash-verified, not just spec-asserted. The scenario root is
    * keyed by the input dir and cleared first, so reruns are
    * bit-identical. */
  def mergeScenario(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val key = java.util.UUID.nameUUIDFromBytes(("pmerge:" + dir).getBytes)
      .toString.take(8)
    // per-process root: Verify and Bench may run this scenario
    // concurrently in separate JVMs, and the scenario starts by deleting
    // its root — a shared path would have one JVM deleting the table the
    // other is mid-merge on
    val pid = ProcessHandle.current().pid()
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft-pmerge-$key-p$pid"
    fs(spark, root).delete(new Path(root), true)

    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    upsert(spark, root, orders.filter(col("o_orderkey") % 3 === 0),
      Seq("o_orderkey"))
    upsert(spark, root,
      orders.filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_orderstatus", lit("M")),
      Seq("o_orderkey"))
    delete(spark, root, col("o_orderkey") % 9 === 0)
      .orderBy("o_orderkey")
  }
}
