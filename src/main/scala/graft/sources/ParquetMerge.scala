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

  def current(spark: SparkSession, root: String): Option[DataFrame] = {
    val f = fs(spark, root)
    val cur = new Path(s"$root/cur")
    if (f.exists(cur)) Some(spark.read.parquet(cur.toString))
    else {
      // crash recovery: a swap that died after renaming cur aside but
      // before renaming staged in leaves cur_old as the live version
      val old = new Path(s"$root/cur_old")
      if (f.exists(old)) { f.rename(old, cur); Some(spark.read.parquet(cur.toString)) }
      else None
    }
  }

  private def swapIn(spark: SparkSession, root: String, df: DataFrame): DataFrame = {
    val f = fs(spark, root)
    val staged = s"$root/staged"
    df.write.mode("overwrite").parquet(staged)
    val cur = new Path(s"$root/cur")
    val old = new Path(s"$root/cur_old")
    f.delete(old, true) // clear any leftover from a prior crashed swap
    if (f.exists(cur)) f.rename(cur, old)
    f.rename(new Path(staged), cur)
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
}
