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
  * is O(1) metadata. Readers between swap steps see the old version
  * (rename is atomic per directory on HDFS-like stores).
  */
object ParquetMerge {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def current(spark: SparkSession, root: String): Option[DataFrame] = {
    val cur = s"$root/cur"
    if (fs(spark, root).exists(new Path(cur)))
      Some(spark.read.parquet(cur))
    else None
  }

  private def swapIn(spark: SparkSession, root: String, df: DataFrame): DataFrame = {
    val f = fs(spark, root)
    val staged = s"$root/staged"
    df.write.mode("overwrite").parquet(staged)
    val cur = new Path(s"$root/cur")
    f.delete(cur, true)
    f.rename(new Path(staged), cur)
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

  /** Delete rows matching the predicate. Returns the new table state. */
  def delete(spark: SparkSession, root: String, predicate: Column): DataFrame =
    current(spark, root) match {
      case Some(cur) => swapIn(spark, root, cur.filter(!predicate))
      case None => throw new IllegalStateException(s"no table at $root")
    }
}
