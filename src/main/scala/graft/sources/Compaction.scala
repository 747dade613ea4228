package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every streaming/
  * incremental sink needs: micro-batches and per-partition task writes
  * leave directories with thousands of KB-sized parquet files, and at
  * 100 TB the scan cost becomes footer-and-scheduling-bound (one Spark
  * task + one footer read per file) instead of IO-bound. Compaction
  * rewrites the directory into ~targetBytes files: file count derives
  * from the REAL on-disk size (Hadoop FS listing, no driver read of
  * data), the rewrite is one `repartition` round-robin exchange, and
  * the write goes to a fresh directory + atomic-ish swap semantics left
  * to the caller's table-format layer (this engine's layer is plain
  * directories; Delta/Iceberg would commit a snapshot instead).
  */
object Compaction {

  /** Number of data files and total bytes in a parquet directory. */
  def profile(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.length, files.map(_.getLen).sum)
  }

  /** Rewrite `inDir` into `outDir` targeting `targetBytes` per file.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val (nBefore, totalBytes) = profile(spark, inDir)
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    (nBefore, profile(spark, outDir)._1)
  }
}
