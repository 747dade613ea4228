package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.DeltaLog
import graft.streaming.StreamingIvfMaintainer

/** The maintainer's published read artifact must be DELTA-PRICED to
  * keep fresh: an epoch's publish rewrites only the bucket files its
  * committed cid delta hashes to, and every untouched bucket's file
  * carries over byte-for-byte. Three pins:
  *
  *  1. placement agreement — the publish routes rows with
  *     `pmod(hash(cid), n)`, which must equal the bucket-file
  *     assignment Spark's own `bucketBy` write produces (otherwise
  *     plan-time bucket pruning would silently DROP rows);
  *  2. affected-only rewrite — a one-tombstone epoch touches a strict
  *     subset of buckets; the untouched files are byte-identical
  *     (bytes AND mtime) across the epoch's publish, and the artifact
  *     equals the log-resolved state exactly;
  *  3. staleness contract — the artifact's epoch stamp equals the
  *     state log's last committed epoch after any serve-path
  *     registration, and a stale stamp (crash between commit and
  *     publish) is read-repaired before serving.
  */
class AffectedBucketPublishSpec extends SparkSpec {

  test("publish routing pmod(hash(cid), n) matches Spark's bucketBy " +
      "file assignment") {
    import spark.implicits._
    val n = 8
    val df = (0L until 500L).map(i => (i, i * 31 % 97)).toDF("cid", "v")
    val path = Files.createTempDirectory("graft-bktcheck").toString
    val name = s"bktcheck_${System.nanoTime()}"
    df.repartition(n, col("cid")).write
      .bucketBy(n, "cid").option("path", s"$path/t")
      .mode("overwrite").saveAsTable(name)
    val files = new java.io.File(s"$path/t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val re = """.*_(\d+)(?:\..*)?$""".r
    files.foreach { f =>
      val bucketId = f.getName.stripSuffix(".c000.snappy.parquet") match {
        case re(b) => b.toInt
      }
      val mismatched = spark.read.parquet(f.getAbsolutePath)
        .filter(pmod(hash(col("cid")), lit(n)) =!= lit(bucketId))
        .count()
      assert(mismatched == 0,
        s"file ${f.getName}: $mismatched rows disagree with " +
          s"pmod(hash(cid), $n) = $bucketId")
    }
    spark.sql(s"DROP TABLE $name")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
  }

  test("an epoch's publish rewrites only the touched buckets; " +
      "untouched files are byte-identical and content matches the log") {
    val dir = sf("sf0.001")
    val root = s"/tmp/graft-abp-spec-${System.nanoTime()}"
    try {
      val all = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 64)
      val seed = all.withColumn("deleted", lit(false))
      // batch 0: seed the index — full publish of every bucket
      StreamingIvfMaintainer.applyBatch(spark, root, seed, 0L)
      val pub = new java.io.File(s"$root/published/assigned")
      def snapshot(): Map[String, (Long, Array[Byte])] =
        pub.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName ->
            ((f.lastModified(), Files.readAllBytes(f.toPath)))).toMap
      val before = snapshot()
      assert(before.nonEmpty, "seed publish wrote no bucket files")
      assert(StreamingIvfMaintainer.publishedEpoch(root) == 0L)

      // batch 1: ONE tombstone — its multi-probe rows touch <= nProbe
      // cids, a strict subset of the bucket space
      val tomb = all.filter(col("vec_id") === 5)
        .select(col("vec_id"),
          lit(null).cast("array<float>").as("embedding"))
        .withColumn("deleted", lit(true))
      StreamingIvfMaintainer.applyBatch(spark, root, tomb, 1L)
      val after = snapshot()
      assert(StreamingIvfMaintainer.publishedEpoch(root) == 1L)

      val publog = new String(
        Files.readAllBytes(Paths.get(s"${pub.getPath}/_publog")), "UTF-8")
        .linesIterator.toSeq
      val epochLine = publog.find(_.startsWith("epoch=1 ")).get
      val rewritten = epochLine.split(" ")(1).stripPrefix("rewrote=")
        .split(",").filter(_.nonEmpty).map(b => f"b_${b.toInt}%05d.parquet")
        .toSet
      assert(rewritten.nonEmpty, s"epoch 1 rewrote nothing: $epochLine")
      assert(rewritten.size < before.size,
        s"epoch 1 rewrote EVERY bucket ($epochLine) — not delta-priced")

      // untouched buckets: byte-identical, not even re-written in place
      (before.keySet -- rewritten).foreach { f =>
        assert(after.contains(f), s"untouched $f disappeared")
        assert(after(f)._1 == before(f)._1, s"untouched $f mtime changed")
        assert(java.util.Arrays.equals(after(f)._2, before(f)._2),
          s"untouched $f bytes changed")
      }
      // touched buckets: actually rewritten (the tombstone's rows left)
      assert(rewritten.exists(f => !before.get(f).map(_._2)
          .exists(b => after.get(f).exists(a =>
            java.util.Arrays.equals(a._2, b)))),
        "no touched bucket's content changed")

      // the artifact IS the log-resolved state, row for row
      val published = spark.read.parquet(pub.getPath)
        .select("vec_id", "cid")
      val resolved = DeltaLog.read(spark, s"$root/state/assigned",
        Seq("vec_id", "cid")).get.select("vec_id", "cid")
      assert(published.exceptAll(resolved).isEmpty &&
        resolved.exceptAll(published).isEmpty,
        "published artifact diverges from the log-resolved state")
      // and the tombstone is really gone from the read path
      assert(published.filter(col("vec_id") === 5).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("serve-side staleness contract: served epoch equals the " +
      "maintainer's last commit, and a stale stamp is read-repaired") {
    val dir = sf("sf0.001")
    val served = StreamingIvfMaintainer.servedEpoch(spark, dir)
    val root = StreamingIvfMaintainer.drainedStateRoot(spark, dir)
    val logLast = DeltaLog.lastEpoch(spark, s"$root/state/assigned").get
    assert(served == logLast,
      s"served epoch $served != last committed $logLast")

    // simulate a crash between commit and publish: regress the stamp
    val stamp = Paths.get(s"$root/published/assigned/_epoch")
    Files.write(stamp, "-99".getBytes("UTF-8"))
    assert(StreamingIvfMaintainer.publishedEpoch(root) == -99L)
    // the serve path must repair before serving
    val served2 = StreamingIvfMaintainer.servedEpoch(spark, dir)
    assert(served2 == logLast, "stale artifact served without repair")
    // and the repaired artifact still answers the q286 contract
    val rows = StreamingIvfMaintainer
      .servedKnnPruned(spark, dir).count()
    assert(rows > 0)
  }
}
