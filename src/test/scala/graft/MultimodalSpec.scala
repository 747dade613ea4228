package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 300).cache()

  test("synthetic media matches the binary-column schema contract") {
    assert(media.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() == 300)
    // ~1KB deterministic payloads
    val sizes = media.select(length($"bytes")).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(512)) // 32 md5 blocks × 16 bytes
  }

  test("extractFeatures: partition-batched, fixed dim, bytes dropped") {
    val f = Multimodal.extractFeatures(media, dim = 32)
    val rows = f.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.feature.length == 32))
    assert(rows.forall(_.n_bytes == 512))
    assert(!f.columns.contains("bytes"))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("null payloads yield empty features, not task failures") {
    val withNulls = media.withColumn("bytes",
      when($"media_id" % 7 === 0, lit(null)).otherwise($"bytes"))
    val f = Multimodal.extractFeatures(withNulls, dim = 8).collect()
    assert(f.length == 300)
    assert(f.filter(_.n_bytes == 0).forall(_.feature.forall(_ == 0.0f)))
  }

  test("frame sampling and resize plans are metadata-pure") {
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    assert(frames.count() == media.filter($"kind" === "video").count())
    val bad = Multimodal.resizePlan(media, maxSide = 256)
      .filter($"out_w" > 256 || $"out_h" > 256).count()
    assert(bad == 0)
  }
}
