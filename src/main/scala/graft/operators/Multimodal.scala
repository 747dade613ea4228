package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata, and decode / feature-extract / resize / frame-sample run
  * as partition-batched transforms (the Scala analogue of PySpark's
  * `mapInPandas`: one iterator per partition, vectorizable batches, no
  * per-row driver round-trips).
  *
  * The actual codecs are NOT available in this environment, so the
  * decode kernels are STUBS — `decodeReal` is left `???` and the
  * shipped path uses a deterministic fake (content-hash-seeded
  * features). Everything around the stub — schema contract, encoder,
  * partition batching, feature shapes, null/corrupt-byte handling — is
  * real and tested, so swapping in a JNI/JavaCV decoder changes one
  * function.
  *
  * Scale: media rows are large (MBs); the row-size, not row-count,
  * drives partitioning — repartition to keep partitions ≲128 MB of
  * payload, process with mapPartitions (no shuffle), write features
  * columnar and DROP the bytes column as early as possible so
  * downstream plans never carry blobs.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))), nullable = true)))

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, n_frames: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  /** Deterministic synthetic media table (testdata ships no binary
    * table): payload bytes derived from the id via repeated md5. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      // ~1KB deterministic payload: md5 chain of the id
      unhex(concat((0 until 32).map(i =>
        md5(concat(col("id").cast("string"), lit(s":$i")))): _*)).as("bytes"),
      struct(
        (col("id") % 640 + 32).cast("int").as("width"),
        (col("id") % 480 + 32).cast("int").as("height"),
        (col("id") % 120 + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  /** Binary-column metadata profile, oracle-gated (q97): per media
    * kind, byte totals, leading-magic-byte cardinality, and a
    * fingerprint range over the OPAQUE payload — the corpus-profiling
    * pass a media lake runs before any decode. Every operation is on
    * the binary column itself (`length`, `substring`, `hex`, `md5` —
    * codegen'd, scan-local); the group-by shuffles only per-kind
    * aggregate rows, never blobs. DuckDB has no BLOB md5/substring, so
    * the oracle hashes the lowercase-hex form — which Spark reproduces
    * with `lower(hex(bytes))`, pinning the binary path end to end. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    syntheticMedia(spark, 500)
      .select(col("kind"), col("bytes"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(length(col("bytes")).cast("long")).as("total_bytes"),
        countDistinct(lower(hex(substring(col("bytes"), 1, 2))))
          .as("n_prefixes"),
        min(md5(lower(hex(col("bytes"))))).as("min_fp"),
        max(md5(lower(hex(col("bytes"))))).as("max_fp"))
      .orderBy("kind")

  /** The real decoder — environment-dependent (libjpeg/ffmpeg et al are
    * not in this container). Deliberately unimplemented. */
  def decodeReal(kind: String, bytes: Array[Byte]): Array[Float] = ???

  /** Deterministic fake decode: folds the payload into `dim` float
    * buckets. Stands in for decodeReal so the pipeline shape is
    * exercisable end-to-end. */
  def decodeFake(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
    }
    acc
  }

  /** Partition-batched feature extraction (the mapInPandas analogue):
    * one pass per partition, corrupt/null payloads yield an empty
    * feature (never a task failure), bytes dropped from the output. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"),
      col("meta.width"), col("meta.height"), col("meta.n_frames"),
      col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val nb = if (r.bytes == null) 0 else r.bytes.length
          MediaFeatures(r.media_id, r.kind, nb, decodeFake(r.bytes, dim))
        }
      }
  }

  /** Frame sampling for video rows: pick every k-th frame index up to
    * n_frames (pure metadata math — the real frame grab lives behind
    * the same decode stub). */
  def sampleFrames(media: DataFrame, everyK: Int = 10): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))
          .as("frame_indices"))

  /** Resize plan for image rows: target box with aspect preserved —
    * metadata-only here; the pixel op is the stubbed kernel. */
  def resizePlan(media: DataFrame, maxSide: Int = 256): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        least(lit(1.0),
          lit(maxSide.toDouble) / greatest(col("meta.width"), col("meta.height")))
          .as("scale"))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
}
