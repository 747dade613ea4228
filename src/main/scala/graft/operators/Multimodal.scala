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
  * Decode is REAL for the formats the bare JDK can handle —
  * `javax.imageio` images (PNG/BMP/GIF/JPEG) and RIFF/WAVE PCM16 audio
  * via direct header math ([[decodeReal]]) — and falls back to a
  * deterministic fake ([[decodeFake]]) for everything else (video needs
  * ffmpeg/JavaCV, not present in this container; that fallback is the
  * one seam a native decoder plugs into). Corrupt or truncated payloads
  * degrade to the fallback per-row, never a task failure.
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

  /** Real pure-JVM decode. Images go through `javax.imageio` (PNG, BMP,
    * GIF and JPEG decoders ship inside the JDK — no native codecs
    * needed); audio is a direct RIFF/WAVE chunk parse + PCM16 fold. Both
    * produce a `dim`-bucket float feature: mean luminance per pixel
    * stripe for images, mean |amplitude| per sample stripe for audio.
    * Video has no in-JDK codec, so it reports undecodable here and
    * callers fall back to [[decodeFake]] — the documented seam where a
    * JavaCV/ffmpeg decoder plugs in.
    *
    * Returns None for corrupt, truncated, unsupported or null payloads —
    * NEVER throws, so a bad blob degrades one row, not a task. */
  def decodeReal(kind: String, bytes: Array[Byte], dim: Int = 64): Option[Array[Float]] =
    try {
      if (bytes == null || bytes.isEmpty) None
      else kind match {
        case "image" => decodeImage(bytes, dim)
        case "audio" => decodeWav(bytes, dim)
        case _ => None // video: no pure-JVM codec in this environment
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return None // ImageIO signals unknown format with null
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    // bounded work per row: sample at most max(64, dim) pixels per axis
    // regardless of image size (media rows are MBs; the feature pass
    // must stay O(1)) — tied to dim so every requested bucket can
    // receive samples even when dim > 64
    val grid = math.max(64, dim)
    val (sx, sy) = (math.max(1, w / grid), math.max(1, h / grid))
    val acc = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000f / 255f
        val b = (x.toLong * dim / w).toInt // column-stripe bucket
        acc(b) += lum
        cnt(b) += 1
        x += sx
      }
      y += sy
    }
    var k = 0
    while (k < dim) { if (cnt(k) > 0) acc(k) /= cnt(k); k += 1 }
    Some(acc)
  }

  /** RIFF/WAVE parse: validates the RIFF/WAVE magic, walks the chunk
    * list to `fmt ` (must be PCM16) and `data`, then folds samples into
    * `dim` mean-|amplitude| buckets normalized to [0, 1]. */
  private def decodeWav(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= bytes.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def le32(off: Int): Int =
      le16(off) | (le16(off + 2) << 16)
    if (bytes.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None // truncated
      if (ascii(off, "fmt ") && size >= 16)
        fmtOk = le16(off + 8) == 1 && le16(off + 22) == 16 // PCM, 16-bit
      else if (ascii(off, "data")) { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) return None
    val n = dataLen / 2
    val acc = new Array[Float](dim)
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val s = le16(dataOff + 2 * i).toShort
      acc((i.toLong * dim / n).toInt) += math.abs(s.toInt) / 32768f
      cnt((i.toLong * dim / n).toInt) += 1
      i += 1
    }
    var k = 0
    while (k < dim) { if (cnt(k) > 0) acc(k) /= cnt(k); k += 1 }
    Some(acc)
  }

  /** Container-header dimension parse — the REAL decode step a media
    * lake runs on ingest (width/height gate long before any pixel
    * decode): a spec-compliant walk of PNG chunk lists and JPEG marker
    * segments, pure JVM, no codec library. Returns None for anything
    * that is not a well-formed PNG/JPEG prefix — corrupt rows degrade,
    * never throw. Cross-checked against `ImageIO`-written real files in
    * MultimodalSpec. */
  def headerDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (be16(i).toLong << 16 | be16(i + 2)).toInt
    val isPng = bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e && u8(3) == 0x47 &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a
    if (isPng) {
      // walk the chunk list to IHDR (spec: first chunk, but walk anyway —
      // a parser that assumes offset 16 is layout-matching, not parsing)
      var off = 8
      while (off + 8 <= bytes.length) {
        val len = be32(off)
        if (len < 0) return None
        val isIhdr = u8(off + 4) == 'I' && u8(off + 5) == 'H' &&
          u8(off + 6) == 'D' && u8(off + 7) == 'R'
        if (isIhdr)
          return if (len >= 8 && off + 16 <= bytes.length)
            Some((be32(off + 8), be32(off + 12)))
          else None
        if (off + 12L + len > bytes.length) return None
        off += 12 + len // length + type + payload + crc
      }
      None
    } else if (u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn (C0–CF minus the
      // non-frame C4/C8/CC); dims sit at precision+1 in its payload
      var off = 2
      while (off + 4 <= bytes.length) {
        if (u8(off) != 0xff) return None
        val m = u8(off + 1)
        if (m == 0xff) off += 1 // legal fill byte: FF+ precedes the code
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2 // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before SOF
        else {
          val len = be16(off + 2)
          if (len < 2 || off + 2L + len > bytes.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof)
            return if (len >= 7) Some((be16(off + 7), be16(off + 5)))
            else None
          off += 2 + len
        }
      }
      None
    } else None
  }

  /** Deterministic synthetic image-header corpus: every row carries a
    * payload whose PREFIX is a well-formed PNG (even ids) or JPEG (odd
    * ids) header with dimensions derived from the id, followed by
    * deterministic non-image garbage (md5 chain) standing in for the
    * compressed pixel data. JPEG rows vary their APP0 length with the id
    * and ids ≡ 0 (mod 3) insert a COM segment before the SOF marker, so
    * a fixed-offset reader cannot fake the parse; ids ≡ 0 (mod 17)
    * truncate to 10 bytes (corrupt-row degradation). The same bytes are
    * constructible in ANSI SQL (hex-string concat), which is what makes
    * the header parse oracle-able end to end. */
  def syntheticHeaderMedia(spark: SparkSession, n: Int): DataFrame = {
    val df = spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("png"), lit("jpeg")), (col("id") % 2 + 1).cast("int"))
        .as("kind"),
      (col("id") * 31 % 613 + 16).cast("int").as("w"),
      (col("id") * 17 % 401 + 16).cast("int").as("h"),
      (col("id") % 8 + 16).cast("int").as("l0"),   // APP0 segment length
      (col("id") % 5 + 8).cast("int").as("lc"))    // COM segment length
    val idStr = col("media_id").cast("string")
    val garbage = md5(concat(idStr, lit(":g")))
    val pngHex = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), lit("49484452"), // IHDR length + type
      lpad(hex(col("w")), 8, "0"), lpad(hex(col("h")), 8, "0"),
      lit("0806000000"), // bit depth, color type, compression/filter/interlace
      substring(md5(concat(idStr, lit(":crc"))), 1, 8), // stand-in CRC
      garbage)
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE0"), lpad(hex(col("l0")), 4, "0"),
      expr("repeat('00', l0 - 2)"), // APP0, variable length
      when(col("media_id") % 3 === 0,
        concat(lit("FFFE"), lpad(hex(col("lc")), 4, "0"),
          expr("repeat('00', lc - 2)"))).otherwise(lit("")), // optional COM
      lit("FFC0"), lit("0011"), lit("08"), // SOF0, length 17, precision 8
      lpad(hex(col("h")), 4, "0"), lpad(hex(col("w")), 4, "0"),
      lit("03"), lit("012200"), lit("021101"), lit("031101"), // 3 components
      garbage)
    val full = unhex(when(col("kind") === "png", pngHex).otherwise(jpegHex))
    df.select(col("media_id"), col("kind"),
      when(col("media_id") % 17 === 0, substring(full, 1, 10)).otherwise(full)
        .as("bytes"))
  }

  /** q156: decoded header dimensions over the synthetic corpus — the
    * REAL `media_meta` (q97 profiles the opaque bytes; this one reads
    * them). The parse runs scan-local inside one mapPartitions (the
    * partition-batched kernel pattern of [[extractFeatures]]); the only
    * shuffle is the output ORDER BY. Unparseable payloads yield -1/-1
    * (a sentinel, not NULL — NULL widths would downgrade both engines'
    * int columns to floats under the driver's pandas compare). */
  def mediaHeaderDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticHeaderMedia(spark, 500)
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val dims = headerDims(bytes)
          (id, kind, if (bytes == null) 0 else bytes.length,
            dims.map(_._1).getOrElse(-1), dims.map(_._2).getOrElse(-1))
        }
      }
      .toDF("media_id", "kind", "n_bytes", "width", "height")
      .orderBy("media_id")
  }

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
    * one pass per partition; each row tries the real decoder first and
    * degrades to the deterministic fake when the payload isn't a format
    * the JDK can decode (corrupt/null bytes yield an empty feature) —
    * never a task failure. Bytes are dropped from the output so no
    * downstream plan carries blobs. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"),
      col("meta.width"), col("meta.height"), col("meta.n_frames"),
      col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val nb = if (r.bytes == null) 0 else r.bytes.length
          val feat = decodeReal(r.kind, r.bytes, dim)
            .getOrElse(decodeFake(r.bytes, dim))
          MediaFeatures(r.media_id, r.kind, nb, feat)
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

  /** q198: media corpus card — the multimodal sibling of the
    * per-source text card (q180): per container format, item and byte
    * volume, the CORRUPT share (payloads the real header walk of q156
    * refuses to decode — the ingest-health number a media pipeline
    * alarms on), and the decoded dimension envelope (mean/max W×H,
    * the resize/batch-shape planning input). Rides q156's scan-local
    * decode unchanged; everything reduces to format grain with
    * map-side combine — integer sums only, so the means are exact
    * (sum/count) under any partitioning. */
  def mediaCard(spark: SparkSession, dir: String): DataFrame = {
    val d = mediaHeaderDims(spark, dir)
    val ok = col("width") =!= -1
    d.groupBy("kind").agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(when(!ok, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(ok, col("width").cast("long")).otherwise(0L)).as("sw"),
        sum(when(ok, col("height").cast("long")).otherwise(0L)).as("sh"),
        max("width").as("max_w"), max("height").as("max_h"))
      .select(col("kind"), col("n_items"), col("total_bytes"),
        col("n_corrupt"),
        (col("n_corrupt").cast("double") / col("n_items"))
          .as("corrupt_rate"),
        (col("sw").cast("double") / (col("n_items") - col("n_corrupt")))
          .as("mean_w"),
        (col("sh").cast("double") / (col("n_items") - col("n_corrupt")))
          .as("mean_h"),
        col("max_w"), col("max_h"))
      .orderBy("kind")
  }

  /** Deterministic synthetic ISO-BMFF (MP4) corpus: every row is a
    * spec-shaped box sequence `ftyp [free] moov(mvhd) mdat` with
    * big-endian size+fourcc headers — timescale/duration live inside
    * moov→mvhd exactly where ISO/IEC 14496-12 puts them (version-0
    * layout). Ids ≡ 0 (mod 3) insert a variable-length `free` box
    * before moov and mdat's payload length varies with the id, so a
    * fixed-offset reader cannot fake the walk; ids ≡ 0 (mod 17)
    * truncate to 10 bytes (corrupt-row degradation). Hex-concat
    * construction keeps the corpus constructible in ANSI SQL — the
    * oracle re-walks the SAME bytes from the string. */
  def syntheticMp4Media(spark: SparkSession, n: Int): DataFrame = {
    val df = spark.range(n.toLong).select(
      col("id").as("media_id"),
      (col("id") * 7 % 900 + 100).cast("int").as("ts"),
      (col("id") * 13 % 100000 + 1000).cast("int").as("dur"),
      (col("id") % 11).cast("int").as("fl"),   // free-box payload bytes
      (col("id") % 37).cast("int").as("mp"))   // mdat pad bytes
    val idStr = col("media_id").cast("string")
    val matrixHex = "000100000000000000000000" +
      "000000000001000000000000" + "000000000000000040000000"
    val mvhdHex = concat(
      lit("0000006C"), lit("6D766864"), // size 108, 'mvhd'
      lit("00000000"),                  // version 0 + flags
      lit("00000000"), lit("00000000"), // ctime, mtime
      lpad(hex(col("ts")), 8, "0"), lpad(hex(col("dur")), 8, "0"),
      lit("00010000"), lit("0100"),     // rate 1.0, volume 1.0
      lit(("00" * 10) + matrixHex + ("00" * 24)), // reserved+matrix+predef
      lit("00000002"))                  // next_track_id
    val freeHex = when(col("media_id") % 3 === 0,
      concat(lpad(hex(col("fl") + 8), 8, "0"), lit("66726565"),
        expr("repeat('00', fl)"))).otherwise(lit(""))
    val mdatHex = concat(
      lpad(hex(col("mp") + 24), 8, "0"), lit("6D646174"), // 8 hdr + 16 md5
      expr("repeat('00', mp)"), md5(concat(idStr, lit(":g"))))
    val fullHex = concat(
      lit("0000001466747970" + "69736F6D" + "00000200" + "69736F6D"),
      freeHex,
      lit("000000746D6F6F76"), mvhdHex, // moov = 8 + 108
      mdatHex)
    df.select(col("media_id"),
      when(col("media_id") % 17 === 0, substring(unhex(fullHex), 1, 10))
        .otherwise(unhex(fullHex)).as("bytes"))
  }

  /** q242: the ISO-BMFF box WALK — video-container metadata extraction
    * without a decoder (the ffprobe subset a media ingest actually
    * needs before deciding what to transcode): top-level boxes
    * enumerate by size+fourcc, moov descends to mvhd for
    * timescale/duration (version-0 offsets), mdat reports payload
    * volume, and duration_ms derives by integer division. Malformed
    * payloads (truncated mid-box, bad fourcc, size out of range)
    * yield -1 sentinels — the corrupt-share input to the media card.
    * The parse is scan-local in one mapPartitions; the only shuffle
    * is the output ORDER BY. */
  def mp4BoxWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticMp4Media(spark, 500)
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        def be32(i: Int): Long =
          ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
            ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
        def fourcc(i: Int): String =
          new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        var off = 0
        var nBoxes = 0
        var hasFree = false
        var mdatBytes = -1L
        var timescale = -1L
        var duration = -1L
        var ok = true
        while (ok && off < bytes.length) {
          if (off + 8 > bytes.length) ok = false
          else {
            val size = be32(off)
            if (size < 8 || off + size > bytes.length) ok = false
            else {
              nBoxes += 1
              fourcc(off) match {
                case "free" => hasFree = true
                case "mdat" => mdatBytes = size - 8
                case "moov" =>
                  // first child must be mvhd, version 0
                  if (size >= 8 + 32 && fourcc(off + 8) == "mvhd" &&
                      bytes(off + 16) == 0) {
                    timescale = be32(off + 28)
                    duration = be32(off + 32)
                  } else ok = false
                case "ftyp" => ()
                case _ => ok = false
              }
              off += size.toInt
            }
          }
        }
        if (!ok || timescale <= 0 || mdatBytes < 0)
          (id, bytes.length, -1, false, -1L, -1L, -1L, -1L)
        else
          (id, bytes.length, nBoxes, hasFree, mdatBytes, timescale,
            duration, duration * 1000L / timescale)
      })
      .toDF("media_id", "n_bytes", "n_boxes", "has_free", "mdat_bytes",
        "timescale", "duration", "dur_ms")
      .orderBy("media_id")
  }

  /** ASCII → hex pairs (generator constants). */
  private def hx(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .map(b => f"$b%02X").mkString

  /** Byte sum of the fixed (name/size-independent) POSIX ustar header
    * fields, with the chksum field counted as 8 spaces per the spec:
    * mode+uid+gid (octal ASCII, NUL-terminated), mtime (11 octal
    * digits + space), typeflag '0', magic "ustar\0", version "00".
    * Used by the generator's analytic checksum; the WALKER re-derives
    * the sum from the raw 512 bytes, so a wrong constant here fails
    * the gate loudly. */
  private[graft] val TarFixedSum: Int =
    ("0000644\u0000" + "0000000\u0000" + "0000000\u0000" +
      "00000000000 " + "        " + "0" + "ustar\u0000" + "00")
      .map(_.toInt).sum

  /** Deterministic synthetic POSIX-ustar (tar) shard corpus — the
    * WebDataset packaging shape: each shard holds 2–4 members named
    * `s<shard>/d<j>.<ext>`, sizes 0–199 bytes, payload = repeated md5
    * hex of "shard:j", data blocks NUL-padded to the 512 boundary,
    * two zero trailer blocks. Header fields are spec-placed (name@0,
    * size@124 as 11-digit octal + space, chksum@148 as 6-digit octal
    * + NUL + space over the header with chksum spaces, typeflag@156,
    * magic "ustar\0" @257). Shards ≡ 0 (mod 17) truncate to 100
    * bytes (mid-header) for the degradation path. Hex-concat
    * construction keeps the corpus reproducible in ANSI SQL. */
  def syntheticTarShards(spark: SparkSession, n: Int): DataFrame = {
    val mem = spark.range(n.toLong).select(col("id").as("sid"))
      .select(col("sid"),
        explode(sequence(lit(0L), col("sid") % 3 + 1)).as("j"))
      .withColumn("name",
        concat(lit("s"), col("sid").cast("string"),
          lit("/d"), col("j").cast("string"), lit("."),
          element_at(array(lit("txt"), lit("json"), lit("jpg")),
            (col("j") % 3 + 1).cast("int"))))
      .withColumn("sz", (col("sid") * 31 + col("j") * 17) % 200)
      // 11-digit zero-padded octal size: sz < 512 → only the last
      // three octal digits can be non-zero
      .withColumn("d2", expr("sz div 64 % 8"))
      .withColumn("d1", expr("sz div 8 % 8"))
      .withColumn("d0", expr("sz % 8"))
      .withColumn("oct11", concat(lit("00000000"),
        col("d2").cast("string"), col("d1").cast("string"),
        col("d0").cast("string")))
      .withColumn("namesum", expr(
        "aggregate(transform(sequence(1, length(name))," +
          " i -> ascii(substring(name, i, 1))), 0, (acc, x) -> acc + x)"))
      // checksum = fixed fields + size field (11 '0'-based digits +
      // space) + name bytes
      .withColumn("chk",
        lit(TarFixedSum + 32 + 11 * 48L) + col("d2") + col("d1") +
          col("d0") + col("namesum"))
      .withColumn("oct6", concat(
        expr("cast(chk div 32768 % 8 as string)"),
        expr("cast(chk div 4096 % 8 as string)"),
        expr("cast(chk div 512 % 8 as string)"),
        expr("cast(chk div 64 % 8 as string)"),
        expr("cast(chk div 8 % 8 as string)"),
        expr("cast(chk % 8 as string)")))
    val headerHex = concat(
      rpad(hex(col("name")), 200, "0"),              // name[100]
      lit(hx("0000644\u0000")),                      // mode[8]
      lit(hx("0000000\u0000")),                      // uid[8]
      lit(hx("0000000\u0000")),                      // gid[8]
      hex(col("oct11")), lit("20"),                  // size[12]
      lit(hx("00000000000 ")),                       // mtime[12]
      hex(col("oct6")), lit("0020"),                 // chksum[8]
      lit("30"),                                     // typeflag '0'
      lit("00" * 100),                               // linkname[100]
      lit(hx("ustar") + "00"),                       // magic[6]
      lit(hx("00")),                                 // version[2]
      lit("00" * 247))                               // uname..pad[247]
    val blockHex = concat(headerHex,
      expr("substr(repeat(md5(concat(cast(sid as string), ':'," +
        " cast(j as string))), 13), 1, cast(sz * 2 as int))"),
      expr("repeat('00', cast(case when sz = 0 then 0" +
        " else 512 - sz end as int))"))
    mem.withColumn("block", blockHex)
      .groupBy("sid")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(j, block)))," +
          " x -> x.block)"), "").as("body"))
      .select(col("sid").as("shard_id"),
        when(col("sid") % 17 === 0,
          substring(unhex(concat(col("body"), lit("00" * 1024))), 1, 100))
          .otherwise(unhex(concat(col("body"), lit("00" * 1024))))
          .as("bytes"))
  }

  /** q289: the tar member WALK — WebDataset-style shard indexing
    * without extraction (the listing a multimodal loader builds once
    * per shard so training reads members by offset): sequential
    * 512-byte ustar headers, name up to NUL, octal size field, magic/
    * typeflag validation, CHECKSUM verification (byte sum with the
    * chksum field as spaces), data offset accounting with 512-padding,
    * and the two-zero-block end-of-archive test. Malformed shards
    * (truncated mid-header, bad magic, checksum mismatch, garbage
    * trailer) yield one -1-sentinel row. Each member row carries the
    * hex of its first 8 payload bytes, read from the computed offset —
    * so the gate pins the offset arithmetic against the oracle's
    * analytic layout, not just the header decode.
    *
    * Scan-local in one mapPartitions (shards are independent); the
    * only shuffle is the output ORDER BY. At 100 TB the walk runs
    * where the shard bytes already live and emits the byte-range
    * index that makes member reads seekable. */
  def tarMemberWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticTarShards(spark, 500)
      .select(col("shard_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sid, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, String, Long, Long, String)]
        def corrupt = Seq((sid, -1, "", -1L, -1L, ""))
        def zeroBlock(off: Int): Boolean = {
          var i = off; var z = true
          while (z && i < off + 512) { if (bytes(i) != 0) z = false; i += 1 }
          z
        }
        var off = 0
        var ok = true
        var done = false
        var idx = 0
        while (ok && !done) {
          if (off + 512 > bytes.length) ok = false
          else if (zeroBlock(off)) {
            // end-of-archive: exactly one more zero block
            done = bytes.length == off + 1024 && zeroBlock(off + 512)
            ok = done
          } else {
            // name: bytes to first NUL within 100
            var ne = off
            while (ne < off + 100 && bytes(ne) != 0) ne += 1
            val name = new String(bytes, off, ne - off,
              java.nio.charset.StandardCharsets.US_ASCII)
            // size: octal digits at 124, up to space/NUL
            var sz = 0L; var si = off + 124; var szOk = true
            while (szOk && si < off + 136 && bytes(si) != 0 &&
                bytes(si) != ' ') {
              val c = bytes(si)
              if (c < '0' || c > '7') szOk = false
              else { sz = sz * 8 + (c - '0'); si += 1 }
            }
            // magic + version + typeflag
            val magic = new String(bytes, off + 257, 5,
              java.nio.charset.StandardCharsets.US_ASCII)
            val magicOk = magic == "ustar" && bytes(off + 262) == 0 &&
              bytes(off + 263) == '0' && bytes(off + 264) == '0' &&
              bytes(off + 156) == '0'
            // checksum: parse field, re-sum header with field as spaces
            var chkParsed = 0L; var ci = off + 148; var chkOk = true
            while (chkOk && ci < off + 156 && bytes(ci) != 0 &&
                bytes(ci) != ' ') {
              val c = bytes(ci)
              if (c < '0' || c > '7') chkOk = false
              else { chkParsed = chkParsed * 8 + (c - '0'); ci += 1 }
            }
            var sum = 0L
            var bi = off
            while (bi < off + 512) {
              sum += (if (bi >= off + 148 && bi < off + 156) 32
                      else bytes(bi) & 0xff)
              bi += 1
            }
            val pad = if (sz == 0) 0L else ((sz + 511) / 512) * 512
            if (!szOk || !magicOk || !chkOk || sum != chkParsed ||
                off + 512 + pad > bytes.length) ok = false
            else {
              val dataOff = off + 512L
              val headLen = math.min(8L, sz).toInt
              val head = (0 until headLen)
                .map(i => f"${bytes(dataOff.toInt + i)}%02X").mkString
              out += ((sid, idx, name, sz, dataOff, head))
              idx += 1
              off += (512 + pad).toInt
            }
          }
        }
        if (ok) out else corrupt
      })
      .toDF("shard_id", "member_idx", "name", "size_bytes",
        "data_offset", "payload_head")
      .orderBy("shard_id", "member_idx")
  }

  /** q302's synthetic ZIP shard corpus — the same member population as
    * the tar shards (names, sizes, md5-stream payloads, every 17th
    * shard truncated) laid out as REAL PKZIP bytes: per-member local
    * file headers (stored method, true CRC-32 over the payload),
    * a central directory whose entries carry the local-header
    * offsets, and the end-of-central-directory record. Generated in a
    * deterministic scan-local kernel (CRC-32 has no SQL closed form —
    * the oracle re-derives the LISTING from the generator's
    * parameters and the walker must agree after validating the CRCs
    * itself). */
  def syntheticZipShards(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { sid =>
        val nm = (sid % 3 + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        def le2(v: Int): Unit = {
          bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        }
        def le4(v: Long): Unit = {
          var i = 0
          while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
        }
        val names = (0 until nm).map(j => s"s$sid/d$j." +
          (j % 3 match { case 0 => "txt"; case 1 => "json"; case _ => "jpg" }))
        val sizes = (0 until nm).map(j => ((sid * 31 + j * 17) % 200).toInt)
        def payload(j: Int, sz: Int): Array[Byte] = {
          md.reset()
          val h = md.digest(s"$sid:$j".getBytes("US-ASCII"))
            .map(b => f"$b%02x").mkString
          (h * 13).substring(0, sz * 2).grouped(2)
            .map(s => Integer.parseInt(s, 16).toByte).toArray
        }
        val locals = new Array[Int](nm)
        val crcs = new Array[Long](nm)
        (0 until nm).foreach { j =>
          locals(j) = bos.size()
          val nb = names(j).getBytes("US-ASCII")
          val pl = payload(j, sizes(j))
          val c = new java.util.zip.CRC32(); c.update(pl)
          crcs(j) = c.getValue
          le4(0x04034b50L); le2(20); le2(0); le2(0); le2(0); le2(0x0021)
          le4(crcs(j)); le4(sizes(j).toLong); le4(sizes(j).toLong)
          le2(nb.length); le2(0)
          bos.write(nb); bos.write(pl)
        }
        val cdOff = bos.size()
        (0 until nm).foreach { j =>
          val nb = names(j).getBytes("US-ASCII")
          le4(0x02014b50L); le2(20); le2(20); le2(0); le2(0); le2(0)
          le2(0x0021)
          le4(crcs(j)); le4(sizes(j).toLong); le4(sizes(j).toLong)
          le2(nb.length); le2(0); le2(0); le2(0); le2(0); le4(0L)
          le4(locals(j).toLong)
          bos.write(nb)
        }
        val cdSize = bos.size() - cdOff
        le4(0x06054b50L); le2(0); le2(0); le2(nm); le2(nm)
        le4(cdSize.toLong); le4(cdOff.toLong); le2(0)
        val full = bos.toByteArray
        val bytes =
          if (sid % 17 == 0) java.util.Arrays.copyOf(full, 100)
          else full
        (sid, bytes)
      }
    }.toDF("shard_id", "bytes")
  }

  /** q302 — ZIP / OOXML-class central-directory walk, the random-
    * access sibling of the q289 sequential tar walk (a WebDataset
    * reader streams; a zip reader SEEKS — EOCD from the tail, then
    * the central directory, then each member's local header): locate
    * the end-of-central-directory by the spec's backward scan
    * (signature + self-consistent comment length), walk the central
    * directory entries, CROSS-CHECK each against its local file
    * header (signature, name), recompute the payload's CRC-32 against
    * the stored field, and emit the member listing with true data
    * offsets. Any structural break — no EOCD (the truncated shards),
    * bad signature, offset past the buffer, CRC mismatch — yields the
    * sentinel row, q289's degradation contract.
    *
    * Scale: one scan-local kernel pass; each shard's walk is
    * independent and allocation-light. */
  def zipMemberWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticZipShards(spark, 500)
      .select(col("shard_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sid, bytes) =>
        walkZip(sid, bytes)
      })
      .toDF("shard_id", "member_idx", "name", "size_bytes",
        "data_offset", "payload_head", "crc_ok")
      .orderBy("shard_id", "member_idx")
  }

  /** The per-shard zip walk kernel — package-visible so the spec can
    * drive it directly with tampered bytes. */
  private[graft] def walkZip(sid: Long, bytes: Array[Byte])
      : Seq[(Long, Int, String, Long, Long, String, Boolean)] = {
    {
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, String, Long, Long, String, Boolean)]
        def corrupt = Seq((sid, -1, "", -1L, -1L, "", false))
        def u16(o: Int): Int =
          (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
        def u32(o: Int): Long = {
          var v = 0L; var i = 3
          while (i >= 0) { v = (v << 8) | (bytes(o + i) & 0xff); i -= 1 }
          v
        }
        // EOCD: backward scan (max comment 65535), sig + the comment
        // length must land exactly on the buffer end
        var eocd = -1
        var p = bytes.length - 22
        val floorP = math.max(0, bytes.length - 22 - 65535)
        while (eocd < 0 && p >= floorP) {
          if (bytes(p) == 0x50 && bytes(p + 1) == 0x4b &&
              bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06 &&
              p + 22 + u16(p + 20) == bytes.length) eocd = p
          p -= 1
        }
        if (eocd < 0) corrupt
        else {
          val nEntries = u16(eocd + 10)
          val cdOff = u32(eocd + 16).toInt
          val cdSize = u32(eocd + 12).toInt
          var off = cdOff
          var ok = cdOff + cdSize <= eocd
          var idx = 0
          while (ok && idx < nEntries) {
            if (off + 46 > eocd || u32(off) != 0x02014b50L) ok = false
            else {
              val crc = u32(off + 16)
              val csize = u32(off + 20)
              val usize = u32(off + 24)
              val nameLen = u16(off + 28)
              val extraLen = u16(off + 30)
              val commentLen = u16(off + 32)
              val method = u16(off + 10)
              val localOff = u32(off + 42).toInt
              if (off + 46 + nameLen > eocd || method != 0 ||
                  csize != usize || localOff + 30 > bytes.length)
                ok = false
              else {
                val name = new String(bytes, off + 46, nameLen,
                  java.nio.charset.StandardCharsets.US_ASCII)
                val lNameLen = u16(localOff + 26)
                val lExtraLen = u16(localOff + 28)
                val dataOff = localOff + 30 + lNameLen + lExtraLen
                val lName =
                  if (localOff + 30 + lNameLen <= bytes.length)
                    new String(bytes, localOff + 30, lNameLen,
                      java.nio.charset.StandardCharsets.US_ASCII)
                  else ""
                if (u32(localOff) != 0x04034b50L || lName != name ||
                    dataOff + usize > bytes.length) ok = false
                else {
                  val c = new java.util.zip.CRC32()
                  c.update(bytes, dataOff, usize.toInt)
                  if (c.getValue != crc) ok = false
                  else {
                    val headLen = math.min(8L, usize).toInt
                    val head = (0 until headLen)
                      .map(i => f"${bytes(dataOff + i)}%02X").mkString
                    out += ((sid, idx, name, usize, dataOff.toLong,
                      head, true))
                    idx += 1
                    off += 46 + nameLen + extraLen + commentLen
                  }
                }
              }
            }
          }
          if (ok && idx == nEntries) out.toSeq else corrupt
        }
    }
  }

  /** q318's synthetic WARC shard corpus — the SAME member population
    * as the tar/zip shards (per-shard record counts, md5-stream
    * payloads, every 17th shard truncated) laid out as uncompressed
    * WARC/1.0 records: CRLF-terminated named headers
    * (WARC-Type/WARC-Target-URI/WARC-Date/Content-Length), a blank
    * line, `Content-Length` payload bytes, and the mandatory
    * double-CRLF record separator. Pure SQL expressions end to end
    * (hex-assembled like the tar generator), so the oracle can
    * re-derive the listing from the closed form. */
  def syntheticWarcShards(spark: SparkSession, n: Int): DataFrame = {
    val mem = spark.range(n.toLong).select(col("id").as("sid"))
      .select(col("sid"),
        explode(sequence(lit(0L), col("sid") % 3 + 1)).as("j"))
      .withColumn("uri",
        concat(lit("http://ex.com/s"), col("sid").cast("string"),
          lit("/p"), col("j").cast("string")))
      .withColumn("sz", (col("sid") * 37 + col("j") * 19) % 300)
      .withColumn("hdr", concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        col("uri"),
        lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
        col("sz").cast("string"), lit("\r\n\r\n")))
      .withColumn("recHex", concat(hex(col("hdr")),
        expr("substr(repeat(md5(concat(cast(sid as string), ':'," +
          " cast(j as string))), 19), 1, cast(sz * 2 as int))"),
        lit(hx("\r\n\r\n"))))
    mem.groupBy("sid")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(j, recHex)))," +
          " x -> x.recHex)"), "").as("body"))
      .select(col("sid").as("shard_id"),
        when(col("sid") % 17 === 0,
          substring(unhex(col("body")), 1, 50))
          .otherwise(unhex(col("body"))).as("bytes"))
  }

  /** q318 — the WARC record WALK: the container format the web-crawl
    * corpus world actually ships (Common Crawl's carrier), completing
    * the shard-walk family next to tar q289 (offset streams), zip
    * q302 (central directory), mp4 q242 (box tree). The walker is a
    * real parser: version line, CRLF header block with named-field
    * extraction, Content-Length-driven payload skip, the double-CRLF
    * separator check, and exact end-of-shard accounting; any
    * violation (truncation, bad version, missing/non-numeric length,
    * broken separator) degrades the shard to one -1-sentinel row.
    * Each record row carries the hex of its first 8 payload bytes
    * read from the computed offset, so the gate pins the offset
    * arithmetic, not just the header decode.
    *
    * Scan-local in one mapPartitions (shards independent); the only
    * shuffle is the output ORDER BY — at 100 TB the walk runs where
    * the crawl bytes live and emits the seekable record index. */
  def warcRecordWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticWarcShards(spark, 500)
      .select(col("shard_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (sid, bytes) =>
        warcWalk(sid, bytes) })
      .toDF("shard_id", "record_idx", "warc_type", "target_uri",
        "content_length", "payload_head")
      .orderBy("shard_id", "record_idx")
  }

  /** The q318 walker kernel, callable on raw bytes (spec surface). */
  private[graft] def warcWalk(sid: Long, bytes: Array[Byte])
      : Seq[(Long, Int, String, String, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, String, Long, String)]
    def corrupt = Seq((sid, -1, "", "", -1L, ""))
    // reads one CRLF-terminated line; None on truncation
    def line(off: Int): Option[(String, Int)] = {
      var i = off
      while (i + 1 < bytes.length &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else Some((new String(bytes, off, i - off,
        java.nio.charset.StandardCharsets.US_ASCII), i + 2))
    }
    var off = 0
    var ok = true
    var idx = 0
    while (ok && off < bytes.length) {
      line(off) match {
        case Some(("WARC/1.0", afterVersion)) =>
          var p = afterVersion
          var wtype = ""; var uri = ""; var len = -1L
          var headersOk = true
          var blank = false
          while (headersOk && !blank) {
            line(p) match {
              case Some(("", np)) => blank = true; p = np
              case Some((l, np)) =>
                val c = l.indexOf(": ")
                if (c <= 0) headersOk = false
                else {
                  val (k, v) = (l.substring(0, c), l.substring(c + 2))
                  k match {
                    case "WARC-Type" => wtype = v
                    case "WARC-Target-URI" => uri = v
                    case "Content-Length" =>
                      if (v.nonEmpty && v.forall(_.isDigit))
                        len = v.toLong
                      else headersOk = false
                    case _ => ()
                  }
                  p = np
                }
              case None => headersOk = false
            }
          }
          if (!headersOk || len < 0 ||
              p + len + 4 > bytes.length ||
              bytes(p + len.toInt) != '\r' ||
              bytes(p + len.toInt + 1) != '\n' ||
              bytes(p + len.toInt + 2) != '\r' ||
              bytes(p + len.toInt + 3) != '\n') ok = false
          else {
            val headLen = math.min(8L, len).toInt
            val head = (0 until headLen)
              .map(i => f"${bytes(p + i)}%02X").mkString
            out += ((sid, idx, wtype, uri, len, head))
            idx += 1
            off = p + len.toInt + 4
          }
        case _ => ok = false
      }
    }
    if (ok) out.toSeq else corrupt
  }
}
