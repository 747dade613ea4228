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

  // ---- real decode path ----

  private def bmpBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Minimal valid RIFF/WAVE PCM16 mono file built byte-by-byte. */
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(16000).putInt(16000 * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeReal: real BMP decodes through javax.imageio") {
    // left half black, right half white → low buckets dark, high bright
    val bytes = bmpBytes(64, 4,
      (x, _) => if (x < 32) 0x000000 else 0xffffff)
    val feat = Multimodal.decodeReal("image", bytes, dim = 2)
    assert(feat.isDefined, "BMP must decode")
    val Array(a, b) = feat.get
    assert(a < 0.1f && b > 0.9f, s"luminance split expected, got $a / $b")
  }

  test("decodeReal: PNG decodes too (second in-JDK format)") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feat = Multimodal.decodeReal("image", bos.toByteArray, dim = 4)
    assert(feat.isDefined)
    assert(feat.get.forall(v => math.abs(v - 0x80 / 255f) < 0.01f))
  }

  test("decodeReal: WAV PCM16 header math + amplitude fold") {
    // first half silence, second half full-scale square wave
    val samples = Array.tabulate[Short](1000)(i =>
      if (i < 500) 0 else if (i % 2 == 0) 32767 else -32767)
    val feat = Multimodal.decodeReal("audio", wavBytes(samples), dim = 2)
    assert(feat.isDefined, "WAV must decode")
    val Array(a, b) = feat.get
    assert(a < 0.01f && b > 0.95f, s"amplitude split expected, got $a / $b")
  }

  test("decodeReal: corrupt, truncated, null and unsupported payloads " +
      "all report undecodable without throwing") {
    val garbage = Array.fill[Byte](256)(0x5a)
    assert(Multimodal.decodeReal("image", garbage).isEmpty)
    assert(Multimodal.decodeReal("audio", garbage).isEmpty)
    // valid WAV prefix, truncated mid-chunk
    val wav = wavBytes(Array.tabulate[Short](100)(_.toShort))
    assert(Multimodal.decodeReal("audio", wav.take(50)).isEmpty)
    // valid BMP prefix, truncated body
    val bmp = bmpBytes(16, 16, (_, _) => 0xffffff)
    assert(Multimodal.decodeReal("image", bmp.take(20)).isEmpty)
    assert(Multimodal.decodeReal("image", null).isEmpty)
    assert(Multimodal.decodeReal("image", Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeReal("video", garbage).isEmpty) // no JVM codec
  }

  test("extractFeatures routes real payloads through the real decoder " +
      "and corrupt rows degrade to the fallback, not a failure") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val bmp = bmpBytes(64, 4, (x, _) => if (x < 32) 0x000000 else 0xffffff)
    val rows = java.util.Arrays.asList(
      Row(1L, "image", bmp, Row(64, 4, 1, 16000)),
      Row(2L, "image", Array.fill[Byte](64)(0x11), Row(8, 8, 1, 16000)),
      Row(3L, "audio", null, Row(0, 0, 0, 16000)))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(df, dim = 2).collect()
      .map(r => r.media_id -> r).toMap
    // real BMP: the luminance split only the real decoder produces
    assert(f(1L).feature(0) < 0.1f && f(1L).feature(1) > 0.9f)
    // corrupt: fake fallback (byte-fold of 64×0x11), deterministic
    assert(f(2L).feature.toSeq == Multimodal.decodeFake(
      Array.fill[Byte](64)(0x11), 2).toSeq)
    // null: empty feature
    assert(f(3L).n_bytes == 0 && f(3L).feature.forall(_ == 0f))
  }

  // ---- header-dimension parse (q156) ----

  test("headerDims parses REAL ImageIO-written PNG and JPEG files — " +
      "not just the synthetic layout") {
    def realBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    for ((w, h) <- Seq((1, 1), (17, 23), (640, 480), (3, 1000))) {
      assert(Multimodal.headerDims(realBytes(w, h, "png")) == Some((w, h)),
        s"png $w x $h")
      assert(Multimodal.headerDims(realBytes(w, h, "jpg")) == Some((w, h)),
        s"jpeg $w x $h")
    }
  }

  test("headerDims accepts legal 0xFF fill bytes between JPEG segments") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI, two fill bytes, APP0(len 16), fill byte, SOF0 with 300x200
    val padded = hex("FFD8" + "FFFF" + "FFE0" + "0010" + "00" * 14 +
      "FF" + "FFC0" + "0011" + "08" + "00C8" + "012C" +
      "03" + "012200" + "021101" + "031101")
    assert(Multimodal.headerDims(padded) == Some((300, 200)))
  }

  test("headerDims degrades on corrupt/truncated/foreign payloads") {
    assert(Multimodal.headerDims(null).isEmpty)
    assert(Multimodal.headerDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.headerDims(Array.fill[Byte](64)(0x5a)).isEmpty)
    val png = {
      val img = new java.awt.image.BufferedImage(
        9, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.headerDims(png.take(12)).isEmpty) // truncated pre-IHDR
    // WAV bytes are a valid container — just not an image one
    assert(Multimodal.headerDims(
      wavBytes(Array.tabulate[Short](10)(_.toShort))).isEmpty)
  }

  test("q156 corpus: parsed dims equal the id-derived formulas; corrupt " +
      "rows report -1") {
    val out = Multimodal.mediaHeaderDims(spark, "unused").collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) {
        assert(r.getInt(3) == -1 && r.getInt(4) == -1, s"id $id must be corrupt")
        assert(r.getInt(2) == 10)
      } else {
        assert(r.getInt(3) == (id * 31 % 613 + 16).toInt, s"width id $id")
        assert(r.getInt(4) == (id * 17 % 401 + 16).toInt, s"height id $id")
      }
    }
  }

  test("frame sampling and resize plans are metadata-pure") {
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    assert(frames.count() == media.filter($"kind" === "video").count())
    val bad = Multimodal.resizePlan(media, maxSide = 256)
      .filter($"out_w" > 256 || $"out_h" > 256).count()
    assert(bad == 0)
  }
}
