package graft
package operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schema, per-partition batch
  * processing, feature columns, partitioning — is real. REAL images
  * (PNG/JPEG/GIF/BMP) are probed with the JDK's `javax.imageio` header
  * readers (width/height/format without pixel decode); audio/video and
  * the synthetic `GIMG`/`GVID` layout below remain a DETERMINISTIC STUB
  * (no A/V codec libraries in this container), with [[decodeMeta]] as
  * the seam where a full decoder (JavaCPP/FFmpeg) drops in.
  *
  * At cluster scale the iterator-based mapPartitions shape matches the
  * Arrow-batch style of `mapInPandas`: one decode context per partition,
  * streaming through rows without materializing the partition.
  */
object Multimodal {

  /** Synthetic payload layout: magic(4) | width(4BE) | height(4BE) | body.
    * GIMG = image, GVID = video (body = frames of width*height bytes).
    */
  val ImageMagic: Array[Byte] = "GIMG".getBytes("US-ASCII")
  val VideoMagic: Array[Byte] = "GVID".getBytes("US-ASCII")

  def encodeFakeImage(width: Int, height: Int, seed: Long): Array[Byte] = {
    val body = new Array[Byte](width * height)
    var z = seed
    var i = 0
    while (i < body.length) {
      z = z * 6364136223846793005L + 1442695040888963407L
      body(i) = (z >>> 56).toByte
      i += 1
    }
    ImageMagic ++ intBe(width) ++ intBe(height) ++ body
  }

  private def intBe(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readIntBe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  case class MediaMeta(format: String, width: Int, height: Int,
                       nFrames: Int, nBytes: Long)

  /** File-signature sniff for the real image formats the JDK can probe. */
  private def realImageFormat(b: Array[Byte]): String = {
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else null
  }

  /** Header-only `javax.imageio` probe: width/height from the format
    * header without decoding pixels, memory-cached stream (no temp
    * files on executors). Null when no reader accepts the bytes.
    */
  private def probeImageIO(bytes: Array[Byte], fmt: String): MediaMeta = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
        MediaMeta(fmt, r.getWidth(0), r.getHeight(0), 1, bytes.length.toLong)
      } finally r.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => null
    } finally iis.close()
  }

  /** Typed metadata probe. Real images (PNG/JPEG/GIF/BMP) go through the
    * `javax.imageio` header readers; `GIMG`/`GVID` payloads parse the
    * synthetic layout (the declared A/V codec seam); anything else —
    * including a corrupt real-image header — is `unknown`.
    */
  def decodeMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 12) return MediaMeta("unknown", -1, -1, 0, if (bytes == null) 0L else bytes.length.toLong)
    val realFmt = realImageFormat(bytes)
    if (realFmt != null) {
      val m = probeImageIO(bytes, realFmt)
      return if (m != null) m
      else MediaMeta("unknown", -1, -1, 0, bytes.length.toLong)
    }
    val magic = bytes.take(4)
    val w = readIntBe(bytes, 4); val h = readIntBe(bytes, 8)
    if (magic.sameElements(ImageMagic))
      MediaMeta("image", w, h, 1, bytes.length.toLong)
    else if (magic.sameElements(VideoMagic)) {
      val frame = math.max(1, w * h)
      MediaMeta("video", w, h, (bytes.length - 12) / frame, bytes.length.toLong)
    } else MediaMeta("unknown", -1, -1, 0, bytes.length.toLong)
  }

  /** A real PNG (8-bit gray, deterministic pixels) via the JDK encoder —
    * exercises the genuine encode→probe round trip in specs and q29.
    */
  def encodeRealPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var z = seed
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        z = z * 6364136223846793005L + 1442695040888963407L
        raster.setSample(x, y, 0, ((z >>> 56) & 0xff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Byte-histogram Shannon entropy — pure integer counting + one final
    * double pass, deterministic for a given payload.
    */
  def byteEntropy(bytes: Array[Byte]): Double = {
    if (bytes == null || bytes.isEmpty) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toDouble
    var e = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j) / n; e -= p * math.log(p) / math.log(2.0) }
      j += 1
    }
    e
  }

  /** STUB resize: downsamples the synthetic body by integer stride —
    * stands in for a real scaler, preserving the (binary → binary)
    * column shape.
    */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val m = decodeMeta(bytes)
    if (m.format != "image" || factor <= 1) return bytes
    val w2 = math.max(1, m.width / factor)
    val h2 = math.max(1, m.height / factor)
    val out = new Array[Byte](12 + w2 * h2)
    System.arraycopy(ImageMagic, 0, out, 0, 4)
    System.arraycopy(intBe(w2), 0, out, 4, 4)
    System.arraycopy(intBe(h2), 0, out, 8, 4)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out(12 + y * w2 + x) = bytes(12 + (y * factor) * m.width + x * factor)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Frame sampling for `GVID` payloads: every k-th frame's first byte
    * (stand-in for keyframe extraction).
    */
  def sampleFrames(bytes: Array[Byte], everyK: Int): Array[Byte] = {
    val m = decodeMeta(bytes)
    if (m.format != "video" || m.nFrames == 0) return Array.emptyByteArray
    val frame = math.max(1, m.width * m.height)
    (0 until m.nFrames by math.max(1, everyK))
      .map(f => bytes(12 + f * frame)).toArray
  }

  case class MediaFeatures(id: Long, format: String, width: Int,
                           height: Int, nFrames: Int, nBytes: Long,
                           entropy: Double)

  /** Feature extraction over a (id, payload binary) DataFrame —
    * mapPartitions batch shape, one pass per partition.
    */
  def features(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decodeMeta(bytes)
          MediaFeatures(id, m.format, m.width, m.height, m.nFrames,
            m.nBytes, byteEntropy(bytes))
        }
      }
  }
}
