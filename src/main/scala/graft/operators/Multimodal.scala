package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `BINARY` columns with a typed metadata struct; decode / feature-extract
  * run as batched per-partition transforms.
  *
  * The Spark-side plumbing (schema, partition-local batching, output
  * shape) is real and tested. Images decode LIVE via the JDK's built-in
  * `javax.imageio` readers ([[ImageIoDecoder]] — JPEG/PNG/GIF/BMP) and
  * `javax.sound.sampled` providers ([[AudioSystemDecoder]] — WAV/AIFF/AU),
  * both JDK-bundled, no added dependency; video codecs are not available
  * in this environment, so those payloads take the deterministic
  * [[StubDecoder]] path — swap in a codec-backed [[MediaDecoder]] to go
  * live.
  */
object Multimodal {

  /** A media record: payload + typed metadata, the storage shape. */
  case class MediaRecord(
      id: Long,
      kind: String,          // "image" | "audio" | "video" | "text"
      media: Array[Byte],
      width: Int,
      height: Int,
      sampleRateHz: Int)

  /** Decoded features: fixed-width embedding + scalar stats per record. */
  case class MediaFeatures(
      id: Long,
      kind: String,
      byteLen: Long,
      checksum: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sampleRateHz", IntegerType),
  ))

  /** Batched decoder interface: one call per batch of payloads, the shape a
    * real codec/model wants (amortized model load, vectorized decode).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Byte-level FNV-1a 64 — THE content identity every decoder stamps,
    * live or stub ("content identity must not depend on which path ran").
    * One definition so the contract holds by construction.
    */
  private[operators] def fnv1a(bytes: Array[Byte]): Long = {
    var checksum = 1469598103934665603L // offset basis
    var i = 0
    while (i < bytes.length) {
      checksum = (checksum ^ (bytes(i) & 0xFFL)) * 1099511628211L
      i += 1
    }
    checksum
  }

  /** Deterministic stand-in for the real codec: features derive only from
    * the bytes (rolling checksum folded into a fixed-width vector), so
    * tests are reproducible and the full pipeline shape is exercised.
    */
  class StubDecoder(featureDim: Int = 8) extends MediaDecoder {
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        val acc = new Array[Float](featureDim)
        var i = 0
        while (i < bytes.length) {
          acc(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaFeatures(r.id, r.kind, bytes.length.toLong, fnv1a(bytes), acc)
      }
  }

  /** A LIVE image codec over the JDK's built-in `javax.imageio` readers
    * (JPEG/PNG/GIF/BMP ship with every JRE — no added dependency): payloads
    * that decode as images get REAL features — true pixel dimensions plus a
    * luminance histogram over the decoded raster — while everything else
    * falls back to the deterministic [[StubDecoder]], so one decoder serves
    * a mixed binary corpus. Checksum stays the byte-level FNV-1a in both
    * paths (content identity must not depend on which path ran).
    *
    * Scale shape is unchanged from the stub: partition-local batched map,
    * no shuffle; the decode cost is per-payload CPU where the bytes sit.
    */
  /** Template for live decoders: a feature extractor over the payload,
    * stub fallback when it declines, FNV-1a identity on both paths.
    */
  private[operators] abstract class LiveDecoder(featureDim: Int)
      extends MediaDecoder {
    private val fallback = new StubDecoder(featureDim)
    /** None = not this decoder's modality → stub fallback. */
    protected def extract(bytes: Array[Byte]): Option[Array[Float]]
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        extract(bytes) match {
          case Some(features) =>
            MediaFeatures(r.id, r.kind, bytes.length.toLong, fnv1a(bytes), features)
          case None => fallback.decodeBatch(Seq(r)).head
        }
      }
  }

  class ImageIoDecoder(featureDim: Int = 8) extends LiveDecoder(featureDim) {
    override protected def extract(bytes: Array[Byte]): Option[Array[Float]] =
      ImageIoDecoder.readImage(bytes)
        .map(ImageIoDecoder.luminanceHistogram(_, featureDim))
  }

  object ImageIoDecoder {
    /** All ImageIO streams here are EXPLICITLY memory-cached: the JDK
      * default (`ImageIO.createImageInputStream`, and `ImageIO.read`
      * which calls it) wraps payloads in a `FileCacheImageInputStream` —
      * a temp FILE written and re-read on local disk PER PAYLOAD. Over a
      * stored media corpus that is a hidden disk round-trip per decode
      * (it halved measured decode throughput) and an executor /tmp storm
      * at scale; payloads already sit in memory, so the memory-cached
      * stream is strictly correct.
      */
    private def memStream(bytes: Array[Byte]) =
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))

    /** Full decode; None when no installed reader recognizes the bytes. */
    def readImage(
        bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length == 0) return None
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        stream = memStream(bytes)
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(stream, true, true)
            Some(reader.read(0))
          } finally reader.dispose()
        }
      } catch { case _: Exception => None }
      finally if (stream != null) stream.close()
    }

    /** Full MULTI-frame decode — the video-shaped modality the JDK can
      * actually exercise (animated GIF ships with every JRE): all frames
      * of a recognized multi-image container, in order; a single-frame
      * payload yields one entry; Nil when no reader recognizes the bytes.
      * Frames are materialized per payload (bounded by the payload's own
      * raster volume — the input-split class, same as [[readImage]]).
      */
    def readFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length == 0) return Nil
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        stream = memStream(bytes)
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) Nil
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false: frame count requires a full scan
            reader.setInput(stream, false, true)
            val n = reader.getNumImages(true)
            (0 until n).map(reader.read)
          } finally reader.dispose()
        }
      } catch { case _: Exception => Nil }
      finally if (stream != null) stream.close()
    }

    /** Header-only dimension probe: asks the format reader for width/height
      * WITHOUT decoding the raster — constant cost per payload regardless
      * of image size, the right tool for metadata backfill over a corpus.
      */
    def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        stream = memStream(bytes)
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(stream, true, true)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } catch { case _: Exception => None }
      finally if (stream != null) stream.close()
    }

    /** Header-only format sniff: the recognizing reader's canonical format
      * name (e.g. "png", "bmp"), lowercased; None when no installed reader
      * claims the bytes. Same constant-cost contract as [[dimensions]].
      */
    def formatName(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length == 0) return None
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        stream = memStream(bytes)
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try Some(reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
          finally reader.dispose()
        }
      } catch { case _: Exception => None }
      finally if (stream != null) stream.close()
    }

    /** `dim`-bin luminance COUNT histogram of the decoded raster — exact
      * integers, so a SQL oracle can restate it with no float-division
      * ulps in the feature itself (downstream cosine then runs
      * double-vs-double on both sides, the proven 4-dp contract).
      */
    def luminanceCounts(
        img: java.awt.image.BufferedImage, dim: Int): Array[Long] = {
      val acc = new Array[Long](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 +
            ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
          acc(math.min(lum * dim / 256, dim - 1)) += 1L
          x += 1
        }
        y += 1
      }
      acc
    }

    /** `dim`-bin normalized luminance histogram of the decoded raster —
      * a real (if simple) visual feature with the same fixed-width shape
      * the stub emits.
      */
    private[operators] def luminanceHistogram(
        img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val counts = luminanceCounts(img, dim)
      val n = (img.getWidth.toLong * img.getHeight).toFloat
      val acc = new Array[Float](dim)
      if (n > 0) { var i = 0; while (i < dim) { acc(i) = counts(i) / n; i += 1 } }
      acc
    }
  }

  /** Deterministic 24-bit BMP assembly straight from the format spec
    * (14-byte file header + 40-byte BITMAPINFOHEADER + bottom-up rows
    * padded to 4 bytes, BI_RGB) — a synthetic image payload whose byte
    * layout is INDEPENDENT of any codec library, so a header probe over
    * it checks the JDK reader against the spec, not against the JDK
    * writer. Total size is closed-form (54 + h·⌈3w/4⌉·4 bytes), which is
    * what lets a SQL oracle restate the layout arithmetically.
    */
  object BmpBytes {
    def rowSize(w: Int): Int = ((w * 3 + 3) / 4) * 4

    def encodedLength(w: Int, h: Int): Int = 54 + rowSize(w) * h

    /** `pixel(x, y)` returns packed 0xRRGGBB; origin top-left (rows are
      * written bottom-up per the spec).
      */
    def encode24(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"BMP dims must be positive, got ${w}x$h")
      val rs = rowSize(w)
      val out = java.nio.ByteBuffer.allocate(encodedLength(w, h))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
        .putInt(encodedLength(w, h)).putShort(0).putShort(0).putInt(54)
      out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rs * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = pixel(x, y)
          out.put((p & 0xFF).toByte)
            .put(((p >> 8) & 0xFF).toByte)
            .put(((p >> 16) & 0xFF).toByte)
          x += 1
        }
        var pad = rs - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y -= 1
      }
      out.array()
    }
  }

  /** PNG siblings of [[BmpBytes]], proving the image family on a
    * COMPRESSED codec: the raster is drawn closed-form and encoded by the
    * JDK's own PNG writer (deflate — hand-assembling PNG means
    * implementing zlib). PNG is lossless RGB, so a readback through any
    * correct reader reproduces `pixel(x, y)` bit-exactly and every
    * raster-level oracle (resize sums, dHash bits, histogram features)
    * holds unchanged; what is NOT closed-form is the CONTAINER byte
    * length (encoder-dependent), so oracles over PNG payloads check
    * decoded content, never container length.
    */
  object PngBytes {
    /** `pixel(x, y)` returns packed 0xRRGGBB; origin top-left. */
    def encode24(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"PNG dims must be positive, got ${w}x$h")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, pixel(x, y) & 0xFFFFFF); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      // memory-cached output stream: ImageIO.write(…, OutputStream) would
      // spool through a temp FILE per payload (see ImageIoDecoder.memStream)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try require(javax.imageio.ImageIO.write(img, "png", ios),
        "JDK PNG writer unavailable")
      finally ios.close()
      bos.toByteArray
    }
  }

  /** JPEG sibling of [[PngBytes]] — the image family's LOSSY codec, which
    * is what dominates a real 100 TB corpus: decoded content is NOT
    * bit-exact, so no raster-level oracle can restate JPEG pixels
    * arithmetically. What stays exact: the HEADER geometry (width/height
    * — `multimodal_image_dims_jpeg` hash-verifies it), and what must
    * stay STABLE rather than exact: perceptual signatures
    * (`dedup_image_phash_jpeg` certifies dHash cluster recall/precision
    * as booleans — the sim_search cert pattern, because the exact bits
    * depend on encoder artifacts). Encoding is the JDK writer at an
    * EXPLICIT quality (the default is writer-dependent), through a
    * memory-cached stream like every other codec here.
    */
  object JpegBytes {
    /** `pixel(x, y)` returns packed 0xRRGGBB; origin top-left. */
    def encode24(
        w: Int, h: Int, pixel: (Int, Int) => Int,
        quality: Float = 0.85f): Array[Byte] = {
      require(w > 0 && h > 0, s"JPEG dims must be positive, got ${w}x$h")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, pixel(x, y) & 0xFFFFFF); x += 1 }
        y += 1
      }
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
      require(it.hasNext, "JDK JPEG writer unavailable")
      val writer = it.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        writer.write(null,
          new javax.imageio.IIOImage(img, null, null), p)
        ios.flush()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
  }

  /** Deterministic multi-frame GIF fixtures for the video-shaped path:
    * grayscale frames drawn into an EXPLICIT 256-entry gray palette
    * (`IndexColorModel`), so the JDK GIF writer stores pixel INDICES that
    * equal the gray values — the round-trip through any correct GIF
    * reader is bit-exact and a SQL oracle can restate the decoded
    * rasters arithmetically. (Unlike [[BmpBytes]]/[[WavBytes]] this uses
    * the JDK WRITER — hand-assembling GIF means implementing LZW — so
    * what the oracle checks is the READ+EXTRACT path against closed-form
    * pixels, not the writer against the spec.)
    */
  object GifBytes {
    /** `gray(frame, x, y)` returns the 0..255 luminance. */
    def encodeGray(
        w: Int, h: Int, nFrames: Int,
        gray: (Int, Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0 && nFrames > 0,
        s"GIF params must be positive, got ${w}x$h x$nFrames frames")
      val ramp = Array.tabulate[Byte](256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      val bos = new java.io.ByteArrayOutputStream()
      // memory-cached: createImageOutputStream spools via a temp file
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, gray(f, x, y)); x += 1 }
            y += 1
          }
          // the JDK writer's DEFAULT image metadata claims interlace=TRUE
          // while the rows are in fact written sequentially — readers then
          // de-interlace rows that were never interlaced, scrambling the
          // raster (probed empirically on JDK 17). Force the flag off.
          val md = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), null)
          val fmtName = "javax_imageio_gif_image_1.0"
          val root = md.getAsTree(fmtName)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          root.getElementsByTagName("ImageDescriptor").item(0)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .setAttribute("interlaceFlag", "FALSE")
          md.setFromTree(fmtName, root)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, md), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
    }
  }

  /** Minimal MJPEG-in-AVI: assembly AND extraction straight from the
    * public RIFF/AVI container layout (the same spec-not-library
    * discipline as [[BmpBytes]]/[[WavBytes]] — AVI is RIFF like WAV, so
    * the writer is closed-form byte assembly; only the per-frame PAYLOAD
    * goes through a codec, the existing JPEG path). This is the real
    * video container slotted where animated GIF stood in for the
    * multi-frame seam: frame COUNT and header geometry are exact
    * container arithmetic, frame CONTENT is lossy-codec territory and is
    * certified, never hash-compared ([[JpegBytes]]' contract).
    *
    * The writer emits an index-less AVI (idx1 is optional per the spec
    * and [[readFrames]] walks `movi` sequentially); the reader walks
    * RIFF chunks, takes `..dc`/`..db` entries of the `movi` list in
    * order, and hands each payload to the image decoder.
    */
  object AviBytes {
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def fourcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fourcc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    private def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(typ) ++ body

    /** Assemble an MJPEG AVI from pre-encoded JPEG frames (one `00dc`
      * chunk each; encode frames with [[JpegBytes.encode24]]).
      */
    def encodeMjpeg(
        w: Int, h: Int, fps: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && fps > 0 && jpegFrames.nonEmpty,
        s"AVI params must be positive with >=1 frame, got ${w}x$h@$fps" +
          s"x${jpegFrames.size}")
      val maxChunk = jpegFrames.map(_.length).max
      val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(jpegFrames.size) ++ le32(0) ++ le32(1) ++ le32(maxChunk) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++
        le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++
        le32(0) ++ le32(jpegFrames.size) ++ le32(maxChunk) ++ le32(-1) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fourcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        jpegFrames.iterator.flatMap(f => chunk("00dc", f)).toArray)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    def isAvi(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 12 &&
        fcAt(bytes, 0) == "RIFF" && fcAt(bytes, 8) == "AVI "

    private def fcAt(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    /** Header-only probe from `avih` — (width, height, totalFrames,
      * microsecondsPerFrame); exact container arithmetic even though the
      * frame payloads are lossy. None when the bytes are not a parseable
      * AVI.
      */
    def headerMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] =
      try {
        if (!isAvi(bytes)) None
        else findList(bytes, 12, bytes.length, "hdrl").flatMap {
          case (off, end) =>
            // first chunk of hdrl is avih by spec
            if (off + 8 <= end && fcAt(bytes, off) == "avih" &&
                off + 8 + u32(bytes, off + 4) <= end) {
              val p = off + 8
              Some((u32(bytes, p + 32).toInt, u32(bytes, p + 36).toInt,
                u32(bytes, p + 16).toInt, u32(bytes, p).toInt))
            } else None
        }
      } catch { case _: Exception => None }

    /** All frames of the `movi` list, decoded (MJPEG → the image
      * decoder); Nil when the bytes are not a parseable AVI. Frames are
      * materialized per payload — the input-split class, same as
      * [[ImageIoDecoder.readFrames]].
      */
    def readFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
      try {
        if (!isAvi(bytes)) Nil
        else findList(bytes, 12, bytes.length, "movi") match {
          case None => Nil
          case Some((start, end)) =>
            val out = Seq.newBuilder[java.awt.image.BufferedImage]
            var p = start
            while (p + 8 <= end) {
              val id = fcAt(bytes, p)
              val len = u32(bytes, p + 4)
              if (p + 8 + len > end) { p = end } // truncated — stop
              else {
                if (id.endsWith("dc") || id.endsWith("db")) {
                  val payload = java.util.Arrays.copyOfRange(
                    bytes, p + 8, p + 8 + len.toInt)
                  ImageIoDecoder.readImage(payload).foreach(out += _)
                }
                p += 8 + len.toInt + (len % 2).toInt // word alignment
              }
            }
            out.result()
        }
      } catch { case _: Exception => Nil }

    /** Offset range of the first LIST of the given type among the chunks
      * in [from, to) — (payload start AFTER the type fourcc, payload
      * end).
      */
    private def findList(
        bytes: Array[Byte], from: Int, to: Int,
        typ: String): Option[(Int, Int)] = {
      var p = from
      while (p + 8 <= to) {
        val id = fcAt(bytes, p)
        val len = u32(bytes, p + 4)
        if (p + 8 + len > to) return None // truncated
        if (id == "LIST" && len >= 4 && fcAt(bytes, p + 8) == typ)
          return Some((p + 12, p + 8 + len.toInt))
        p += 8 + len.toInt + (len % 2).toInt
      }
      None
    }
  }

  /** Deterministic 16-bit PCM WAV assembly straight from the RIFF spec
    * (12-byte RIFF/WAVE header + 24-byte `fmt ` chunk + `data` chunk,
    * little-endian) — the audio sibling of [[BmpBytes]]: a payload whose
    * byte layout is INDEPENDENT of any codec library, so probing it with
    * the JDK `javax.sound.sampled` reader checks the READER against the
    * spec, not against the JDK writer. Total size is closed-form
    * (44 + frames·channels·2 bytes), so a SQL oracle can restate the
    * layout arithmetically.
    */
  object WavBytes {
    def encodedLength(frames: Int, channels: Int): Int = 44 + frames * channels * 2

    /** Prepend the 44-byte RIFF/WAVE + `fmt ` + `data` header to raw
      * 16-bit little-endian PCM — the assembly step [[encodePcm16]] and
      * [[segmentAudio]] share, so a segment's container is byte-for-byte
      * the same layout as a from-scratch encode of the same frames.
      */
    def wrapPcm16(
        sampleRateHz: Int, channels: Int, pcm: Array[Byte]): Array[Byte] = {
      require(sampleRateHz > 0 && channels > 0,
        s"WAV params must be positive, got rate=$sampleRateHz ch=$channels")
      val blockAlign = channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                      // PCM, no compression
        .putShort(channels.toShort)
        .putInt(sampleRateHz)
        .putInt(sampleRateHz * blockAlign) // byte rate
        .putShort(blockAlign.toShort)
        .putShort(16)                     // bits per sample
      out.put("data".getBytes("US-ASCII")).putInt(pcm.length)
      out.put(pcm)
      out.array()
    }

    /** `sample(frame, channel)` returns the signed 16-bit amplitude. */
    def encodePcm16(
        sampleRateHz: Int, channels: Int, frames: Int,
        sample: (Int, Int) => Short): Array[Byte] = {
      require(frames > 0, s"WAV frame count must be positive, got $frames")
      val pcm = java.nio.ByteBuffer.allocate(frames * channels * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < channels) { pcm.putShort(sample(f, c)); c += 1 }
        f += 1
      }
      wrapPcm16(sampleRateHz, channels, pcm.array())
    }
  }

  /** A LIVE audio codec over the JDK's built-in `javax.sound.sampled`
    * providers (WAV/AIFF/AU ship with every JRE — no added dependency):
    * payloads that parse as audio get REAL features — a normalized
    * amplitude histogram over the decoded PCM stream — while everything
    * else falls back to the [[StubDecoder]], mirroring
    * [[ImageIoDecoder]]'s contract (checksum stays byte-level FNV-1a in
    * both paths; content identity must not depend on the path taken).
    * Decoding is streamed frame-wise, never materializing the PCM buffer.
    */
  class AudioSystemDecoder(featureDim: Int = 8) extends LiveDecoder(featureDim) {
    override protected def extract(bytes: Array[Byte]): Option[Array[Float]] =
      AudioSystemDecoder.amplitudeHistogram(bytes, featureDim)
  }

  /** One decoder for a MIXED corpus — the shape [[mediaSchema]] models
    * (`kind: image|audio|video|text`): tries the image readers, then the
    * audio providers, then the stub, so JPEGs and WAVs in one `decode`
    * pass both get live features. Per-payload dispatch cost is a header
    * sniff for the losing modality — negligible against the decode.
    */
  class JdkMediaDecoder(featureDim: Int = 8) extends LiveDecoder(featureDim) {
    override protected def extract(bytes: Array[Byte]): Option[Array[Float]] =
      ImageIoDecoder.readImage(bytes)
        .map(ImageIoDecoder.luminanceHistogram(_, featureDim))
        .orElse(AudioSystemDecoder.amplitudeHistogram(bytes, featureDim))
  }

  object AudioSystemDecoder {
    /** The JDK's audio file readers, resolved ONCE per JVM and called
      * directly: `AudioSystem.getAudioFileFormat/getAudioInputStream`
      * funnel EVERY call through a `synchronized` static provider lookup
      * (sun's JDK13Services) — a process-global lock that serializes all
      * decode threads (measured: the 32-core WAV fingerprint stage ran at
      * a lock-bound ~7k payloads/s while the equivalent image stage did
      * 265k/s). The readers themselves (WaveFileReader & co.) are
      * stateless parsers, safe to share; the dispatch below is exactly
      * AudioSystem's — first provider that doesn't throw
      * UnsupportedAudioFileException wins — minus the global lock. Each
      * attempt gets a FRESH ByteArrayInputStream (readers mark/reset
      * internally; zero-copy over the payload array).
      */
    private lazy val fileReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val acc = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) acc += it.next()
      acc.result()
    }

    /** Magic-byte pre-dispatch: the SPI registration order runs Aiff, Au
      * and SoftMidi BEFORE the Wave readers, so every WAV payload paid
      * three parse-and-throw cycles (UnsupportedAudioFileException fills
      * a stack trace each time) before the right reader ever saw it.
      * The container magic picks the matching readers first; unmatched
      * payloads fall through to the full list, so recognition is
      * unchanged — only the throw storm on the hot path is gone.
      */
    private def orderedReaders(
        bytes: Array[Byte]): List[javax.sound.sampled.spi.AudioFileReader] = {
      val pref =
        if (bytes.length < 4) ""
        else (bytes(0).toChar, bytes(1).toChar, bytes(2).toChar, bytes(3).toChar) match {
          case ('R', 'I', 'F', 'F') => "Wave"
          case ('F', 'O', 'R', 'M') => "Aiff"
          case ('.', 's', 'n', 'd') => "Au"
          case _ => ""
        }
      if (pref.isEmpty) fileReaders
      else {
        val (hit, miss) =
          fileReaders.partition(_.getClass.getSimpleName.startsWith(pref))
        hit ::: miss
      }
    }

    private def fileFormat(
        bytes: Array[Byte]): Option[javax.sound.sampled.AudioFileFormat] = {
      val readers = orderedReaders(bytes).iterator
      while (readers.hasNext) {
        try return Some(readers.next().getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => }
      }
      None
    }

    private def audioStream(
        bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
      val readers = orderedReaders(bytes).iterator
      while (readers.hasNext) {
        try return Some(readers.next().getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => }
      }
      None
    }

    /** Header-only metadata probe: (sampleRate, channels, frames) without
      * decoding samples — the audio analogue of
      * [[ImageIoDecoder.dimensions]].
      */
    def metadata(bytes: Array[Byte]): Option[(Float, Int, Long)] = {
      if (bytes == null || bytes.length == 0) return None
      fileFormat(bytes).map(f =>
        (f.getFormat.getSampleRate, f.getFormat.getChannels,
          f.getFrameLength.toLong))
    }

    /** Header-only container sniff: the recognizing provider's file-type
      * name (e.g. "wave", "aiff"), lowercased; None when no provider
      * claims the bytes — the audio analogue of
      * [[ImageIoDecoder.formatName]].
      */
    def fileType(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length == 0) return None
      fileFormat(bytes).map(
        _.getType.toString.toLowerCase(java.util.Locale.ROOT))
    }

    /** Decode a recognized payload to 16-bit SIGNED little-endian PCM:
      * (sampleRate, channels, pcmBytes). Streams already in that encoding
      * are read straight through; anything else a provider recognizes
      * (8/24-bit, big-endian AIFF, u-law/a-law AU) is TRANSCODED via
      * `AudioSystem.getAudioInputStream(target, in)` — same recognition
      * contract as [[metadata]]. Unlike [[amplitudeHistogram]] this
      * MATERIALIZES the PCM (the caller re-wraps slices of it); the
      * buffer is bounded by the payload it came from, so per-task memory
      * stays the input-split class.
      */
    private[operators] def pcm16(
        bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes == null || bytes.length == 0) return None
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        val raw = audioStream(bytes) match {
          case Some(s) => s
          case None => return None
        }
        val pcmEnc = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        in =
          if (raw.getFormat.getEncoding == pcmEnc &&
              raw.getFormat.getSampleSizeInBits == 16 &&
              !raw.getFormat.isBigEndian) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(pcmEnc,
              raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
              raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate,
              false), raw)
        val fmt = in.getFormat
        Some((fmt.getSampleRate.toInt, fmt.getChannels, in.readAllBytes()))
      } catch { case _: Exception => None }
      finally if (in != null) in.close()
    }

    /** `dim`-bin normalized |amplitude| histogram over the PCM frames.
      * Streams recognized by a provider but not already 16-bit SIGNED PCM
      * (8/24-bit, u-law/a-law AU, …) are TRANSCODED to it through
      * `AudioSystem.getAudioInputStream(target, in)` — so every payload
      * [[metadata]] recognizes gets live features and the probe and the
      * decoder can never disagree on what counts as audio. None only when
      * no provider recognizes the bytes (or no conversion path exists).
      */
    private[operators] def amplitudeHistogram(
        bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
      if (bytes == null || bytes.length == 0) return None
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        val raw = audioStream(bytes) match {
          case Some(s) => s
          case None => return None
        }
        val pcm16 = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        in =
          if (raw.getFormat.getEncoding == pcm16 &&
              raw.getFormat.getSampleSizeInBits == 16) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(pcm16,
              raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
              raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate,
              false), raw)
        val fmt = in.getFormat
        val bigEndian = fmt.isBigEndian
        val acc = new Array[Float](dim)
        val buf = new Array[Byte](8192)
        var total = 0L
        var read = in.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s =
              if (bigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
              else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
            val mag = math.abs(s.toInt) // 0..32768
            acc(math.min(mag * dim / 32769, dim - 1)) += 1f
            total += 1
            i += 2
          }
          read = in.read(buf)
        }
        if (total == 0) return None
        var i = 0
        while (i < dim) { acc(i) /= total.toFloat; i += 1 }
        Some(acc)
      } catch { case _: Exception => None }
      finally if (in != null) in.close()
    }
  }

  /** Metadata backfill, audio: stamp the REAL sample rate onto records
    * whose payloads parse as audio (header-only probe via
    * [[AudioSystemDecoder.metadata]]); everything else passes through
    * untouched — the audio analogue of [[ImageDimensionProbe]].
    */
  class AudioMetadataProbe extends MediaTransform {
    override def transformBatch(batch: Seq[MediaRecord]): Seq[MediaRecord] =
      batch.map { r =>
        AudioSystemDecoder.metadata(r.media) match {
          // a header may omit the rate (AudioSystem.NOT_SPECIFIED = -1);
          // the record then stays at its untouched 0 sentinel rather than
          // carrying a negative "rate"
          case Some((rate, _, _)) if rate > 0 => r.copy(sampleRateHz = rate.toInt)
          case _ => r
        }
      }
  }

  /** Metadata backfill: stamp REAL pixel dimensions onto records whose
    * payloads decode as images (header-only probe via
    * [[ImageIoDecoder.dimensions]]); non-image payloads pass through
    * untouched. Narrow, partition-local, no shuffle.
    */
  class ImageDimensionProbe extends MediaTransform {
    override def transformBatch(batch: Seq[MediaRecord]): Seq[MediaRecord] =
      batch.map { r =>
        ImageIoDecoder.dimensions(r.media) match {
          case Some((w, h)) => r.copy(width = w, height = h)
          case None => r
        }
      }
  }

  /** Build a media table from `documents` (text payloads as bytes) — the
    * shared-testdata stand-in for a real binary corpus.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      lit("text").as("kind"),
      col("text").cast(BinaryType).as("media"),
      lit(0).as("width"),
      lit(0).as("height"),
      lit(0).as("sampleRateHz"),
    ).as[MediaRecord]
  }

  /** Partition-local batched decode: no shuffle, bounded batch memory —
    * the mapInPandas-style shape in Scala. At 100 TB this is a narrow map
    * stage whose parallelism is the input split count.
    */
  def decode(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    mapBatched(media, batchSize)(decoder.decodeBatch)
  }

  /** Shared partition-local batching plumbing for [[decode]]/[[transform]]. */
  private def mapBatched[U: org.apache.spark.sql.Encoder](
      media: Dataset[MediaRecord],
      batchSize: Int)(f: Seq[MediaRecord] => Seq[U]): Dataset[U] =
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => f(b.toSeq))
    }

  /** Batched record→record transform (resize, re-encode, augment): same
    * partition-local batch shape as [[decode]].
    */
  trait MediaTransform extends Serializable {
    def transformBatch(batch: Seq[MediaRecord]): Seq[MediaRecord]
  }

  /** A REAL raster resize: payloads the JDK readers decode are resampled
    * nearest-neighbor and RE-ENCODED as 24-bit BMP via [[BmpBytes]] — the
    * spec assembler, not a codec writer — so the output bytes are a pure
    * closed-form function of the source raster: source pixel for output
    * (x, y) is (x·srcW ÷ dstW, y·srcH ÷ dstH), integer division, which is
    * why a SQL oracle can restate the resized raster arithmetically when
    * the source was spec-assembled. Non-image payloads pass through
    * untouched (the [[ImageDimensionProbe]] contract — a mixed corpus
    * keeps its non-image rows). Narrow partition-local batch, no shuffle;
    * decode cost is per-payload CPU where the bytes sit.
    */
  class ImageResizer(targetW: Int, targetH: Int) extends MediaTransform {
    require(targetW >= 1 && targetH >= 1,
      s"resize target must be positive, got ${targetW}x$targetH")
    override def transformBatch(batch: Seq[MediaRecord]): Seq[MediaRecord] =
      batch.map { r =>
        ImageIoDecoder.readImage(r.media) match {
          case Some(img) =>
            val (sw, sh) = (img.getWidth, img.getHeight)
            val out = BmpBytes.encode24(targetW, targetH,
              (x, y) => img.getRGB(x * sw / targetW, y * sh / targetH) & 0xFFFFFF)
            r.copy(media = out, width = targetW, height = targetH)
          case None => r
        }
      }
  }

  /** Deterministic resize stand-in for payloads with no decodable raster
    * (the mixed-corpus text/video rows): keeps every `stride`-th payload
    * byte (output size tracks the area ratio the way a real resampler's
    * would) and stamps the target dimensions. [[ImageResizer]] is the
    * live path for decodable images.
    */
  class StubResizer(targetW: Int, targetH: Int, stride: Int) extends MediaTransform {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    override def transformBatch(batch: Seq[MediaRecord]): Seq[MediaRecord] =
      batch.map { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        // Long ceil-division: len + stride - 1 overflows Int for stride
        // near Int.MaxValue
        val out = new Array[Byte](
          ((bytes.length.toLong + stride - 1) / stride).toInt)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
        r.copy(media = out, width = targetW, height = targetH)
      }
  }

  /** Apply a batched transform partition-locally — narrow stage, bounded
    * batch memory, no shuffle.
    */
  def transform(
      media: Dataset[MediaRecord],
      t: MediaTransform,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    mapBatched(media, batchSize)(t.transformBatch)
  }

  /** One sampled frame: a fixed-size payload slice, the unit a vision
    * model consumes.
    */
  case class MediaFrame(mediaId: Long, frameIdx: Int, payload: Array[Byte])

  /** Frame sampling: slice each payload into `frameBytes`-sized frames and
    * keep every `stride`-th, starting at frame 0 — the video
    * frame-sampling shape (a real implementation seeks keyframes through
    * the codec; the slicing stub keeps the flatMap-per-partition plumbing
    * and output contract real). Narrow stage; output volume ≈ input bytes
    * / stride, independent of row boundaries — at 100 TB the stage
    * parallelism is the input split count and nothing shuffles.
    */
  /** Live image featurization for the embedding stack: each decodable
    * payload becomes an exact integer luminance-count vector
    * ([[ImageIoDecoder.luminanceCounts]]) ready for
    * `Dedup.embeddingCosinePairs*` / the ANN operators (they cast to
    * double themselves) — the decode→featurize→dedup pipeline a
    * multimodal training corpus runs. The histogram keeps the oracle
    * SQL-restatable (exact integer counts); [[imageHogFeatures]] is the
    * non-toy featurizer slotted into the same seam (same contract,
    * certified statistically in MediaTableSpec rather than arithmetically
    * — real descriptors aren't closed-form). Undecodable payloads yield
    * no row. Narrow
    * partition-local stage: features (a few longs) are the ONLY thing
    * that leaves the scan — pixels never ship.
    */
  def imageHistogramFeatures(
      media: Dataset[MediaRecord], bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        ImageIoDecoder.readImage(r.media)
          .map(img => (r.id, ImageIoDecoder.luminanceCounts(img, bins)))
      }
    }.toDF("id", "features")
  }

  /** Histogram-of-Oriented-Gradients descriptor (Dalal & Triggs, CVPR
    * 2005 — the standard pre-CNN visual descriptor) of a decoded raster:
    * the NON-TOY featurizer behind the [[imageHistogramFeatures]] seam.
    * Luminance gradients by central difference, unsigned orientation
    * binned into `orientBins` per spatial cell (`cellsX` × `cellsY`,
    * pixel→cell by the same integer mapping as [[ImageResizer]]), then
    * 2×2 OVERLAPPING block L2-normalization exactly as published — the
    * step that buys photometric invariance: a uniform brightness shift
    * cancels in the differences, a contrast scale cancels in the block
    * norm. Output dim = (cellsX−1)·(cellsY−1)·4·orientBins, fixed for
    * any input size. Deterministic pure-JVM float math (no library).
    */
  def hogDescriptor(
      img: java.awt.image.BufferedImage,
      cellsX: Int = 4, cellsY: Int = 4, orientBins: Int = 9): Array[Float] = {
    require(cellsX >= 2 && cellsY >= 2 && orientBins >= 2,
      s"HOG needs >=2 cells per axis and >=2 bins, got $cellsX/$cellsY/$orientBins")
    val (w, h) = (img.getWidth, img.getHeight)
    val lum = Array.tabulate(w, h) { (x, y) =>
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
        (rgb & 0xFF) * 114) / 1000.0f
    }
    // per-cell orientation histograms, magnitude-weighted; border pixels
    // use clamped central differences (the reference implementation's
    // replicate-padding)
    val cells = Array.fill(cellsX, cellsY)(new Array[Float](orientBins))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = lum(math.min(x + 1, w - 1))(y) - lum(math.max(x - 1, 0))(y)
        val gy = lum(x)(math.min(y + 1, h - 1)) - lum(x)(math.max(y - 1, 0))
        val mag = math.sqrt(gx * gx + gy * gy).toFloat
        if (mag > 0f) {
          // unsigned orientation in [0, π): atan2 folded by π
          var theta = math.atan2(gy, gx)
          if (theta < 0) theta += math.Pi
          if (theta >= math.Pi) theta -= math.Pi
          val bin = math.min(orientBins - 1,
            (theta / math.Pi * orientBins).toInt)
          cells(x * cellsX / w)(y * cellsY / h)(bin) += mag
        }
        x += 1
      }
      y += 1
    }
    // 2×2 overlapping blocks, each L2-normalized independently
    val out = new Array[Float]((cellsX - 1) * (cellsY - 1) * 4 * orientBins)
    var o = 0
    var bx = 0
    while (bx < cellsX - 1) {
      var by = 0
      while (by < cellsY - 1) {
        val block = cells(bx)(by) ++ cells(bx + 1)(by) ++
          cells(bx)(by + 1) ++ cells(bx + 1)(by + 1)
        var ss = 0.0
        var i = 0
        while (i < block.length) { ss += block(i).toDouble * block(i); i += 1 }
        val inv = if (ss > 0) (1.0 / math.sqrt(ss)).toFloat else 0f
        i = 0
        while (i < block.length) { out(o) = block(i) * inv; o += 1; i += 1 }
        by += 1
      }
      bx += 1
    }
    out
  }

  /** [[imageHistogramFeatures]] with the HOG featurizer slotted into the
    * model-embedding seam: same (id, features) contract, same narrow
    * partition-local scale shape (pixels never leave the scan), but the
    * feature is a real visual descriptor — gradient structure, not just
    * a luminance density — so photometric near-duplicates cohere while
    * structurally different rasters separate under the SAME downstream
    * cosine operators (`Dedup.embeddingCosinePairs*`, the ANN stack).
    */
  def imageHogFeatures(
      media: Dataset[MediaRecord],
      cellsX: Int = 4, cellsY: Int = 4, orientBins: Int = 9): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        ImageIoDecoder.readImage(r.media)
          .map(img => (r.id, hogDescriptor(img, cellsX, cellsY, orientBins)))
      }
    }.toDF("id", "features")
  }

  /** Difference-hash (dHash) of a decodable image — the classic gradient
    * perceptual hash (Krawetz's public dHash formulation, as used by
    * image-dedup pipelines over web-scale scrapes): luminance sampled on a
    * 9×8 grid with the SAME integer nearest-neighbor mapping as
    * [[ImageResizer]] (sx = x·w÷9, sy = y·h÷8), one bit per horizontally
    * adjacent pair (right brighter than left), 64 bits returned as two
    * 32-bit halves so SQL oracles never fight BIGINT sign overflow. The
    * gradient encoding is what makes it PERCEPTUAL: global brightness /
    * contrast shifts leave every comparison — and so the hash — unchanged,
    * while structurally different images diverge. None when no reader
    * recognizes the bytes.
    */
  def imageDHash(bytes: Array[Byte]): Option[(Long, Long)] =
    ImageIoDecoder.readImage(bytes).map(dHashRaster)

  /** [[imageDHash]]'s raster-level core, shared with [[detectShots]]
    * (which hashes frames it already decoded).
    */
  def dHashRaster(img: java.awt.image.BufferedImage): (Long, Long) = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val grid = Array.tabulate(9, 8) { (x, y) =>
      val rgb = img.getRGB(x * sw / 9, y * sh / 8)
      (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
        (rgb & 0xFF) * 114) / 1000
    }
    var hi = 0L
    var lo = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(x + 1)(y) > grid(x)(y)) {
          val i = y * 8 + x
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** Shot-boundary detection — intra-payload segmentation of the
    * video-shaped modality: decode a multi-frame payload, dHash every
    * frame ([[dHashRaster]] — photometric drift within a shot cancels,
    * material changes don't), and cut wherever the perceptual hash
    * changes between consecutive frames; emit one row per shot with its
    * start frame and length. The whole operator is PARTITION-LOCAL: one
    * payload's frames decode in sequence on the executor that holds the
    * bytes, so shot grouping needs NO shuffle at all — at 100 TB this is
    * a pure narrow stage whose parallelism is the input split count.
    * Unrecognized payloads produce no rows.
    */
  def detectShots(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val frames = containerFrames(r.media)
        if (frames.isEmpty) Iterator.empty
        else {
          val hashes = frames.map(dHashRaster)
          val bounds = 0 +:
            (1 until hashes.size).filter(i => hashes(i) != hashes(i - 1))
          bounds.zipWithIndex.iterator.map { case (start, si) =>
            val end =
              if (si + 1 < bounds.size) bounds(si + 1) else hashes.size
            (r.id, si, start, end - start)
          }
        }
      }
    }.toDF("id", "shot_idx", "start_frame", "n_frames")
  }

  /** Perceptual image dedup — the image-side analogue of the text MinHash
    * family: hash every decodable payload ([[imageDHash]], narrow
    * partition-local decode where the bytes sit), bucket by the 64-bit
    * hash, label each bucket with its minimum id. Near-duplicates that
    * differ only photometrically (brightness/contrast grades, the classic
    * web-scrape duplicate) land in one bucket; the whole reduction is ONE
    * hash-partition exchange carrying (id, 16 bytes) rows — at 100 TB the
    * decode cost stays on the scan and nothing wide ever ships pixels.
    * Undecodable payloads yield no row (a hash over bytes that don't
    * parse as an image would be exact dedup, which [[Dedup.exact]]
    * already covers).
    */
  def imagePHashClusters(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.mapPartitions { it =>
      it.flatMap { r =>
        imageDHash(r.media).map { case (hi, lo) => (r.id, hi, lo) }
      }
    }.toDF("id", "ph_hi", "ph_lo")
    hashed.withColumn("cluster",
      org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("ph_hi", "ph_lo")))
  }

  /** Energy fingerprint of a decodable audio payload — the audio sibling
    * of [[imageDHash]]: the PCM stream (live JDK decode, any recognized
    * encoding) is split into `windows` equal frame windows (trailing
    * remainder frames dropped — closed-form windowing a SQL oracle can
    * restate), each window's energy is the exact integer sum of |sample|
    * over all channels, and one bit per adjacent window pair (next louder
    * than current) forms a `windows-1`-bit fingerprint. The gradient
    * encoding makes it PERCEPTUAL in the same sense as dHash: uniform
    * gain (volume grades, the classic re-encode duplicate) scales every
    * window energy equally and leaves all comparisons — and the
    * fingerprint — unchanged, while different material diverges. None
    * when no provider recognizes the bytes or the stream is shorter than
    * `windows` frames.
    */
  def audioEnergyFingerprint(
      bytes: Array[Byte], windows: Int = 16): Option[Long] = {
    require(windows >= 2 && windows <= 64,
      s"windows must be in [2, 64], got $windows")
    AudioSystemDecoder.pcm16(bytes).flatMap { case (_, ch, pcm) =>
      val frames = pcm.length / (ch * 2)
      if (frames < windows) None
      else {
        val win = frames / windows
        val energy = new Array[Long](windows)
        var f = 0
        while (f < win * windows) {
          var c = 0
          var e = 0L
          while (c < ch) {
            val i = (f * ch + c) * 2
            val s = (((pcm(i + 1) << 8) | (pcm(i) & 0xFF))).toShort
            e += math.abs(s.toInt)
            c += 1
          }
          energy(f / win) += e
          f += 1
        }
        var fp = 0L
        var w = 0
        while (w < windows - 1) {
          if (energy(w + 1) > energy(w)) fp |= 1L << w
          w += 1
        }
        Some(fp)
      }
    }
  }

  /** Perceptual audio dedup: fingerprint every decodable payload
    * ([[audioEnergyFingerprint]], narrow partition-local decode), bucket
    * by the fingerprint, label each bucket with its minimum id — the same
    * ONE hash-partition exchange of (id, 8B) rows as
    * [[imagePHashClusters]]; PCM never ships. Volume grades of one
    * recording collapse into one bucket. Undecodable / too-short payloads
    * yield no row.
    */
  def audioFPClusters(
      media: Dataset[MediaRecord], windows: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.mapPartitions { it =>
      it.flatMap { r =>
        audioEnergyFingerprint(r.media, windows).map(fp => (r.id, fp))
      }
    }.toDF("id", "fp")
    hashed.withColumn("cluster",
      org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
  }

  /** Modality-dispatched perceptual fingerprints — the probe unit the
    * dedup-at-ingest stream shares with the batch operators: a payload
    * that decodes as an image yields its dHash halves tagged `image`
    * ([[imageDHash]] — multi-frame payloads hash their first frame); else
    * a payload that decodes as audio yields its energy fingerprint tagged
    * `audio` ([[audioEnergyFingerprint]]); undecodable payloads yield no
    * row. The tag keeps the two 64-bit hash spaces from colliding in one
    * bucket domain. Narrow partition-local decode, (id, tag, 16 B) out.
    */
  def perceptualFingerprints(
      media: Dataset[MediaRecord], windows: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        imageDHash(r.media).map { case (hi, lo) => (r.id, "image", hi, lo) }
          .orElse(audioEnergyFingerprint(r.media, windows)
            .map(fp => (r.id, "audio", fp, 0L)))
          .iterator
      }
    }.toDF("id", "mod", "h1", "h2")
  }

  /** REAL frame extraction for multi-frame containers — [[frameSample]]
    * gone live for the video-shaped modality: each recognized payload is
    * decoded frame-by-frame (the JDK's multi-image readers; animated GIF
    * in this environment — a codec-backed [[MediaDecoder]] slots in the
    * same shape for real video), every `stride`-th DECODED frame is kept
    * and re-encoded as a standalone 24-bit BMP via the spec assembler, so
    * each emitted frame is a valid image any reader consumes and the
    * output bytes are closed-form in the decoded raster. Byte-slicing
    * ([[frameSample]]) cuts mid-structure and emits headerless fragments;
    * this is the keyframe-sampling shape a vision pipeline feeds its
    * models. Unrecognized payloads produce NO frames — route mixed
    * corpora by `kind` first. Narrow partition-local flatMap, no shuffle;
    * parallelism = input split count.
    */
  def extractFrames(
      media: Dataset[MediaRecord],
      stride: Int): Dataset[MediaFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val frames = containerFrames(r.media)
        Iterator.range(0, frames.size, stride).map { i =>
          val img = frames(i)
          MediaFrame(r.id, i,
            BmpBytes.encode24(img.getWidth, img.getHeight,
              (x, y) => img.getRGB(x, y) & 0xFFFFFF))
        }
      }
    }
  }

  /** Container dispatch for the multi-frame decode: RIFF/AVI payloads go
    * through the [[AviBytes]] walker (MJPEG frames via the JPEG decoder),
    * everything else through the JDK multi-image readers (animated GIF).
    * One seam, so [[extractFrames]] and [[detectShots]] handle both
    * containers identically.
    */
  def containerFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
    if (AviBytes.isAvi(bytes)) AviBytes.readFrames(bytes)
    else ImageIoDecoder.readFrames(bytes)

  /** Container-aware audio segmentation — [[frameSample]] done RIGHT for
    * audio: each recognized payload is decoded to PCM (live JDK providers,
    * transcoding non-PCM16 encodings), sliced on FRAME boundaries into
    * `segmentFrames`-frame chunks, and each chunk re-emitted as a VALID
    * standalone 16-bit PCM WAV ([[WavBytes.wrapPcm16]]) that any reader —
    * including our own [[AudioSystemDecoder.metadata]] — re-parses. Byte
    * slicing would split samples mid-word and emit headerless fragments;
    * this is the shape a speech pipeline actually feeds its models.
    * Payloads no provider recognizes produce NO segments (a codec can't
    * segment what it can't parse) — route mixed corpora by `kind` first.
    * Narrow partition-local flatMap, no shuffle; output volume ≈ input
    * PCM bytes + 44 per segment, parallelism = input split count.
    */
  def segmentAudio(
      media: Dataset[MediaRecord],
      segmentFrames: Int): Dataset[MediaFrame] = {
    require(segmentFrames >= 1, s"segmentFrames must be >= 1, got $segmentFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        AudioSystemDecoder.pcm16(r.media) match {
          case None => Iterator.empty
          case Some((rate, ch, pcm)) =>
            val segBytes = segmentFrames * ch * 2
            // Long ceil-division, same overflow reasoning as frameSample
            val n = ((pcm.length.toLong + segBytes - 1) / segBytes).toInt
            Iterator.range(0, n).map { i =>
              val start = i.toLong * segBytes
              val end = math.min(pcm.length.toLong, start + segBytes).toInt
              MediaFrame(r.id, i, WavBytes.wrapPcm16(rate, ch,
                java.util.Arrays.copyOfRange(pcm, start.toInt, end)))
            }
        }
      }
    }
  }

  def frameSample(
      media: Dataset[MediaRecord],
      frameBytes: Int,
      stride: Int): Dataset[MediaFrame] = {
    require(frameBytes >= 1 && stride >= 1,
      s"frameBytes and stride must be >= 1, got $frameBytes/$stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.media == null) Array.empty[Byte] else r.media
        // Long ceil-division: len + frameBytes - 1 overflows Int for
        // frameBytes near Int.MaxValue (nFrames would go negative and the
        // record would silently vanish)
        val nFrames = ((bytes.length.toLong + frameBytes - 1) / frameBytes).toInt
        Iterator.range(0, nFrames, stride).map { i =>
          // end offset in Long too: (i + 1) * frameBytes overflows Int for
          // the last frames of a ~2 GiB payload, turning the min() negative
          // and failing the task
          MediaFrame(r.id, i,
            java.util.Arrays.copyOfRange(bytes, i * frameBytes,
              math.min(bytes.length.toLong, (i + 1L) * frameBytes).toInt))
        }
      }
    }
  }
}
