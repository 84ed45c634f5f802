package graft

import graft.operators.Multimodal
import graft.sources.MediaTable
import org.apache.spark.sql.functions._

/** The stored binary-media corpus: codec round-trips (incl. the
  * compressed PNG path), every payload family decodable by the live JDK
  * readers, and the table's scale-critical read shapes — directory-level
  * partition pruning on `kind` and blob-column pruning for metadata-only
  * projections.
  */
class MediaTableSpec extends SparkTestBase {
  import spark.implicits._

  test("PNG encode/decode round-trips the raster bit-exactly (lossless RGB)") {
    val px = (x: Int, y: Int) => ((x * 31 + y * 57 + 11) % 251) * 0x010101 + x
    val bytes = Multimodal.PngBytes.encode24(13, 9, px)
    assert(Multimodal.ImageIoDecoder.formatName(bytes).contains("png"))
    assert(Multimodal.ImageIoDecoder.dimensions(bytes).contains((13, 9)))
    val img = Multimodal.ImageIoDecoder.readImage(bytes).get
    for (y <- 0 until 9; x <- 0 until 13)
      assert((img.getRGB(x, y) & 0xFFFFFF) == (px(x, y) & 0xFFFFFF),
        s"pixel ($x,$y) drifted through the PNG round-trip")
  }

  test("JPEG: header geometry exact, dHash clusters stable through the lossy round-trip") {
    // dims family: geometry survives the lossy codec exactly
    for (id <- 0L to 20L) {
      val r = MediaTable.rowsFor(id).find(_.kind == "img_dims_jpeg").get
      assert(r.fmt == "jpeg")
      assert(Multimodal.ImageIoDecoder.formatName(r.payload).contains("jpeg"))
      assert(Multimodal.ImageIoDecoder.dimensions(r.payload)
        .contains((16 + (id % 13).toInt, 8 + (id % 7).toInt)))
    }
    // phash family: the decoded-JPEG dHash must equal the dHash of the
    // closed-form lossless raster for every (pattern, grade) — the
    // block design's whole point (8-px-aligned flat blocks are DC-exact
    // under quantization) — which forces perfect cluster recall AND
    // separation on the planted structure
    def losslessRaster(id: Long): java.awt.image.BufferedImage = {
      val p = (id % 7).toInt
      val g = ((id / 7) % 3).toInt * 10
      val img = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 24) {
        var z = p * 12L + (y / 8) * 4L + (x / 8) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        img.setRGB(x, y, ((40 + (z & 3L).toInt * 50 + g) * 0x010101))
      }
      img
    }
    val hashes = (0L until 21L).map { id =>
      val r = MediaTable.rowsFor(id).find(_.kind == "img_phash_jpeg").get
      val jpegHash = Multimodal.imageDHash(r.payload).get
      assert(jpegHash == Multimodal.dHashRaster(losslessRaster(id)),
        s"doc $id: dHash drifted through the JPEG round-trip")
      id -> jpegHash
    }
    // 21 ids = all 7 patterns × 3 grades: grades collapse, patterns don't
    assert(hashes.groupBy(_._2).size == 7)
    for (Seq((a, ha), (b, hb)) <- hashes.combinations(2))
      assert((ha == hb) == (a % 7 == b % 7),
        s"docs $a/$b: cluster structure broke under JPEG")
  }

  test("HOG featurizer in the embedding seam: a real descriptor drives the same cosine dedup, surviving JPEG") {
    import graft.operators.{Dedup, Multimodal}
    // 7 patterns × 3 grades × 2 repeats of the stored JPEG phash family,
    // through the NON-TOY featurizer (Dalal–Triggs HOG) slotted where
    // the luminance histogram stands — same (id, features) contract,
    // same downstream operator, oracle rows untouched
    val n = 42L
    val recs = (0L until n).map { id =>
      val row = MediaTable.rowsFor(id).find(_.kind == "img_phash_jpeg").get
      Multimodal.MediaRecord(id, row.modality, row.payload, 0, 0, 0)
    }
    val feats = Multimodal.imageHogFeatures(recs.toDS())
    assert(feats.count() == n, "every JPEG payload must featurize")
    // descriptor dim is fixed regardless of input raster size
    assert(feats.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(3 * 3 * 4 * 9))
    // probe-measured structure: same-pattern grades cohere at cosine
    // 1.0000 EVEN THROUGH JPEG (brightness shifts only the quantized DC
    // coefficient; gradients and block norms cancel the rest), while
    // distinct patterns sit at <= 0.89 — so a 0.95 threshold through the
    // UNCHANGED exact cosine operator must recover exactly the planted
    // same-pattern pairs
    val pairs = Dedup.embeddingCosinePairsExact(
        feats, "id", "features", threshold = 0.95, maxId = n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n; if a % 7 == b % 7
    } yield (a, b)).toSet
    assert(pairs == expected,
      s"HOG cosine clusters must equal the planted patterns " +
        s"(got ${pairs.size}, want ${expected.size})")
  }

  test("AviBytes: header meta, frame walk and JPEG DC-stability of the stored MJPEG family") {
    import graft.operators.Multimodal.AviBytes
    for (id <- 0L to 20L) {
      val r = MediaTable.rowsFor(id).find(_.kind == "avi_frames").get
      val w = 16 + (id % 3).toInt * 8
      val h = 8 + (id % 2).toInt * 8
      val nf = 4 + (id % 5).toInt
      assert(AviBytes.isAvi(r.payload))
      // header geometry and frame count are exact container arithmetic
      assert(AviBytes.headerMeta(r.payload).contains((w, h, nf, 100000)))
      val frames = AviBytes.readFrames(r.payload)
      assert(frames.size == nf, s"doc $id: ${frames.size} frames, want $nf")
      for ((img, f) <- frames.zipWithIndex) {
        assert(img.getWidth == w && img.getHeight == h)
        // flat frames reconstruct DC-exact to within the quantization
        // step: every pixel within +-3 of the planted level
        val g = (40 + ((id * 31 + f * 17) % 20).toInt * 8) & 0xFF
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 +
            ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
          assert(math.abs(lum - g) <= 3,
            s"doc $id frame $f pixel ($x,$y): lum $lum vs planted $g")
        }
      }
    }
    // the container dispatch: extractFrames walks AVI and GIF through one
    // seam — and a truncated/garbage payload yields no frames, not a throw
    assert(AviBytes.readFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviBytes.readFrames(
      MediaTable.rowsFor(3L).find(_.kind == "avi_frames").get
        .payload.take(40)).isEmpty)
    assert(AviBytes.headerMeta(Array.emptyByteArray).isEmpty)
  }

  test("rowsFor: every family decodes through the live JDK readers with spec'd metadata") {
    for (id <- 0L to 30L) {
      val rows = MediaTable.rowsFor(id)
      assert(rows.map(_.kind) == MediaTable.Kinds)
      val byKind = rows.map(r => r.kind -> r).toMap
      // image families: declared fmt alternates by doc_id and matches the
      // container; header dims match the closed forms
      for (k <- Seq("img_dims", "img_resize", "img_phash", "img_embed")) {
        val r = byKind(k)
        assert(r.fmt == (if (id % 2 == 0) "bmp" else "png"))
        assert(Multimodal.ImageIoDecoder.formatName(r.payload).contains(r.fmt))
      }
      assert(Multimodal.ImageIoDecoder.dimensions(byKind("img_dims").payload)
        .contains((16 + (id % 13).toInt, 8 + (id % 7).toInt)))
      // audio families: RIFF metadata matches the closed forms
      val (rate, ch, frames) =
        Multimodal.AudioSystemDecoder.metadata(byKind("wav_meta").payload).get
      assert(rate.toInt == 8000 + (id % 5).toInt * 1000)
      assert(ch == 1 + (id % 2).toInt)
      assert(frames == 400L + (id % 11) * 40)
      // video families: the multi-image reader sees the spec'd frame count
      assert(Multimodal.ImageIoDecoder.readFrames(byKind("gif_frames").payload)
        .size == 5 + (id % 6).toInt)
      assert(Multimodal.ImageIoDecoder.readFrames(byKind("gif_shots").payload)
        .size == 6 + (id % 5).toInt)
    }
  }

  test("stored table: partition pruning on kind, blob-column pruning for metadata-only reads") {
    val out = tmp("graft-media-table")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .where(col("doc_id") < 64)
    MediaTable.write(docs, out)
    val table = MediaTable.read(spark, out)
    assert(table.count() == 64L * MediaTable.Kinds.size)

    // one family's query lists/reads ONLY that family's directory —
    // asserted on the EXECUTED scan's numFiles metric (inputFiles is
    // logical-plan-level and blind to partition pruning)
    val one = table.where(col("kind") === "img_phash")
    assert(one.count() == 64)
    val totalFiles = table.inputFiles.length
    val filesPerKind = totalFiles / MediaTable.Kinds.size
    val executed = one.select("doc_id")
    assert(executed.collect().length == 64)
    val scanNode = executed.queryExecution.executedPlan.collectLeaves().head
    assert(scanNode.toString.contains("PartitionFilters"),
      s"kind must be a pushed partition filter:\n$scanNode")
    val numFiles = scanNode.metrics("numFiles").value
    assert(numFiles == filesPerKind && numFiles < totalFiles,
      s"partition pruning must confine the read: $numFiles of $totalFiles files")

    // a metadata-only projection must not read the payload column
    val meta = table.where(col("kind") === "wav_meta").select("doc_id", "fmt")
    val scan = meta.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema") && !scan.contains("payload"),
      s"blob column must be pruned from the scan:\n$scan")

    // payloads survive the parquet round-trip byte-for-byte: the read-back
    // blob re-decodes and matches the generator's spec (one probe per family)
    val phash = one.select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    for (id <- 0L until 64L) {
      val p = (id % 7).toInt
      assert(Multimodal.ImageIoDecoder.dimensions(phash(id))
        .contains((10 + p, 8 + p % 3)))
    }
  }
}
