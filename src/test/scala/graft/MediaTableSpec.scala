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

  test("rowsFor: all nine families decode through the live JDK readers with spec'd metadata") {
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
