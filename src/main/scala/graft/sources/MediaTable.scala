package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.{AviBytes, BmpBytes, GifBytes, JpegBytes, PngBytes, WavBytes}

/** The STORED binary-media corpus: a parquet table of image/audio/video
  * payload blobs alongside the log/doc tables — the analogue of the
  * reference's absorb-anything payload columns
  * (/root/reference/schema.sql:12-14) at training-corpus scale. One row
  * per (document, payload family), payloads generated executor-side from
  * closed-form specs keyed by `doc_id`, so a SQL oracle over the
  * `documents` table can restate every decoded raster/sample
  * arithmetically while the ENGINE sees only what production would see: a
  * binary column read back from parquet.
  *
  * Physical design for the 100 TB case:
  *   - `partitionBy(kind)`: each payload family is its own directory, so
  *     a query over one family (`kind = 'img_phash'`) prunes at the
  *     DIRECTORY level and never lists, let alone reads, the others.
  *   - payloads are opaque `BINARY`; metadata (`modality`, `fmt`) are
  *     plain columns, so metadata-only queries prune the blob column via
  *     parquet column pruning (ReadSchema excludes `payload`).
  *   - the build is a narrow flatMap over `documents` — no shuffle; at
  *     scale the generator parallelism is the doc-scan split count
  *     (bumped to the session default parallelism so a single-file
  *     sf0.01 docs table still builds in parallel).
  *
  * Image families alternate codec by row — spec-assembled BMP for even
  * `doc_id`, JDK-encoded PNG for odd ([[PngBytes]]) — so every consumer
  * of this table exercises a compressed codec on half its rows. PNG
  * container length is encoder-dependent; only decoded CONTENT is
  * closed-form for those rows. The `*_jpeg` families carry the LOSSY
  * codec ([[JpegBytes]]): there, only header geometry is exact and
  * perceptual signatures are certified statistically, never per-pixel.
  */
object MediaTable {

  /** Storage schema; `kind` is the partition column. */
  case class MediaRow(
      doc_id: Long,
      kind: String,
      modality: String,
      fmt: String,
      payload: Array[Byte])

  /** One payload family per consumer operator; the closed forms below are
    * the SINGLE source of truth shared (by restatement) with the DuckDB
    * oracles in [[graft.Queries]].
    */
  val Kinds: Seq[String] = Seq(
    "img_dims", "img_resize", "img_phash", "img_embed",
    "wav_meta", "wav_segment", "wav_fp", "gif_frames", "gif_shots",
    "avi_frames",
    "img_dims_jpeg", "img_phash_jpeg")

  private def imageFmt(id: Long): String = if (id % 2 == 0) "bmp" else "png"

  private def encodeImage(
      id: Long, w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] =
    if (id % 2 == 0) BmpBytes.encode24(w, h, px)
    else PngBytes.encode24(w, h, px)

  /** The closed-form payloads for one document (one per [[Kinds]] entry). */
  def rowsFor(id: Long): Seq[MediaRow] = {
    val dims = {
      val w = 16 + (id % 13).toInt
      val h = 8 + (id % 7).toInt
      MediaRow(id, "img_dims", "image", imageFmt(id),
        encodeImage(id, w, h, (x, y) => ((x * 7 + y * 13 + id) & 0xFF).toInt))
    }
    val resize = {
      val w = 16 + (id % 13).toInt
      val h = 8 + (id % 7).toInt
      MediaRow(id, "img_resize", "image", imageFmt(id),
        encodeImage(id, w, h, (x, y) => {
          val g = ((x * 7 + y * 13 + id * 3) % 256).toInt
          g * 0x010101 // gray — any one channel restates it
        }))
    }
    val phash = {
      val p = (id % 7).toInt
      val (w, h) = (10 + p, 8 + p % 3)
      val b = ((id / 7) % 3).toInt * 10 // photometric grade: dHash-invariant
      MediaRow(id, "img_phash", "image", imageFmt(id),
        encodeImage(id, w, h, (x, y) => {
          val g = ((x * 7 + y * 13 + p * 29) % 200) + b
          g * 0x010101
        }))
    }
    val embed = {
      val p = (id % 8).toInt
      val (w, h) = (12 + p, 9 + p % 4)
      val b = ((id / 8) % 3).toInt * 8 // slight photometric grade
      MediaRow(id, "img_embed", "image", imageFmt(id),
        encodeImage(id, w, h, (x, y) => {
          val g = ((x * 7 + y * 13 + p * 23) % 240) + b
          g * 0x010101
        }))
    }
    val wavMeta = {
      val rate = 8000 + (id % 5).toInt * 1000
      val ch = 1 + (id % 2).toInt
      val frames = 400 + (id % 11).toInt * 40
      MediaRow(id, "wav_meta", "audio", "wave",
        WavBytes.encodePcm16(rate, ch, frames,
          (f, c) => ((f * 31 + c * 7 + id) % 8191 - 4095).toShort))
    }
    val wavSegment = {
      val rate = 8000 + (id % 5).toInt * 1000
      val ch = 1 + (id % 2).toInt
      val frames = 350 + (id % 9).toInt * 25
      MediaRow(id, "wav_segment", "audio", "wave",
        WavBytes.encodePcm16(rate, ch, frames,
          (f, c) => ((f * 17 + c * 5 + id) % 4096 - 2048).toShort))
    }
    val wavFp = {
      val p = (id % 6).toInt
      val v = 1 << ((id / 6) % 3).toInt // volume grade: fp-invariant
      val frames = 480 + p * 32 // multiple of 16: the windowing drops nothing
      MediaRow(id, "wav_fp", "audio", "wave",
        WavBytes.encodePcm16(8000, 1, frames,
          // slope varies PER PATTERN (different sawtooth period =>
          // different window-energy shape); phase alone would leave
          // near-identical energies and collide every fingerprint
          (f, _) => (((f * (11 + p * 6)) % 4096 - 2048) * v).toShort))
    }
    val gifFrames = {
      val w = 6 + (id % 5).toInt
      val h = 4 + (id % 3).toInt
      val nf = 5 + (id % 6).toInt
      MediaRow(id, "gif_frames", "video", "gif",
        GifBytes.encodeGray(w, h, nf,
          (f, x, y) => ((f * 31 + x * 7 + y * 13 + id) % 256).toInt))
    }
    val gifShots = {
      val p = (id % 5).toInt
      val cut = 2 + (id % 4).toInt
      val nf = 6 + (id % 5).toInt
      MediaRow(id, "gif_shots", "video", "gif",
        GifBytes.encodeGray(12, 9, nf, (f, x, y) => {
          // the material change flips the luminance-gradient DIRECTION
          // (two same-sign slopes can share every dHash bit; a flip
          // cannot), in-shot frames drift only in brightness
          val xx = if (f < cut) x else 11 - x
          ((xx * 9 + y * 7) % 180) + p * 8 + f * 3
        }))
    }
    val dimsJpeg = {
      // the img_dims geometry family again, now through the LOSSY codec:
      // header geometry is exact under JPEG even though pixels are not,
      // so the dims oracle stays hash-verifiable; the raster is a smooth
      // gradient (content is irrelevant to the dims probe)
      val w = 16 + (id % 13).toInt
      val h = 8 + (id % 7).toInt
      MediaRow(id, "img_dims_jpeg", "image", "jpeg",
        JpegBytes.encode24(w, h,
          (x, y) => (((x * 5 + y * 9 + id) % 256).toInt) * 0x010101))
    }
    val phashJpeg = {
      // JPEG-robust perceptual family: 7 patterns × 3 brightness grades,
      // drawn as 8-px-aligned FLAT blocks at 4 luminance levels keyed by
      // a splitmix64-mixed (pattern, block) seed. Flat blocks aligned to
      // JPEG's 8×8 DCT grid survive quantization nearly DC-exact
      // (measured: 210/210 dHashes bit-identical to the lossless raster
      // at quality 0.85), and 4-level blocks give patterns distinct
      // dHash transition signatures (pairwise cluster precision 1.0) —
      // unlike img_phash's mod-sawtooth rasters, whose wrap-edge
      // gradients JPEG smooths away (measured precision 0.77). Exact
      // hashes still depend on the encoder, so the consuming row
      // certifies cluster recall/precision booleans, never hash bits.
      val p = (id % 7).toInt
      val g = ((id / 7) % 3).toInt * 10 // photometric grade: dHash-invariant
      MediaRow(id, "img_phash_jpeg", "image", "jpeg",
        JpegBytes.encode24(32, 24, (x, y) => {
          var z = p * 12L + (y / 8) * 4L + (x / 8) + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          (40 + (z & 3L).toInt * 50 + g) * 0x010101
        }))
    }
    val aviFrames = {
      // a REAL video container (RIFF walk + the existing JPEG decoder):
      // frame geometry and count are exact container arithmetic; frame
      // CONTENT rides the lossy codec, so each frame is FLAT — one
      // luminance level, closed-form in (doc, frame) — which JPEG's DCT
      // reconstructs DC-exact to within the DC quantization step (±2 at
      // quality 0.85, probed); the consuming row checks a ±3 band
      // boolean, never pixel hashes (JpegBytes' contract)
      val w = 16 + (id % 3).toInt * 8
      val h = 8 + (id % 2).toInt * 8
      val nf = 4 + (id % 5).toInt
      MediaRow(id, "avi_frames", "video", "avi",
        AviBytes.encodeMjpeg(w, h, 10, (0 until nf).map { f =>
          val g = (40 + ((id * 31 + f * 17) % 20).toInt * 8) & 0xFF
          JpegBytes.encode24(w, h, (_, _) => g * 0x010101)
        }))
    }
    Seq(dims, resize, phash, embed, wavMeta, wavSegment, wavFp,
      gifFrames, gifShots, aviFrames, dimsJpeg, phashJpeg)
  }

  /** Generate the corpus from a `documents` frame — a narrow flatMap, one
    * task per input split (single-file doc tables are re-spread to the
    * session default parallelism so the codec encodes run on every core).
    */
  def build(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.select(col("doc_id").cast("long")).as[Long]
    val parts = math.max(ids.rdd.getNumPartitions,
      spark.sparkContext.defaultParallelism)
    ids.repartition(parts).flatMap(rowsFor _)
  }

  def write(docs: DataFrame, out: String): Unit =
    build(docs).write.mode("overwrite").partitionBy("kind").parquet(out)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
