package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decode throughput over the STORED media table (VERDICT r11 #1's
  * "recorded decode throughput number"): reads each payload family back
  * from parquet and drives the live JDK decode paths the operators use —
  * header probes, full raster decode + dHash, WAV PCM decode + window
  * energies, multi-frame GIF extraction — reporting rows/s and
  * rows/s/core. Usage: `ProbeMediaDecode <mediaParquetDir> [cores]`.
  */
object ProbeMediaDecode {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Multimodal

    def records(kind: String) = spark.read.parquet(dir)
      .where(col("kind") === kind)
      .select(col("doc_id").as("id"), col("modality").as("kind"),
        col("payload").as("media"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sampleRateHz"))
      .as[Multimodal.MediaRecord]

    def time(name: String)(job: => Long): Unit = {
      job // warm: codegen + JIT + page cache
      val t0 = System.nanoTime()
      val rows = job
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[media-decode] $name%-22s $rows%9d rows in $secs%6.1fs = " +
        f"${rows / secs}%9.0f rows/s (${rows / secs / cores}%7.0f rows/s/core)")
    }

    time("image header probe") {
      Multimodal.transform(records("img_dims"),
        new Multimodal.ImageDimensionProbe()).filter(_.width > 0).count()
    }
    time("image decode+dhash") {
      Multimodal.imagePHashClusters(records("img_phash")).count()
    }
    time("image decode+resize") {
      Multimodal.transform(records("img_resize"),
        new Multimodal.ImageResizer(7, 5)).filter(_.media.length > 0).count()
    }
    time("wav pcm+fingerprint") {
      Multimodal.audioFPClusters(records("wav_fp"), windows = 16).count()
    }
    time("wav segment+reemit") {
      Multimodal.segmentAudio(records("wav_segment"), segmentFrames = 160).count()
    }
    time("gif frames+bmp") {
      Multimodal.extractFrames(records("gif_frames"), stride = 2).count()
    }
    spark.stop()
  }
}
