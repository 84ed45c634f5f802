package graft

/** Single-thread microbenchmark of the WAV decode path (no Spark): where
  * does the per-payload time go — container parse, PCM materialize, or
  * the fingerprint loop?
  */
object ProbeWavMicro {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val bytes = Multimodal.WavBytes.encodePcm16(8000, 1, 640,
      (f, _) => ((f * 17) % 4096 - 2048).toShort)
    def time(name: String, n: Int)(f: => Unit): Unit = {
      (0 until 2000).foreach(_ => f)
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"[wav-micro] $name%-14s ${(System.nanoTime() - t0) / 1000.0 / n}%8.2f us/op")
    }
    time("fingerprint", 20000) {
      Multimodal.audioEnergyFingerprint(bytes, 16); ()
    }
    time("metadata", 20000) {
      Multimodal.AudioSystemDecoder.metadata(bytes); ()
    }
    time("fileType", 20000) {
      Multimodal.AudioSystemDecoder.fileType(bytes); ()
    }
  }
}
