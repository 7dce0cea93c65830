package graft.tools

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import graft.ext.MultiModal.WavCodec

/** Profiling main behind WavCodec's SPI-provider design (round 7).
  *
  * Question: after parallelizing the multimodal pipelines
  * (spreadByRange), multimodal_wav_roundtrip got SLOWER (1.46s bench →
  * 2.12s), unlike every image entry. Hypothesis: the AudioSystem static
  * entry points serialize under concurrency.
  *
  * Measured (5000 docs' WAV blobs, median of 3, local JVM, round 7):
  *   AudioSystem.getAudioInputStream decode: 1 thread 0.563s,
  *     32 threads 0.605s — NOT parallel; AudioSystem.write encode:
  *     1 thread 0.174s, 32 threads 0.341s — 2x SLOWER under threads.
  *   Direct SPI provider instances (javax.sound.sampled.spi
  *     .AudioFileReader/Writer via ServiceLoader, one per thread):
  *     decode 1 thread 0.019s / 32 threads 0.009s; encode 0.041s /
  *     0.008s — 30x faster serial AND thread-scalable.
  * Root cause: every AudioSystem call re-walks the provider registry
  * and probes each reader with exception control flow (UnsupportedAudio
  * FileException per non-matching provider, per call).
  * Fix: WavCodec holds one reader + one writer SPI instance per codec
  * (= per partition). This main re-measures both paths so the finding
  * stays reproducible.
  *
  * Usage: runMain graft.tools.WavContention [nDocs]
  */
object WavContention {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    def specs(i: Int) = ((i % 3) * 11025 + 11025, i % 2 + 1, i % 500 + 100)
    val fixture = new WavCodec
    val blobs = Array.tabulate(n) { i =>
      val (r, c, f) = specs(i); fixture.encode(i, r, c, f)
    }
    def timeIt(label: String)(work: => Unit): Unit = {
      work // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s ${ts(1)}%.3f s")
    }
    def onThreads(k: Int)(per: Int => Unit): Unit = {
      val threads = (0 until k).map { t =>
        new Thread(() => { var i = t; while (i < n) { per(i); i += k } })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
    def legacyDecode(i: Int): Unit = {
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(blobs(i)))
      try ais.readAllBytes() finally ais.close()
    }
    timeIt("audiosystem_decode_1t") { var i = 0; while (i < n) { legacyDecode(i); i += 1 } }
    timeIt("audiosystem_decode_32t") { onThreads(32)(legacyDecode) }
    timeIt("spi_codec_decode_1t") {
      val c = new WavCodec; var i = 0
      while (i < n) { c.decode(i, blobs(i)); i += 1 }
    }
    timeIt("spi_codec_decode_32t") {
      val codecs = Array.fill(32)(new WavCodec)
      val threads = (0 until 32).map { t =>
        new Thread(() => {
          var i = t; while (i < n) { codecs(t).decode(i, blobs(i)); i += 32 }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
  }
}
