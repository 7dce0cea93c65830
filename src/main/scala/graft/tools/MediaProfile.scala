package graft.tools

import java.util.concurrent.Executors

import graft.ext.MultiModal

/** Standalone (no-Spark) profiler for the GIF codec hot path — isolates
  * whether a `multimodal_gif_frames` bench outlier is the codec (this
  * probe moves with it) or the session (this probe stays flat). Times
  * encode-only and decode-only over the same deterministic spec
  * distribution the catalog entry uses, single-threaded and on N
  * threads (the bench runs 32 partition tasks concurrently — a
  * synchronized JDK internal shows up as a 1-vs-N divergence here).
  *
  * Usage: runMain graft.tools.MediaProfile [nDocs] [threads]
  */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val threads = args.drop(1).headOption.map(_.toInt).getOrElse(32)

    def specs(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, (i % 24 + 8).toInt, ((i * 5) % 24 + 8).toInt, (i % 6 + 4))
    }

    def encodeAll(ss: Seq[(Long, Int, Int, Int)]): Seq[(Long, Array[Byte])] = {
      val c = new MultiModal.GifCodec
      ss.map { case (id, w, h, f) => (id, c.encode(id, w, h, f)) }
    }
    def decodeAll(bs: Seq[(Long, Array[Byte])]): Long = {
      val c = new MultiModal.GifCodec
      bs.map { case (id, b) => c.decodeSampled(id, b, 4).sampleIdxSum }.sum
    }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[media] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warm: JIT + ImageIO plugin init
    decodeAll(encodeAll(specs(0, 200)))

    val all = specs(0, n)
    val blobs = time(s"encode x$n, 1 thread")(encodeAll(all))
    time(s"decode x$n, 1 thread")(decodeAll(blobs))

    val pool = Executors.newFixedThreadPool(threads)
    val chunks = all.grouped(math.max(1, n / threads)).toSeq
    val enc2 = time(s"encode x$n, $threads threads") {
      chunks.map(ch => pool.submit(() => encodeAll(ch))).map(_.get())
    }
    time(s"decode x$n, $threads threads") {
      chunks.zip(enc2).map { case (_, bs) =>
        pool.submit(() => decodeAll(bs))
      }.foreach(_.get())
    }
    pool.shutdown()
  }
}
