package graft

/** One host-health probe reading on [[Bench]]'s own instruments —
  * the healthy-window watcher's measurement arm (r19 verdict item 2:
  * "script the watch" — the window the 23 pending denominators need
  * never appeared while a human was looking; a loop has to look).
  *
  * Prints ONE line: `calib1=A calibn=B calibm=C` — min-of-two probe
  * triples ~3 s apart, the same estimator every Bench decision uses,
  * so "the watcher saw healthy" and "the bench would have seen
  * healthy" are the same statement. Runs WITHOUT a SparkSession (pure
  * JVM: LCG ALU spin + strided 64 MB reads), so a probe costs ~8 s
  * and can fire every few minutes without disturbing the host it
  * measures. `tools/healthy_watch.sh` drives it. */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // FRESH-JVM BIAS FIX (r21): measured on an idle healthy host, a
    // cold JVM's first calibrateMem readings run 1.5-2.2x the value a
    // warmed long-lived JVM (the Bench session) reads moments later —
    // probe-array allocation/paging and GC settling bill as bandwidth
    // (observed: HostProbe 0.044-0.047 at 2 g heap / 0.031 at 32 g,
    // vs 0.021 from the SAME host's in-sweep Bench probes). The r20
    // watch compared that biased reading against the 0.026 in-session
    // threshold, so it could sit on a healthy host all round and
    // never fire. Two discarded warm-up triples bring the JVM to the
    // steady state the threshold was calibrated on; the measured
    // min-of-two pair is unchanged.
    Bench.calibrate(1); Bench.calibrate(n); Bench.calibrateMem()
    Bench.calibrateMem()
    Thread.sleep(1000)
    val a = (Bench.calibrate(1), Bench.calibrate(n), Bench.calibrateMem())
    Thread.sleep(3000)
    val b = (Bench.calibrate(1), Bench.calibrate(n), Bench.calibrateMem())
    val c1 = math.min(a._1, b._1)
    val cn = math.min(a._2, b._2)
    val cm = math.min(a._3, b._3)
    println(f"calib1=$c1%.3f calibn=$cn%.3f calibm=$cm%.3f")
  }
}
