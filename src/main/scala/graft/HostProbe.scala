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
    val a = (Bench.calibrate(1), Bench.calibrate(n), Bench.calibrateMem())
    Thread.sleep(3000)
    val b = (Bench.calibrate(1), Bench.calibrate(n), Bench.calibrateMem())
    val c1 = math.min(a._1, b._1)
    val cn = math.min(a._2, b._2)
    val cm = math.min(a._3, b._3)
    println(f"calib1=$c1%.3f calibn=$cn%.3f calibm=$cm%.3f")
  }
}
