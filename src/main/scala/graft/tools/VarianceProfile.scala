package graft.tools

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Intra-session variance attribution: the same catalog entry in the
  * same quiet session can swing 10-15x between reps (observed:
  * dedup_graph_triangles 2.2 s .. 31 s). This tool runs one entry N
  * times and, for every rep, prints the slowest stages with the
  * metrics that separate the hypotheses:
  *   - cpu ≈ run, slow      → the stage really computed (interpreted
  *                            code? different plan?)
  *   - run >> cpu           → tasks blocked (block-manager locks,
  *                            shuffle fetch, eviction, cleaner RPCs)
  *   - high deserialize     → classloading / codegen-class churn
  *   - high gc              → heap pressure
  * plus the driver-side GC time delta per rep (ms) and the driver
  * JIT compilation-time delta (ms, an approximation of C2 backlog).
  *
  * Usage: runMain graft.tools.VarianceProfile <sfDir> <entry> [reps]
  */
object VarianceProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VarianceProfile <sfDir> <entry> [reps]")
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, dur: Long, tasks: Int, cpu: Double,
      run: Double, gc: Double, deser: Double, fetch: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val dur = (for { a <- i.completionTime; b <- i.submissionTime }
            yield a - b).getOrElse(-1L)
          val m = i.taskMetrics
          stages.add(St(i.stageId, dur, i.numTasks,
            m.executorCpuTime / 1e9, m.executorRunTime / 1e3,
            m.jvmGCTime / 1e3, m.executorDeserializeTime / 1e3,
            m.shuffleReadMetrics.fetchWaitTime / 1e3))
        }
      })

    def gcMillis: Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jitMillis: Long =
      ManagementFactory.getCompilationMXBean.getTotalCompilationTime

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown entry $name"))
    for (rep <- 1 to reps) {
      stages.clear()
      val gc0 = gcMillis; val jit0 = jitMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[var] rep $rep%2d  wall $wall%7.2f s  " +
        f"driverGC ${gcMillis - gc0}%5d ms  jit ${jitMillis - jit0}%6d ms")
      stages.asScala.toSeq.sortBy(-_.dur).take(5)
        .filter(_.dur >= 500).foreach { s =>
          println(f"[var]    stage ${s.id}%4d ${s.dur / 1000.0}%7.2f s " +
            f"tasks=${s.tasks}%-3d cpu=${s.cpu}%7.1f run=${s.run}%7.1f " +
            f"gc=${s.gc}%5.1f deser=${s.deser}%5.1f fetchWait=${s.fetch}%5.1f")
        }
    }
    spark.stop()
  }
}
