package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Quiet-session profiler for individual catalog entries — the
  * attribution tool for bench outliers: the full `graft.Bench` shares
  * one session across ~130 entries x 4 sweeps, so a reading there folds
  * in whatever session pressure (GC, broadcast cleanup, JIT churn)
  * surrounds the entry, while THIS main times the named entries alone,
  * warm, median-of-N. A per-query bench reading far above its quiet
  * median is session noise; a quiet median far above the recorded
  * baseline is a real plan/kernel regression.
  *
  * Usage: runMain graft.tools.EntryProfile <sfDir> <entry> [entry ...]
  *        (SPARK_GRAFT_PROFILE_REPS to override the 5 reps)
  */
object EntryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EntryProfile <sfDir> <entry> [entry ...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROFILE_STAGES=1: print every >= 0.5 s stage of each
    // timed rep (task count, CPU, GC) — the attribution view for the
    // bench's "single_task" findings, runnable on one entry in quiet
    // isolation instead of inside a full sweep.
    val showStages = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Always-on I/O accounting (r20, for the CC diet's done criterion):
    // shuffle write/read bytes summed across every stage of a rep —
    // byte counts are load-independent, so this measures the PLAN's
    // block movement even on a noisy host where wall time measures the
    // substrate.
    val shufW = new java.util.concurrent.atomic.AtomicLong()
    val shufR = new java.util.concurrent.atomic.AtomicLong()
    // job/stage counts per rep (r22): the iterative/recovery-branch
    // entries are BARRIER-latency-bound at bench SF, so "how many job
    // waves does one execution schedule" is the attribution the wall
    // number alone cannot give
    val nJobs = new java.util.concurrent.atomic.AtomicLong()
    val nStages = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          nStages.incrementAndGet()
          val m = sc.stageInfo.taskMetrics
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      })
    if (showStages)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = sc.stageInfo
            val dur = (for { a <- i.completionTime; b <- i.submissionTime }
              yield a - b).getOrElse(-1L)
            if (dur >= 500) {
              val m = i.taskMetrics
              // the RDD scope chain names the SQL operators this stage
              // executes — the callsite alone is an anonymous future
              val ops = i.rddInfos.flatMap(_.scope)
                .flatMap(_.name.split("\n")).distinct.take(8)
                .mkString("|")
              stageLog.add(f"  stage ${i.stageId}%5d ${dur / 1000.0}%5.1f s " +
                f"tasks=${i.numTasks}%-3d cpu=${m.executorCpuTime / 1e9}%5.1f " +
                f"gc=${m.jvmGCTime / 1e3}%4.1f  $ops")
            }
          }
        })
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm: codegen + catalog caches, untimed
      Thread.sleep(300) // drain warm-rep stage events off the bus
      shufW.set(0L); shufR.set(0L); nJobs.set(0L); nStages.set(0L)
      val ts = (1 to reps).map { _ =>
        stageLog.clear()
        val t = once()
        if (showStages) {
          import scala.jdk.CollectionConverters._
          // drain the async listener bus before reading the log
          Thread.sleep(300)
          println(f"[profile] $name rep $t%6.3f s stages:")
          stageLog.asScala.foreach(println)
        }
        t
      }.sorted
      val med = ts((ts.length - 1) / 2)
      Thread.sleep(300) // drain the last rep's stage events
      println(f"[profile] $name%-28s median $med%6.3f s  " +
        f"min ${ts.head}%6.3f  max ${ts.last}%6.3f  (n=$reps, $sfDir)  " +
        f"shufW ${shufW.get / 1048576.0 / reps}%8.2f MB/rep  " +
        f"shufR ${shufR.get / 1048576.0 / reps}%8.2f MB/rep  " +
        f"jobs ${nJobs.get / reps.toDouble}%5.1f/rep  " +
        f"stages ${nStages.get / reps.toDouble}%5.1f/rep")
    }
    spark.stop()
  }
}
