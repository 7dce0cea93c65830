package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-attribution profiler for `dedup_setsim_join`: runs the
  * catalog entry repeatedly in a quiet session and prints the slowest
  * stages of each rep (task counts, CPU vs wall, GC, shuffle bytes) —
  * the tool that located the AQE byte-based-coalescing pathology
  * (CPU-heavy verification stages folded onto 1-2 cores). The entry
  * itself is always run through [[graft.SparkEntry]], so this can
  * never drift from the production plan.
  *
  * Usage: runMain graft.tools.SetSimProfile <sfDir>
  */
object SetSimProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-level attribution: record every stage's duration + metrics
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val dur = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b).getOrElse(-1L)
          val m = i.taskMetrics
          val desc = f"tasks=${i.numTasks}%d " +
            f"exeCpu=${m.executorCpuTime / 1e9}%.1f " +
            f"exeRun=${m.executorRunTime / 1e3}%.1f " +
            f"gc=${m.jvmGCTime / 1e3}%.1f " +
            f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
            f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB " +
            i.rddInfos.map(_.name).filter(_ != null).distinct
              .mkString(",").take(60)
          stages.add((i.stageId, dur, desc))
        }
      })

    for (rep <- 1 to 4) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("dedup_setsim_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[setsim] rep $rep total $total%.2f s; slowest stages:")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2).take(8).foreach {
        case (id, dur, nm) =>
          println(f"[setsim]   stage $id%4d ${dur / 1000.0}%8.2f s  $nm")
      }
    }
    spark.stop()
  }
}
