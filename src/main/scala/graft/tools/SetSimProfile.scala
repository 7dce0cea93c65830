package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-attribution profiler for `dedup_setsim_join`: times each
  * sub-plan of [[graft.ext.SetSimJoin.selfJoin]] in isolation to find
  * where the wall-clock goes (the full entry benches ~20x DuckDB's
  * whole-query time at sf0.1, so one stage is pathological).
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
    import spark.implicits._

    def shingled: DataFrame = {
      val docs = Tables.documents(spark, sfDir).where($"text".isNotNull)
      val aug = docs.select($"doc_id", $"text")
        .union(docs.where($"doc_id" % 17 === 0)
          .select($"doc_id" + 100000, $"text"))
        .union(docs.where($"doc_id" % 23 === 0)
          .select($"doc_id" + 200000,
            concat($"text", lit(" graftdup graftdup2 graftdup3"))))
        .toDF("doc_id", "text")
      aug.withColumn("t", split($"text", " "))
        .where(size($"t") >= 3)
        .withColumn("shingles", array_distinct(
          transform(sequence(lit(1), size($"t") - 2), i =>
            concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
              element_at($"t", i + 2)))))
        .select($"doc_id", $"shingles")
    }

    def time(label: String)(f: => Long): Unit = {
      // twice: first reading includes codegen, second is warm
      val t0 = System.nanoTime(); val n0 = f
      val t1 = System.nanoTime(); val n1 = f
      val t2 = System.nanoTime()
      println(f"[setsim] $label%-28s cold ${(t1 - t0) / 1e9}%7.2f s  " +
        f"warm ${(t2 - t1) / 1e9}%7.2f s  rows $n1%d (cold $n0%d)")
    }

    val (tNum, tDen) = (3, 5)
    val sets = shingled.select(col("doc_id").cast("long").as("id"),
        col("shingles").as("arr"))
      .withColumn("n", size(col("arr")).cast("long"))
    val tok = sets.select(col("id"), explode(col("arr")).as("el"))
    val dfreq = tok.groupBy(col("el")).agg(count(lit(1)).as("df"))
    val prefixLen =
      col("n") - expr(s"(($tNum * n + ${tDen - 1}) div $tDen)") + 1
    val prefix = tok.join(dfreq, "el")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("df").asc, col("el").asc)))
      .join(sets.select(col("id"), col("n")), "id")
      .where(col("pos") <= prefixLen)
      .select(col("id"), col("el"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.el") === col("b.el") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val verified = cand
      .join(sets.select(col("id").as("id_a"), col("arr").as("arr_a"),
        col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("arr").as("arr_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("overlap",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .where(lit((tDen + tNum).toLong) * col("overlap") >=
        lit(tNum.toLong) * (col("n_a") + col("n_b")))

    // stage-level attribution: record every stage's duration + name
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
