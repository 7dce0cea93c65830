package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintained diagnostic (r22, r21 verdict item 6): formatted
  * per-ITERATION physical plans for the iterative operators. The
  * operators materialize every round through `localCheckpoint`, so
  * [[graft.PlanAudit]]'s final explain shows only the last
  * TakeOrderedAndProject fragment — the per-round exchange counts the
  * optimization notes claim (aggregate-before-pin, co-partitioned
  * round joins) were not checkable from committed artifacts. This
  * main sets [[graft.ext.IterPlan.hook]], constructs each entry (the
  * rounds execute eagerly during construction), and prints every
  * offered round's formatted plan.
  *
  * Usage: runMain graft.tools.IterPlanDump <sfDir> [entry ...]
  */
object IterPlanDump {
  private val DefaultEntries = Seq(
    "dedup_cluster_cc", "dedup_cluster_cc_star",
    "graph_pagerank_copurchase", "graph_kcore_copurchase",
    "graph_lpa_communities", "embed_pca_deflate")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultEntries
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val counts = scala.collection.mutable.Map[String, Int]()
      graft.ext.IterPlan.hook = Some { (tag, df) =>
        val k = counts.updateWith(tag)(c => Some(c.getOrElse(0) + 1)).get
        println(s"\n----- $n :: $tag #$k -----")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      println(s"\n========== $n ==========")
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"RUN FAILED: ${e.getMessage}") }
      graft.ext.IterPlan.hook = None
    }
    spark.stop()
  }
}
