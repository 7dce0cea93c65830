package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Generic quiet-session per-entry profiler (the AsOfProfile /
  * SaltProfile pattern, generalized): times the named catalog entries
  * through the same noop-sink materialization Bench uses, median of 5
  * after one untimed warm-up, in a session running NOTHING else — the
  * tool that separates "the plan got slower" from "the bench session
  * was under pressure". Usage:
  *
  *   runMain graft.tools.QueryProfile <entry> [<entry> ...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <entry> [<entry> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown entry: $name")
      once(name) // warm-up
      val ts = Seq.fill(5)(once(name)).sorted
      println(f"$name%-32s median ${ts(2)}%.3f s  (min ${ts.head}%.3f, max ${ts.last}%.3f)")
    }
    spark.stop()
  }
}
