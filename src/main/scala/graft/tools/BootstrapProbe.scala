package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component-level timing probe for the round-18 statistical entries
  * (`events_bootstrap_ci`, `events_theil_sen`) — the EntryProfile
  * pattern one level down: time each pipeline stage in isolation so an
  * elevated entry reading attributes to a STAGE (kernel, explode+agg,
  * daily downsample, pair join, median window) instead of a guess. */
object BootstrapProbe {
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
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[boot-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val c = graft.Tables.eventsDense(spark, sfDir)
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("x"))

    for (r <- 1 to 4) {
      time(s"scan+partialagg r$r")(
        c.groupBy($"event_type").agg(count(lit(1)), sum($"x")).collect())
      time(s"kernel only r$r")(
        c.select(call_function("boot_pois_md5",
          $"event_id".cast("string"), lit(32)).as("ws"))
          .select(sum(element_at($"ws", 1))).collect())
      time(s"kernel+explode+agg r$r")(
        c.select($"event_type", $"x",
          posexplode(call_function("boot_pois_md5",
            $"event_id".cast("string"), lit(32))).as(Seq("b", "wt")))
          .groupBy($"event_type", $"b")
          .agg(sum($"wt" * $"x"), sum($"wt")).collect())
      time(s"full bootstrap entry r$r")(
        graft.queries.EventQueries.eventsBootstrapCi
          .query(spark, sfDir).collect())
      time(s"daily downsample r$r")(
        graft.queries.EventQueries.eventsOhlcCandles
          .query(spark, sfDir).collect())
      time(s"full theil_sen entry r$r")(
        graft.queries.EventQueries.eventsTheilSen
          .query(spark, sfDir).collect())
    }
    spark.stop()
  }
}
