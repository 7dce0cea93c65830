package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Profiling main for the asof_join cost question (r2 bench 1.34s →
  * r4 bench 4.31s at sf0.1). Times isolated variants to attribute cost.
  *
  * Findings (sf0.1, local[32], median of 3 after warm-up):
  *   scan_only 0.14s | window_only 0.42s | two_lasts 0.40s |
  *   raw_op 0.41s | no_sort 0.41s | full_entry 0.61s
  * and a fresh full-Bench session measured asof_join at 0.77s.
  * Conclusion: the struct payload (`last(struct, ignoreNulls)`) costs
  * ~nothing over r2's two independent `last` columns, and the global
  * ORDER BY tail ~0.2s; the r4 4.31s median was a transient of that
  * bench session (GC/JIT pressure mid-run), not a plan defect — the
  * operator's single-shuffle union+window plan is unchanged and at
  * 100 TB remains linear per key partition.
  */
object AsOfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fmt = "yyyy-MM-dd HH:mm:ss"

    def ev = Tables.events(spark, sfDir)

    def full(): DataFrame = graft.SparkEntry.queries("asof_join")(spark, sfDir)

    def noSort(): DataFrame = {
      val e = ev
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
      AsOfJoin.leftAsOf(e.select($"event_id", $"user_id", $"ts"), purchases,
        "user_id", "user_id", "ts", "ts", Seq("event_id", "value"), "event_id")
        .select($"event_id", $"user_id", date_format($"ts", fmt).as("ts_s"),
          $"asof_event_id".as("purchase_event_id"),
          $"asof_value".as("purchase_value"))
    }

    def rawOp(): DataFrame = {
      val e = ev
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
      AsOfJoin.leftAsOf(e.select($"event_id", $"user_id", $"ts"), purchases,
        "user_id", "user_id", "ts", "ts", Seq("event_id", "value"), "event_id")
    }

    // r2-style: two independent last() columns instead of one struct
    def twoLasts(): DataFrame = {
      val e = ev
      val probeSide = e.select($"event_id", $"user_id", $"ts")
        .withColumn("__probe", lit(1))
        .withColumn("__tie", lit(Long.MaxValue))
        .withColumn("__p_eid", lit(null).cast("long"))
        .withColumn("__p_val", lit(null).cast("double"))
      val buildSide = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
        .withColumn("__probe", lit(0))
        .withColumn("__tie", $"event_id".cast("long"))
        .withColumn("__p_eid", $"event_id")
        .withColumn("__p_val", lit(1.0))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"__probe".asc, $"__tie".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probeSide.unionByName(buildSide)
        .withColumn("__p_eid", last($"__p_eid", ignoreNulls = true).over(w))
        .withColumn("__p_val", last($"__p_val", ignoreNulls = true).over(w))
        .filter($"__probe" === 1)
        .select($"event_id", $"user_id", $"ts", $"__p_eid", $"__p_val")
    }

    // cost of just scanning events twice + union + window sort, no last()
    def windowOnly(): DataFrame = {
      val e = ev
      val probeSide = e.select($"event_id", $"user_id", $"ts")
        .withColumn("__probe", lit(1))
      val buildSide = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
        .withColumn("__probe", lit(0))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"__probe".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probeSide.unionByName(buildSide)
        .withColumn("__rn", count(lit(1)).over(w))
        .filter($"__probe" === 1)
    }

    def scanOnly(): DataFrame = ev.select($"event_id", $"user_id", $"ts")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => scanOnly()),
      "window_only" -> (() => windowOnly()),
      "two_lasts" -> (() => twoLasts()),
      "raw_op" -> (() => rawOp()),
      "no_sort" -> (() => noSort()),
      "full_entry" -> (() => full()))

    def time(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (_, fn) => time(fn) } // warm-up
    variants.foreach { case (name, fn) =>
      val t = Seq.fill(3)(time(fn)).sorted.apply(1)
      println(f"PROFILE $name%-12s $t%.3f s")
    }
    spark.stop()
  }
}
