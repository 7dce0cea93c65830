package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** End-to-end micro-batch parity: streamed batches must leave the two
  * sinks exactly as the batch pipeline would (append-only history;
  * current = latest per key with the strict late-data guard). */
class MicroBatchSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch: history appends; current upserts with late-data guard") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val (hist, cur, ckpt) = (s"$dir/hist", s"$dir/cur", s"$dir/ckpt")

    val source = MemoryStream[(String, String, Double, Timestamp, Long)]
    val stream = source.toDF()
      .toDF("base", "target", "rate", "ts", "uid")
    val q = MicroBatch.run(stream, hist, cur, ckpt,
      Seq("base", "target"), "ts", "uid")

    // batch 1: two pairs
    source.addData(
      ("USD", "EGP", 48.0, ts("2024-01-02 00:00:00"), 1L),
      ("USD", "EUR", 0.92, ts("2024-01-02 00:00:00"), 2L))
    q.processAllAvailable()
    // batch 2: newer EGP (update), older EUR (must NOT clobber), new JPY
    source.addData(
      ("USD", "EGP", 49.0, ts("2024-01-03 00:00:00"), 3L),
      ("USD", "EUR", 0.90, ts("2024-01-01 00:00:00"), 4L),
      ("USD", "JPY", 148.0, ts("2024-01-02 00:00:00"), 5L))
    q.processAllAvailable()
    q.stop()

    assert(spark.read.parquet(hist).count() == 5) // append-only, no dedup
    val current = spark.read.parquet(cur)
      .select($"target", $"rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(current == Map("EGP" -> 49.0, "EUR" -> 0.92, "JPY" -> 148.0))
  }

  test("history append is idempotent per batch id (at-least-once replay safe)") {
    val hist = Files.createTempDirectory("graft_hist").toString + "/hist"
    val b1 = Seq(("USD", "EGP", 48.0, ts("2024-01-02 00:00:00"), 1L))
      .toDF("base", "target", "rate", "ts", "uid")
    val b2 = Seq(("USD", "EUR", 0.92, ts("2024-01-02 00:00:00"), 2L))
      .toDF("base", "target", "rate", "ts", "uid")
    MicroBatch.appendHistoricalBatch(b1, hist, 0L)
    MicroBatch.appendHistoricalBatch(b1, hist, 0L) // replayed batch: skipped
    MicroBatch.appendHistoricalBatch(b2, hist, 1L)
    val out = spark.read.parquet(hist)
    assert(out.count() == 2)
    assert(out.columns.contains("batch_id")) // the reprocessing-window key
  }

  test("upsert after a crashed swap recovers all prior keys (never rebuilds " +
      "the snapshot from one batch)") {
    import org.apache.hadoop.fs.Path
    val cur = Files.createTempDirectory("graft_crash").toString + "/cur"
    val fs = new Path(cur).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batch1 = Seq(
      ("USD", "EGP", 48.0, ts("2024-01-02 00:00:00"), 1L),
      ("USD", "EUR", 0.92, ts("2024-01-02 00:00:00"), 2L))
      .toDF("base", "target", "rate", "ts", "uid")
    val batch2 = Seq(("USD", "JPY", 148.0, ts("2024-01-02 00:00:00"), 3L))
      .toDF("base", "target", "rate", "ts", "uid")
    MicroBatch.upsertParquet(spark, batch1, cur, Seq("base", "target"), "ts", "uid")
    // simulate a crash between "rename dest aside" and "rename staging in":
    // batch2's snapshot sits complete in staging, dest is missing
    spark.read.parquet(cur).unionByName(batch2)
      .write.mode("overwrite").parquet(cur + "__staging")
    assert(fs.rename(new Path(cur), new Path(cur + "__old")))
    // the replayed trigger must first finish the swap, then upsert on top —
    // the pre-fix delete-then-rename path would emit ONLY batch2's key here
    MicroBatch.upsertParquet(spark, batch2, cur, Seq("base", "target"), "ts", "uid")
    val out = spark.read.parquet(cur).select($"target", $"rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("EGP" -> 48.0, "EUR" -> 0.92, "JPY" -> 148.0))
    assert(!fs.exists(new Path(cur + "__staging")))
    assert(!fs.exists(new Path(cur + "__old")))
  }

  test("streaming tumbling window + watermark: closed windows emit, late rows drop") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val agg = source.toDF().toDF("ts", "etype")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"etype")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"etype", $"n")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2024-01-01 00:05:00"), "a"),
        (ts("2024-01-01 00:20:00"), "a"),
        (ts("2024-01-01 00:40:00"), "b"))
      q.processAllAvailable()
      // watermark 00:30 — the 00:00 window is still open: nothing emitted
      assert(spark.table("win_counts").count() == 0)
      source.addData((ts("2024-01-01 02:00:00"), "a")) // watermark → 01:50
      q.processAllAvailable()
      source.addData( // this batch runs with watermark 01:50 → hour 0 closes;
        (ts("2024-01-01 00:45:00"), "a")) // and this late row is dropped
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts("2024-01-01 00:00:00"), "a", 2L), // late "a" NOT counted
        (ts("2024-01-01 00:00:00"), "b", 1L)))
    } finally q.stop()
  }
}
