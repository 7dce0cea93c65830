package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Stream-stream interval join: in-window matching, out-of-window
  * exclusion, watermark-driven outer-null emission, and the
  * symmetric-hash plan shape. */
class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2026-01-01 00:00:${s}%02d")
  private def tsMin(m: Int) = Timestamp.valueOf(f"2026-01-01 00:${m}%02d:00")

  test("inner: clicks join impressions of the same ad within the window; " +
      "outside-window and other-key clicks do not") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val q = StreamStreamJoin.joinWithin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      key = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      maxDelay = "5 seconds", within = "10 seconds")
      .select($"l.ad_id", $"imp_ts", $"click_ts")
      .writeStream.format("memory").queryName("ss_inner")
      .outputMode("append").start()
    try {
      imps.addData((1, ts(0)), (2, ts(0)))
      clicks.addData(
        (1, ts(4)), // in window → match
        (1, ts(20)), // 20s > 10s window → no match
        (3, ts(2))) // no such impression → no match
      q.processAllAvailable()
      val got = spark.table("ss_inner").collect()
        .map(r => (r.getInt(0), r.getTimestamp(2))).toSet
      assert(got == Set(1 -> ts(4)), s"got ${got.mkString(", ")}")
    } finally q.stop()
  }

  test("left_outer: an unclicked impression emits null-padded ONLY after " +
      "the watermark proves no click can still arrive") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val q = StreamStreamJoin.joinWithin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      key = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      maxDelay = "5 seconds", within = "10 seconds",
      joinType = "left_outer")
      .select($"l.ad_id", $"imp_ts", $"click_ts")
      .writeStream.format("memory").queryName("ss_louter")
      .outputMode("append").start()
    try {
      imps.addData((1, ts(0)), (2, ts(0)))
      clicks.addData((1, ts(3)))
      q.processAllAvailable()
      val early = spark.table("ss_louter").collect()
        .map(r => (r.getInt(0), Option(r.getTimestamp(2))))
      assert(early.toSet == Set(1 -> Some(ts(3))),
        s"no premature outer row while 2 could still be clicked: got " +
          early.mkString(", "))
      // advance BOTH event-time clocks far past 0:00:00 + window + delay;
      // the watermark commits after this batch...
      imps.addData((90, tsMin(5)))
      clicks.addData((91, tsMin(5)))
      q.processAllAvailable()
      // ...and the state eviction that emits the null-padded row runs in
      // the NEXT batch.
      imps.addData((92, tsMin(9)))
      clicks.addData((93, tsMin(9)))
      q.processAllAvailable()
      val got = spark.table("ss_louter").collect()
        .map(r => (r.getInt(0), Option(r.getTimestamp(2)))).toSet
      assert(got.contains(2 -> None),
        s"unmatched impression must surface once unmatched is PROVEN: $got")
      assert(got.filter(_._1 == 1) == Set(1 -> Some(ts(3))),
        "the matched impression must not also emit a null-padded row")
    } finally q.stop()
  }

  test("plans as StreamingSymmetricHashJoin (keyed state, no cross scan)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Int, Timestamp)]
    val clicks = MemoryStream[(Int, Timestamp)]
    val q = StreamStreamJoin.joinWithin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      key = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      maxDelay = "5 seconds", within = "10 seconds")
      .writeStream.format("memory").queryName("ss_plan")
      .outputMode("append").start()
    try {
      imps.addData((1, ts(0)))
      clicks.addData((1, ts(1)))
      q.processAllAvailable()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { q.explain() }
      assert(out.toString.contains("StreamingSymmetricHashJoin"),
        out.toString)
    } finally q.stop()
  }
}
