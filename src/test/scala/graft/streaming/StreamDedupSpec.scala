package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Streaming exact dedup: duplicate content suppressed within the
  * watermark horizon, state keyed by digest (not document). */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("re-occurrences of identical content within the watermark are suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val q = StreamDedup.dedupByContent(
      source.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2024-01-01 10:00:00"), "doc A"),
        (ts("2024-01-01 10:00:30"), "doc A"), // in-batch dup
        (ts("2024-01-01 10:01:00"), "doc B"))
      q.processAllAvailable()
      source.addData(
        (ts("2024-01-01 10:02:00"), "doc A"), // cross-batch dup
        (ts("2024-01-01 10:03:00"), "doc C"))
      q.processAllAvailable()
      val texts = spark.table("stream_dedup")
        .select($"text").as[String].collect().sorted
      assert(texts.toSeq == Seq("doc A", "doc B", "doc C"),
        s"each content exactly once, got ${texts.toSeq}")
    } finally q.stop()
  }

  test("emitted rows carry the 64-hex content digest for downstream joins") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val q = StreamDedup.dedupByContent(
      source.toDF().toDF("ts", "text"), "ts", "text", "1 minute")
      .writeStream.format("memory").queryName("stream_dedup_digest")
      .outputMode("append").start()
    try {
      source.addData((ts("2024-01-01 10:00:00"), "payload"))
      q.processAllAvailable()
      val sha = spark.table("stream_dedup_digest")
        .select($"content_sha").as[String].collect().head
      assert(sha.matches("[0-9a-f]{64}"))
    } finally q.stop()
  }
}
