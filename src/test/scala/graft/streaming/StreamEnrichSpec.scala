package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Stream-static enrichment: per-batch dim lookup, left semantics, and
  * the broadcast plan shape. */
class StreamEnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("stream rows enrich from the static dim; unmatched keys pass with nulls") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("EGP", "Egyptian Pound"), ("EUR", "Euro"))
      .toDF("target", "currency_name")
    val source = MemoryStream[(String, Double)]
    val q = StreamEnrich.enrich(
      source.toDF().toDF("target", "rate"), dim, Seq("target"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      source.addData(("EGP", 48.0), ("EUR", 0.92), ("XXX", 1.0))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select($"target", $"currency_name").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got == Map(
        "EGP" -> Some("Egyptian Pound"),
        "EUR" -> Some("Euro"),
        "XXX" -> None), s"got $got")
    } finally q.stop()
  }

  test("the join plans as a broadcast hash join (the stream is never shuffled)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("EGP", "Egyptian Pound")).toDF("target", "currency_name")
    val source = MemoryStream[(String, Double)]
    val q = StreamEnrich.enrich(
      source.toDF().toDF("target", "rate"), dim, Seq("target"))
      .writeStream.format("memory").queryName("enriched_plan")
      .outputMode("append").start()
    try {
      source.addData(("EGP", 48.0))
      q.processAllAvailable()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { q.explain() }
      assert(out.toString.contains("BroadcastHashJoin"), out.toString)
    } finally q.stop()
  }
}
