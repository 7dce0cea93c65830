package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Stateful latest-per-key stream: state carries `current_rates` across
  * micro-batches with the strict late-data guard. */
class StatefulLatestSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("step: strict-greater guard, tie keeps stored, batch dedup") {
    val s0 = RateObs("USD", "EGP", 48.0, ts("2024-01-02 00:00:00"), 1L)
    // newer replaces
    assert(StatefulLatest.step(Some(s0), Iterator(
      RateObs("USD", "EGP", 49.0, ts("2024-01-03 00:00:00"), 2L)))
      .get.rate == 49.0)
    // older and tied keep stored
    assert(StatefulLatest.step(Some(s0), Iterator(
      RateObs("USD", "EGP", 47.0, ts("2024-01-01 00:00:00"), 3L)))
      .get.rate == 48.0)
    assert(StatefulLatest.step(Some(s0), Iterator(
      RateObs("USD", "EGP", 47.5, ts("2024-01-02 00:00:00"), 4L)))
      .get.rate == 48.0)
    // within a batch the newest (ts, uid) wins before the guard applies
    assert(StatefulLatest.step(None, Iterator(
      RateObs("USD", "EGP", 50.0, ts("2024-01-05 00:00:00"), 5L),
      RateObs("USD", "EGP", 51.0, ts("2024-01-04 00:00:00"), 6L)))
      .get.rate == 50.0)
  }

  test("step: sub-millisecond precision matches the batch path (µs-newer replaces)") {
    val t0 = ts("2024-01-02 00:00:00")
    val t0plus1us = ts("2024-01-02 00:00:00"); t0plus1us.setNanos(1000)
    val s0 = RateObs("USD", "EGP", 48.0, t0, 1L)
    // 1µs newer: batch (full-TimestampType order) treats this as strictly
    // newer — the stream guard must agree, not tie on milliseconds
    assert(StatefulLatest.step(Some(s0), Iterator(
      RateObs("USD", "EGP", 49.0, t0plus1us, 2L))).get.rate == 49.0)
    // exact tie (to the nanosecond) still keeps stored
    assert(StatefulLatest.step(Some(s0), Iterator(
      RateObs("USD", "EGP", 47.0, ts("2024-01-02 00:00:00"), 3L)))
      .get.rate == 48.0)
    // in-batch fold also resolves µs differences
    assert(StatefulLatest.step(None, Iterator(
      RateObs("USD", "EGP", 50.0, t0, 4L),
      RateObs("USD", "EGP", 51.0, t0plus1us, 5L))).get.rate == 51.0)
  }

  test("stream: state maintains current_rates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[RateObs]
    val q = StatefulLatest.latestPerKeyStream(source.toDS())
      .writeStream.format("memory").queryName("current_rates_state")
      .outputMode("update").start()
    try {
      source.addData(
        RateObs("USD", "EGP", 48.0, ts("2024-01-02 00:00:00"), 1L),
        RateObs("USD", "EUR", 0.92, ts("2024-01-02 00:00:00"), 2L))
      q.processAllAvailable()
      source.addData(
        RateObs("USD", "EGP", 49.0, ts("2024-01-03 00:00:00"), 3L), // newer
        RateObs("USD", "EUR", 0.90, ts("2024-01-01 00:00:00"), 4L), // late
        RateObs("USD", "JPY", 148.0, ts("2024-01-02 00:00:00"), 5L)) // new
      q.processAllAvailable()
      // update mode appends each batch's emissions; the last row per key
      // is the maintained state
      val snap = spark.table("current_rates_state")
        .as[RateObs].collect().zipWithIndex
        .groupBy(r => (r._1.base, r._1.target))
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1.rate }
      assert(snap == Map(
        ("USD", "EGP") -> 49.0,
        ("USD", "EUR") -> 0.92, // late row did NOT clobber
        ("USD", "JPY") -> 148.0))
    } finally q.stop()
  }
}
