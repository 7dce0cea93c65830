package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** flatMapGroupsWithState session windows: in-batch gap close, event-time
  * timeout close, bounded per-key state. */
class SessionWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val gapMs = 30L * 60 * 1000 // 30 min

  test("fold: gap splits sessions, counts and bounds accumulate, disorder tolerated") {
    val (open, closed) = SessionWindows.fold(None, Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"),
      ts("2024-01-01 11:00:00"), // 50 min gap → new session
      ts("2024-01-01 11:05:00")), gapMs)
    assert(closed.map(s => (s.start, s.end, s.n)) ==
      Seq((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
    assert(open.contains(OpenSession(
      ts("2024-01-01 11:00:00"), ts("2024-01-01 11:05:00"), 2L)))
    // an existing open session extends rather than restarts
    val (open2, closed2) = SessionWindows.fold(open,
      Seq(ts("2024-01-01 11:20:00")), gapMs)
    assert(closed2.isEmpty && open2.get.n == 3L)
  }

  test("timeout deadline lands strictly past the microsecond gap boundary") {
    // merge rule: an event with micros(t) <= micros(end) + gap joins the
    // session, so the ms-grained timeout must never expire at or before
    // that boundary. The old `end.getTime + gapMs` truncated sub-ms
    // micros and could fire up to ~1 ms inside the window.
    def withMicros(base: String, us: Int): Timestamp = {
      val t = ts(base); t.setNanos(us * 1000); t
    }
    for (us <- Seq(0, 1, 499, 500, 999)) {
      val end = withMicros("2024-01-01 10:00:00", us)
      val boundaryUs = SessionWindows.micros(end) + gapMs * 1000L
      val deadlineUs = SessionWindows.timeoutDeadlineMs(end, gapMs) * 1000L
      assert(deadlineUs > boundaryUs,
        s"deadline must be strictly past the boundary (end sub-ms=$us µs)")
      assert(deadlineUs - boundaryUs <= 1000L,
        s"deadline overshoots by more than one ms grain (end sub-ms=$us µs)")
      // the old formulation violates the invariant whenever end has a
      // sub-ms component — keep the counter-example visible
      if (us > 0)
        assert((end.getTime + gapMs) * 1000L < boundaryUs)
    }
  }

  test("stream: sub-ms boundary event merges instead of finding its " +
      "session flushed") {
    implicit val sqlCtx = spark.sqlContext
    val start = ts("2024-01-01 10:00:00"); start.setNanos(500000) // +500 µs
    val boundary = ts("2024-01-01 10:30:00"); boundary.setNanos(500000)
    val source = MemoryStream[UserEvent]
    val q = SessionWindows.sessionize(source.toDS(), gapMs, "0 seconds")
      .writeStream.format("memory").queryName("sessions_boundary")
      .outputMode("append").start()
    try {
      source.addData(UserEvent(1L, start))
      q.processAllAvailable()
      // drag the watermark to exactly the truncated-ms deadline the old
      // code would have set (10:30:00.000 + 0ms grain), then deliver the
      // event sitting exactly on the strict-gap microsecond boundary
      source.addData(UserEvent(2L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      source.addData(UserEvent(1L, boundary),
        UserEvent(2L, ts("2024-01-01 10:30:01")))
      q.processAllAvailable()
      // close everything via far-future sentinels
      source.addData(UserEvent(-1L, ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
      source.addData(UserEvent(-1L, ts("2030-01-02 00:00:00")))
      q.processAllAvailable()

      val u1 = spark.table("sessions_boundary").as[ClosedSession].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start, s.session_end, s.n_events)).toSet
      assert(u1 == Set((start, boundary, 2L)),
        s"boundary event must merge into one 2-event session, got $u1")
    } finally q.stop()
  }

  test("stream: sessions close by in-batch gap and by event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val q = SessionWindows.sessionize(source.toDS(), gapMs, "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: burst of 3; user 2: single event (keeps watermark honest)
      source.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00")),
        UserEvent(1L, ts("2024-01-01 10:05:00")),
        UserEvent(1L, ts("2024-01-01 10:08:00")),
        UserEvent(2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0, "nothing closed yet")

      // user 1 again 2h later: closes its first session in-batch; the
      // event also drags the watermark past user 2's timeout
      source.addData(UserEvent(1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // one more batch so the timeout (watermark now 11:50) fires
      source.addData(UserEvent(3L, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()

      val got = spark.table("sessions").as[ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      assert(got.contains(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:08:00"), 3L)),
        s"user 1 burst must close as one 3-event session, got $got")
      assert(got.contains(
        (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1L)),
        s"user 2 must close by event-time timeout, got $got")
    } finally q.stop()
  }

  test("stream/batch parity: stateful sessions equal the lag->cumsum batch " +
      "formulation on real testdata") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // batch truth: the events_sessionize formulation (window + cumsum —
    // independent of the stateful fold under test)
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val batch = ev
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > gapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("sid", sum($"new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("s"), max($"ts").as("e"), count(lit(1)).as("n"))
      .select($"user_id", $"s", $"e", $"n")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
      .map { case (u, s, e, n) => (u, s.getTime, e.getTime, n) }.toSet

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val q = SessionWindows.sessionize(source.toDS(), gapMs, "0 seconds")
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode("append").start()
    try {
      val rows = ev.select($"user_id", $"ts")
        .as[(Long, Timestamp)].collect()
        .map { case (u, t) => UserEvent(u, t) }
      source.addData(rows.toIndexedSeq: _*) // one batch: nothing is late
      q.processAllAvailable()
      // two far-future sentinel batches: advance the watermark past every
      // open session's timeout, then let the timeouts fire
      source.addData(UserEvent(-1L, ts("2030-01-01 00:00:00")))
      q.processAllAvailable()
      source.addData(UserEvent(-1L, ts("2030-01-02 00:00:00")))
      q.processAllAvailable()

      val stream = spark.table("sessions_parity").as[ClosedSession].collect()
        .filter(_.user_id >= 0)
        .map(c => (c.user_id, c.session_start.getTime, c.session_end.getTime,
          c.n_events)).toSet
      assert(stream == batch,
        s"stream/batch diverge: onlyStream=${stream -- batch} " +
          s"onlyBatch=${batch -- stream}")
    } finally q.stop()
  }
}
