package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.queries.EventQueries

/** Incremental Poisson bootstrap: stream replica weights are the batch
  * entry's draws by construction (same kernel), the additive state
  * folds split-anywhere to the same sums, and the final stream state
  * equals the batch `events_bootstrap_ci` row per series over shuffled
  * multi-batch arrivals. */
class StreamBootstrapSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def arrivals: Seq[EventArrival] =
    Tables.events(spark, sfDir)
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
      .map { case (t, id, x) => EventArrival(t, id, x) }

  test("state folds split-anywhere to the same sums (additive, " +
      "order-insensitive across batch boundaries)") {
    val evs = arrivals.filter(_.series == arrivals.head.series).take(40)
    val oneShot = evs.foldLeft(StreamBootstrap.empty)((st, e) =>
      StreamBootstrap.add(st, e.eventId, e.cents))
    for (cut <- Seq(1, 7, 20, 39)) {
      val (a, b) = evs.splitAt(cut)
      val st = b.foldLeft(a.foldLeft(StreamBootstrap.empty)((s, e) =>
        StreamBootstrap.add(s, e.eventId, e.cents)))((s, e) =>
        StreamBootstrap.add(s, e.eventId, e.cents))
      assert(st.n == oneShot.n && st.sx == oneShot.sx &&
        st.sw.toSeq == oneShot.sw.toSeq &&
        st.swx.toSeq == oneShot.swx.toSeq, s"cut=$cut diverged")
    }
    // a permutation of arrivals reaches the same state (weights are
    // keyed on event_id, not position)
    val perm = new scala.util.Random(3L).shuffle(evs)
      .foldLeft(StreamBootstrap.empty)((st, e) =>
        StreamBootstrap.add(st, e.eventId, e.cents))
    assert(perm.sw.toSeq == oneShot.sw.toSeq &&
      perm.swx.toSeq == oneShot.swx.toSeq)
  }

  test("stream: shuffled multi-batch arrivals end at the batch entry's " +
      "row per series") {
    implicit val sqlCtx = spark.sqlContext
    val shuffled = new scala.util.Random(11L).shuffle(arrivals)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 4)).toSeq

    val source = MemoryStream[EventArrival]
    val q = StreamBootstrap.bootstrapStream(source.toDS())
      .writeStream.format("memory").queryName("boot_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // n only grows — the max-n row per series is the final state
      val streamed = spark.table("boot_state").as[BootEstimate].collect()
        .groupBy(_.series).map { case (s, vs) => s -> vs.maxBy(_.nEvents) }
      val batch = EventQueries.eventsBootstrapCi.query(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6)))).toMap
      assert(batch.nonEmpty)
      batch.foreach { case (series, (n, mean, bn, lo, hi, varM)) =>
        val st = streamed(series)
        assert(st.nEvents == n, s"$series n ${st.nEvents} != $n")
        assert(st.meanMilli == mean, s"$series mean ${st.meanMilli} != $mean")
        assert(st.bootN == bn && st.bootLoMilli == lo &&
          st.bootHiMilli == hi && st.bootVarMilli2 == varM,
          s"$series replica stats diverged: $st vs ($bn, $lo, $hi, $varM)")
      }
    } finally q.stop()
  }
}
