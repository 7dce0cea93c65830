package graft.streaming

import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Incremental Holt forecast state: after ANY micro-batch split of an
  * in-order daily series, the stream state equals the batch recursion
  * over the same prefix (the `events_holt_forecast` semantics). */
class StreamHoltSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  /** Pure reference recursion — independent of both implementations. */
  private def reference(xs: Seq[Long]): (Long, Long) =
    xs.drop(1).foldLeft((xs.head, 0L)) { case ((l, b), x) =>
      val l1 = (x + 3L * (l + b)) / 4L
      ((l1, ((l1 - l) + b) / 2L))
    }

  test("step: recursion matches the reference on constant, ramp, and " +
      "sign-flipping series (negative trends divide toward zero)") {
    val days = (1 to 9).map(i => d(f"2024-01-0$i"))
    // constant series: level locks to the constant, trend 0
    val const = Seq.fill(9)(500L)
    val stC = StreamHolt.step(None,
      days.zip(const).map { case (dy, x) => DailyClose("s", dy, x, 0L) }.iterator)
    assert((stC.level, stC.trend) == reference(const))
    assert(stC.level == 500L && stC.trend == 0L)
    // falling series exercises negative Δl and negative trend
    val fall = Seq(900L, 700L, 500L, 300L, 100L, 50L, 25L, 10L, 5L)
    val stF = StreamHolt.step(None,
      days.zip(fall).map { case (dy, x) => DailyClose("s", dy, x, 0L) }.iterator)
    assert((stF.level, stF.trend) == reference(fall))
    assert(stF.trend < 0L)
    // rising ramp
    val rise = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L, 800L, 900L)
    val stR = StreamHolt.step(None,
      days.zip(rise).map { case (dy, x) => DailyClose("s", dy, x, 0L) }.iterator)
    assert((stR.level, stR.trend) == reference(rise))
    assert(stR.trend > 0L)
  }

  test("step: any micro-batch split equals the one-shot fold; late and " +
      "duplicate days are dropped") {
    val days = (1 to 8).map(i => d(f"2024-02-0$i"))
    val xs = Seq(480L, 495L, 510L, 490L, 530L, 525L, 560L, 575L)
    val rows = days.zip(xs).map { case (dy, x) => DailyClose("s", dy, x, 0L) }
    val oneShot = StreamHolt.step(None, rows.iterator)
    for (cut <- 1 until rows.length) {
      val st1 = StreamHolt.step(None, rows.take(cut).iterator)
      val st2 = StreamHolt.step(Some(st1), rows.drop(cut).iterator)
      assert(st2 == oneShot, s"split at $cut diverged")
    }
    // a duplicate of the last day and a day before the frontier change nothing
    val withLate = StreamHolt.step(Some(oneShot), Iterator(
      DailyClose("s", d("2024-02-08"), 999L, 9L),
      DailyClose("s", d("2024-02-03"), 999L, 9L)))
    assert(withLate == oneShot)
    // an out-of-order batch folds in day order, not arrival order
    val shuffled = StreamHolt.step(None, scala.util.Random.shuffle(rows).iterator)
    assert(shuffled == oneShot)
  }

  test("step: several closes for the SAME new day in one batch resolve " +
      "to the highest seq, independent of arrival order") {
    val base = StreamHolt.step(None, Iterator(
      DailyClose("s", d("2024-04-01"), 500L, 1L)))
    val conflict = Seq(
      DailyClose("s", d("2024-04-02"), 100L, 1L),
      DailyClose("s", d("2024-04-02"), 900L, 3L),
      DailyClose("s", d("2024-04-02"), 400L, 2L))
    val expected = StreamHolt.step(Some(base), Iterator(
      DailyClose("s", d("2024-04-02"), 900L, 3L)))
    conflict.permutations.foreach { perm =>
      assert(StreamHolt.step(Some(base), perm.iterator) == expected,
        s"arrival order $perm changed the state")
    }
    // equal seqs (caller bug) still resolve deterministically, not by
    // arrival order: highest closeCents wins as the secondary key
    val dup = Seq(
      DailyClose("s", d("2024-04-02"), 100L, 7L),
      DailyClose("s", d("2024-04-02"), 900L, 7L))
    val dupExpected = StreamHolt.step(Some(base), Iterator(
      DailyClose("s", d("2024-04-02"), 900L, 7L)))
    dup.permutations.foreach { perm =>
      assert(StreamHolt.step(Some(base), perm.iterator) == dupExpected,
        s"equal-seq arrival order $perm changed the state")
    }
  }

  test("stream: per-series state across micro-batches matches the batch " +
      "recursion per series") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[DailyClose]
    val q = StreamHolt.holtForecastStream(source.toDS())
      .writeStream.format("memory").queryName("holt_state")
      .outputMode("update").start()
    try {
      val aDays = Seq(100L, 140L, 180L, 220L)
      val bDays = Seq(900L, 800L, 700L, 600L)
      source.addData(
        DailyClose("a", d("2024-03-01"), aDays(0), 1L),
        DailyClose("a", d("2024-03-02"), aDays(1), 2L),
        DailyClose("b", d("2024-03-01"), bDays(0), 1L))
      q.processAllAvailable()
      source.addData(
        DailyClose("a", d("2024-03-03"), aDays(2), 3L),
        DailyClose("a", d("2024-03-04"), aDays(3), 4L),
        DailyClose("b", d("2024-03-02"), bDays(1), 2L),
        DailyClose("b", d("2024-03-03"), bDays(2), 3L),
        DailyClose("b", d("2024-03-04"), bDays(3), 4L))
      q.processAllAvailable()
      val out = spark.table("holt_state").as[HoltForecast].collect()
        .groupBy(_.series).map { case (k, vs) => k -> vs.maxBy(_.nDays) }
      val (la, ba) = reference(aDays)
      val (lb, bb) = reference(bDays)
      assert(out("a") == HoltForecast("a", 4L, la, ba, la + ba))
      assert(out("b") == HoltForecast("b", 4L, lb, bb, lb + bb))
    } finally q.stop()
  }
}
