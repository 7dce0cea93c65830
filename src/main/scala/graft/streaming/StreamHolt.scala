package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One daily close in exact integer cents — the stream-side input of
  * the `events_holt_forecast` recursion (the batch entry derives the
  * same rows from raw events with a windowed downsample). `seq` must
  * be a TOTAL ORDER consistent with the batch downsample's
  * (event time, event_id) order — e.g. an event-time-ordered sequence
  * number, or epochMicros·2²⁰ + event_id — NOT the bare event_id: ids
  * need not be monotone in event time, and the batch side's daily
  * close is the latest-TIME event. When one micro-batch carries
  * several closes for the SAME new day (an intraday correction), the
  * highest `seq` wins deterministically; resolving by arrival order
  * would make the state depend on shuffle iteration order. */
case class DailyClose(series: String, day: Date, closeCents: Long,
    seq: Long)

/** Per-series Holt state: the day the recursion has consumed up to,
  * plus the (level, trend) pair — O(1) per series, like the batch
  * fold's accumulator. */
case class HoltState(nDays: Long, lastDayMs: Long, level: Long, trend: Long)

/** The stream's per-batch emission: current level/trend and the
  * 1-day-ahead forecast after folding the batch. */
case class HoltForecast(series: String, nDays: Long, levelCents: Long,
    trendCents: Long, f1Cents: Long)

/** `events_holt_forecast` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState`: the identical integer recursion
  * l ← (x + 3(l+b)) div 4, b ← (Δl + b) div 2 (α=1/4, β=1/2, JVM `/`
  * truncates toward zero exactly like Spark `div` / DuckDB `//`), so
  * after any prefix of days the stream state equals the batch fold
  * over the same prefix — pinned by `StreamHoltSpec`. Out-of-order
  * days (≤ the last consumed day) are DROPPED, mirroring the batch
  * entry's assumption that the daily-close series is consumed in day
  * order; a caller needing late-day tolerance puts a watermarked
  * daily aggregation in front (the `LateDataWindow` pattern).
  *
  * Same-day corrections are only honored WITHIN one micro-batch: the
  * per-day highest-`seq` pick in [[step]] resolves competing closes
  * that arrive together, but a correction for the frontier day landing
  * in a LATER micro-batch is `day <= frontier` and dropped like any
  * late day — the stream can then diverge from a batch re-run whose
  * downsample sees the correction. The contract is deliberate (state
  * stays 32 bytes — replacing the last step would require storing the
  * pre-advance level/trend and frontier seq); a caller whose feed
  * issues cross-batch same-day corrections needs the upstream
  * watermarked daily aggregation, which holds each day open until its
  * watermark expires and emits it once, corrected.
  *
  * Scale: state is 32 bytes per series — bounded by series
  * cardinality, not stream volume; series partition across executors
  * and checkpoint with the query. */
object StreamHolt {

  /** One recursion step — the single source of truth the spec compares
    * against the batch entry's SQL fold. */
  private[streaming] def advance(st: HoltState, x: Long): HoltState = {
    if (st.nDays == 0L) HoltState(1L, st.lastDayMs, x, 0L)
    else {
      val l1 = (x + 3L * (st.level + st.trend)) / 4L
      val b1 = ((l1 - st.level) + st.trend) / 2L
      HoltState(st.nDays + 1L, st.lastDayMs, l1, b1)
    }
  }

  /** Fold one micro-batch's rows into the stored state: per day keep
    * the highest-`seq` close (the batch downsample's latest-event
    * rule — deterministic whatever order the shuffled iterator
    * yields), then fold the surviving days in day order; days at or
    * behind the frontier are late and dropped. */
  private[streaming] def step(stored: Option[HoltState],
      batch: Iterator[DailyClose]): HoltState = {
    val init = stored.getOrElse(HoltState(0L, Long.MinValue, 0L, 0L))
    // (seq, closeCents) key: seq decides per the contract; equal seqs
    // (a caller bug, e.g. a restarted counter) still resolve
    // deterministically instead of by shuffle arrival order
    val latestPerDay = batch.toSeq
      .groupBy(_.day.getTime)
      .map { case (_, rows) => rows.maxBy(r => (r.seq, r.closeCents)) }
      .toSeq.sortBy(_.day.getTime)
    latestPerDay.foldLeft(init) { (st, row) =>
      if (row.day.getTime <= st.lastDayMs) st // late/duplicate day: drop
      else advance(st, row.closeCents).copy(lastDayMs = row.day.getTime)
    }
  }

  def holtForecastStream(ds: Dataset[DailyClose]): Dataset[HoltForecast] = {
    implicit val outEnc = Encoders.product[HoltForecast]
    implicit val stEnc = Encoders.product[HoltState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.series)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[DailyClose],
            state: GroupState[HoltState]) =>
          val next = step(state.getOption, rows)
          state.update(next)
          HoltForecast(series, next.nDays, next.level, next.trend,
            next.level + next.trend)
      }
  }
}
