package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SketchAlgos

/** One streamed event — the stream-side input of the
  * `events_bootstrap_ci` census (cents already extracted, like the
  * batch entry's first projection). */
case class EventArrival(series: String, eventId: Long, cents: Long)

/** Per-series bootstrap state: the point-estimate sums plus one
  * (Σw, Σwx) accumulator pair per replica — 2 + 2·B longs per series
  * no matter how many events have streamed through. The bootstrap is
  * incrementally maintainable EXACTLY (unlike a quantile) because a
  * Poisson-weighted mean is a ratio of two sums and each event's
  * replica weights are pure functions of (event_id, replica). */
case class BootState(n: Long, sx: Long, sw: Array[Long], swx: Array[Long])

/** The stream's per-batch emission after folding the batch — column
  * semantics match the batch entry (`events_bootstrap_ci`). */
case class BootEstimate(series: String, nEvents: Long, meanMilli: Long,
    bootN: Long, bootLoMilli: Long, bootHiMilli: Long, bootVarMilli2: Long)

/** `events_bootstrap_ci` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState`: each arriving event's 32 Poisson(1) replica
  * weights come from the same row-local [[SketchAlgos.bootPoisData]]
  * kernel the batch entry calls (a pure function of (event_id,
  * replica) — no RNG state to checkpoint), so after any prefix of
  * events the stream state's replica sums equal the batch entry's
  * sums over the same prefix; the emission restates the batch
  * estimator (truncating replica means, min/max order statistics,
  * unbiased between-replica variance on the BigInt lattice).
  * Additive state is commutative/associative but NOT idempotent —
  * like every streaming SUM, delivery must be effectively-exactly-once
  * (the [[IncrementalAgg]] contract; a replayed event would
  * double-count in both the point mean and every replica, consistently).
  * StreamBootstrapSpec proves shuffled multi-batch arrivals end at the
  * batch entry's rows and that any split of the stream folds to the
  * same state.
  *
  * Scale: 66 longs per series — bounded by series cardinality, not
  * stream volume; series partition across executors and checkpoint
  * with the query. */
object StreamBootstrap {

  val B = 32

  /** Batch-kernel adapter: the event's B replica weights. */
  private[streaming] def weights(eventId: Long): Array[Long] =
    SketchAlgos.bootPoisData(
      UTF8String.fromString(eventId.toString), B).toLongArray()

  /** Fold one event into the state — pure addition per replica. */
  private[streaming] def add(st: BootState, eventId: Long,
      cents: Long): BootState = {
    val ws = weights(eventId)
    val sw = st.sw.clone()
    val swx = st.swx.clone()
    var b = 0
    while (b < B) {
      sw(b) += ws(b)
      swx(b) += ws(b) * cents
      b += 1
    }
    BootState(st.n + 1L, st.sx + cents, sw, swx)
  }

  private[streaming] def empty: BootState =
    BootState(0L, 0L, new Array[Long](B), new Array[Long](B))

  /** The batch entry's estimator over the replica sums: truncating
    * per-replica means in milli-cents (replicas with Σw = 0 drop),
    * min/max order statistics, unbiased variance in BigInt — the
    * arithmetic of the entry's DECIMAL(38,0)/HUGEINT formulation. */
  private[streaming] def emit(series: String, st: BootState): BootEstimate = {
    val ms = (0 until B).flatMap { b =>
      if (st.sw(b) > 0L) Some(1000L * st.swx(b) / st.sw(b)) else None
    }
    val bn = ms.size.toLong
    val sm = ms.map(BigInt(_)).sum
    val sm2 = ms.map(m => BigInt(m) * m).sum
    val variance =
      if (bn > 1L) ((bn * sm2 - sm * sm) / (bn * (bn - 1))).toLong
      else 0L
    BootEstimate(series, st.n,
      if (st.n > 0L) 1000L * st.sx / st.n else 0L,
      bn,
      if (ms.nonEmpty) ms.min else 0L,
      if (ms.nonEmpty) ms.max else 0L,
      variance)
  }

  def bootstrapStream(ds: Dataset[EventArrival]): Dataset[BootEstimate] = {
    implicit val outEnc = Encoders.product[BootEstimate]
    implicit val stEnc = Encoders.product[BootState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.series)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[EventArrival],
            state: GroupState[BootState]) =>
          val init = state.getOption.getOrElse(empty)
          val next = rows.foldLeft(init)((acc, r) =>
            add(acc, r.eventId, r.cents))
          state.update(next)
          emit(series, next)
      }
  }
}
