package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One rate observation (the reference's warehouse row,
  * load_to_bigquery.py:57-63, with a unique uid tie-break). */
case class RateObs(base: String, target: String, rate: Double,
    ts: Timestamp, uid: Long)

/** `current_rates` maintained **incrementally in stream state** via
  * `mapGroupsWithState` — the stateful alternative to MicroBatch's
  * read-modify-write snapshot: per key, state holds the current row and
  * each micro-batch emits the (possibly unchanged) latest. The MERGE
  * guard is identical: an incoming row replaces state only if strictly
  * newer (load_to_bigquery.py:102); ties keep the stored row.
  *
  * Scale: state is one row per (base, target) pair — bounded by key
  * cardinality, not input volume; keys partition across executors and
  * checkpoint with the query.
  */
object StatefulLatest {

  /** Full-precision timestamp order: Timestamp.compareTo includes the
    * nanos field, matching the batch path (Load.upsertLatest orders by
    * the full TimestampType) — getTime alone would treat µs-apart rows
    * as ties here but strictly newer in batch. */
  private def newer(a: RateObs, b: RateObs): Boolean = {
    val c = a.ts.compareTo(b.ts)
    c > 0 || (c == 0 && a.uid > b.uid)
  }

  /** The per-key transition: fold a batch's rows into stored state. */
  private[streaming] def step(stored: Option[RateObs],
      batch: Iterator[RateObs]): Option[RateObs] = {
    val incoming = batch.foldLeft(Option.empty[RateObs]) { (best, r) =>
      best match {
        case Some(b) if !newer(r, b) => best
        case _ => Some(r)
      }
    }
    (stored, incoming) match {
      case (Some(s), Some(i)) if i.ts.compareTo(s.ts) > 0 => Some(i)
      case (Some(s), _) => Some(s) // older or tied incoming never clobbers
      case (None, i) => i
    }
  }

  def latestPerKeyStream(ds: Dataset[RateObs]): Dataset[RateObs] = {
    implicit val enc = Encoders.product[RateObs]
    implicit val keyEnc = Encoders.product[(String, String)]
    ds.groupByKey(r => (r.base, r.target))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: (String, String), rows: Iterator[RateObs],
            state: GroupState[RateObs]) =>
          val next = step(state.getOption, rows).get // rows is non-empty
          state.update(next)
          next
      }
  }
}
