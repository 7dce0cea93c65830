package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.ext.HeavyHitters

/** Per-source Misra-Gries state: the tracked (item, weight) counters as
  * parallel sequences (a product encoder checkpoints cleanly — no Kryo
  * Map buffer in the state store) plus the processed-token count n the
  * n/k error bound is stated against. At most k−1 items, whatever the
  * stream volume. */
case class HhState(n: Long, items: Seq[String], weights: Seq[Long])

/** The stream's per-batch emission: processed-token total and the
  * counters, weight-descending (ties by item) like the batch
  * Aggregator's `finish`. */
case class HhUpdate(source: String, nTokens: Long, items: Seq[String],
    weights: Seq[Long])

/** `heavy_hitters_mg` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState` — the streaming frequent-items face beside
  * [[StreamHll]]'s distinct-count face: per source, the classic
  * Misra-Gries counters fold each arriving document's tokens through
  * the SAME [[HeavyHitters.reduceStep]] the batch Aggregator calls, so
  * stream and batch updates are one code path, and the MG guarantee
  * (every counter undercounts its true frequency by at most n/k; any
  * item with true frequency > n/k is tracked) holds after every batch
  * by induction — it is a property of the update rule, not of where
  * the fold runs. StreamHeavyHittersSpec pins the split-anywhere
  * determinism (the stream equals one sequential fold over the same
  * arrival order) and the guarantee against exact counts.
  *
  * Scale: state is ≤ k−1 counters + one long per source — bounded by
  * source cardinality × capacity, not stream volume; sources partition
  * across executors and checkpoint with the query. The batch entry's
  * two-pass exact upgrade (`heavy_hitters_exact`: MG superset →
  * broadcast recount) applies unchanged to a snapshot of this state.
  */
object StreamHeavyHitters {

  /** The batch entries' tokenization (split on single spaces, empties
    * dropped) — row-local, no state interaction. */
  private[streaming] def tokensOf(text: String): Iterator[String] =
    text.split(' ').iterator.filter(_.nonEmpty)

  def hhStream(ds: Dataset[DocArrival], k: Int): Dataset[HhUpdate] = {
    require(k >= 2, s"capacity must be >= 2, got $k")
    implicit val outEnc = Encoders.product[HhUpdate]
    implicit val stEnc = Encoders.product[HhState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival],
            state: GroupState[HhState]) =>
          val st = state.getOption.getOrElse(HhState(0L, Nil, Nil))
          var m = st.items.zip(st.weights).toMap
          var n = st.n
          // deterministic within-batch order: docId (shuffle iterator
          // order is not a contract; MG results are order-sensitive)
          rows.toSeq.sortBy(_.docId).foreach { r =>
            tokensOf(r.text).foreach { t =>
              m = HeavyHitters.reduceStep(m, t, k)
              n += 1L
            }
          }
          val sorted = m.toSeq.sortBy { case (i, w) => (-w, i) }
          state.update(HhState(n, sorted.map(_._1), sorted.map(_._2)))
          HhUpdate(source, n, sorted.map(_._1), sorted.map(_._2))
      }
  }
}
