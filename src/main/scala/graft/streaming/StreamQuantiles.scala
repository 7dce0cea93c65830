package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One streamed priced row — the stream-side input of the
  * `sketch_quantiles` lattice (cents exactly as the batch entry
  * computes them: `round(o_totalprice * 100)::BIGINT`). */
case class PriceArrival(status: String, cents: Long)

/** Per-group lattice state: occupied cell → count. ≤ 16·64 entries no
  * matter the row count — the same bounded-state argument as the batch
  * entry's |groups|·|cells| exchange. */
case class QuantState(cells: Map[Long, Long])

/** The stream's per-batch emission, column-for-column the batch
  * entry's sketch arm: count, lattice size/checksum, and the three
  * decoded quantile estimates. */
case class QuantEstimate(status: String, n: Long, stateCells: Long,
    stateCheck: Long, q50Est: Long, q90Est: Long, q99Est: Long)

/** `sketch_quantiles` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState` — the one-rule-two-faces pattern
  * ([[StreamHll]]/[[StreamKmv]]/[[StreamHeavyHitters]]/[[StreamCms]]/
  * [[StreamPsi]]): the lattice update is a plain cell-count increment,
  * commutative and associative, so per-partition / per-day states
  * merge by cell-wise sum and any arrival order ends at the same
  * state. [[cell]]/[[decode]]/[[quantile]] restate the batch entry's
  * integer arithmetic exactly (bit-length bucket + top-4-bits
  * sub-bucket; lower-bound decode; ceil-rank cumulative scan), so the
  * final stream state reproduces the batch columns bit-for-bit —
  * StreamQuantilesSpec proves it over shuffled multi-batch arrivals.
  *
  * Scale: state is ≤ ~640 (cell, count) pairs per group; groups
  * partition across executors and checkpoint with the query.
  */
object StreamQuantiles {

  /** The batch entry's lattice cell: v < 16 exact, else
    * 16·(bitlength−1) + top-4-bits-after-MSB. */
  private[streaming] def cell(v: Long): Long =
    if (v < 16L) v
    else {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
      16L * b + ((v >>> (b - 4)) & 15L)
    }

  /** Lower-bound decode — the batch entry's
    * `(16 + idx % 16) << (idx div 16 − 4)`. */
  private[streaming] def decode(i: Long): Long =
    if (i < 16L) i else (16L + i % 16) << (i / 16 - 4).toInt

  /** Smallest cell whose cumulative count reaches ceil(num·n/den) —
    * the batch entry's integer-rank rule. */
  private[streaming] def quantile(cells: Map[Long, Long], n: Long,
      num: Long, den: Long): Long = {
    val rank = (num * n + den - 1) / den
    var cum = 0L
    val it = cells.toSeq.sortBy(_._1).iterator
    while (it.hasNext) {
      val (idx, cnt) = it.next()
      cum += cnt
      if (cum >= rank) return decode(idx)
    }
    -1L // unreachable for n > 0
  }

  private[streaming] def stateCheck(cells: Map[Long, Long]): Long =
    cells.iterator.map { case (i, c) => i * c }.sum

  def quantileStream(ds: Dataset[PriceArrival]): Dataset[QuantEstimate] = {
    implicit val outEnc = Encoders.product[QuantEstimate]
    implicit val stEnc = Encoders.product[QuantState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.status)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (status: String, rows: Iterator[PriceArrival],
            state: GroupState[QuantState]) =>
          val cells = rows.foldLeft(
            state.getOption.map(_.cells).getOrElse(Map.empty[Long, Long])) {
            (m, r) =>
              val i = cell(r.cents)
              m.updated(i, m.getOrElse(i, 0L) + 1L)
          }
          state.update(QuantState(cells))
          val n = cells.valuesIterator.sum
          QuantEstimate(status, n, cells.size.toLong, stateCheck(cells),
            quantile(cells, n, 1, 2), quantile(cells, n, 9, 10),
            quantile(cells, n, 99, 100))
      }
  }
}
