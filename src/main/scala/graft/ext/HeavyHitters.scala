package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters as a typed Spark `Aggregator` — the
  * fixed-memory, mergeable frequent-items sketch (the §2.10 custom
  * surface Spark's built-ins lack: `count_min_sketch` answers point
  * queries but cannot enumerate the frequent items).
  *
  * Guarantees (classic MG + mergeable-summaries merge): with capacity
  * k, every item with true frequency > n/k survives in the summary,
  * and every reported weight w satisfies true − n/k ≤ w ≤ true. The
  * buffer is at most k−1 entries per partition REGARDLESS of input
  * size — at 100 TB the shuffle carries k counters per partition, not
  * a vocabulary; contrast with exact `groupBy(term).count` whose
  * shuffle is vocabulary-sized. Merge sums summaries then decrements
  * by the k-th largest weight, which preserves both bounds
  * (Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * `finish` emits (item, weight) sorted by weight desc then item — a
  * deterministic summary given a deterministic partitioning; the
  * catalog entry therefore gets the rows-only check plus the
  * HeavyHittersSpec guarantee assertions (presence + error bound vs
  * exact counts, merge invariance under repartitioning).
  */
object HeavyHitters {

  final case class Hit(item: String, weight: Long)

  /** One MG update — shared by the batch [[sketch]] Aggregator and the
    * streaming face ([[graft.streaming.StreamHeavyHitters]]) so the two
    * cannot drift: increment a tracked item, admit while below
    * capacity, else decrement-all and drop zeros. */
  def reduceStep(b: Map[String, Long], item: String, k: Int): Map[String, Long] =
    if (b.contains(item)) b.updated(item, b(item) + 1L)
    else if (b.size < k - 1) b.updated(item, 1L)
    else { // decrement-all; drop zeros (classic MG step)
      b.flatMap { case (i, w) => if (w > 1L) Some(i -> (w - 1L)) else None }
    }

  /** Mergeable-summaries merge (Agarwal et al.): sum, then subtract the
    * k-th largest weight and keep positives. */
  def mergeStep(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (i, w)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + w)
    }
    if (summed.size <= k - 1) summed
    else { // subtract the k-th largest weight, keep positives
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      summed.flatMap { case (i, w) =>
        if (w > kth) Some(i -> (w - kth)) else None
      }
    }
  }

  /** @param k capacity: tracks up to k−1 items; error bound n/k */
  def sketch(k: Int): Aggregator[String, Map[String, Long], Seq[Hit]] = {
    require(k >= 2, s"capacity must be >= 2, got $k")
    new Aggregator[String, Map[String, Long], Seq[Hit]] {

      def zero: Map[String, Long] = Map.empty

      def reduce(b: Map[String, Long], item: String): Map[String, Long] =
        reduceStep(b, item, k)

      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        mergeStep(a, b, k)

      def finish(b: Map[String, Long]): Seq[Hit] =
        b.toSeq.map { case (i, w) => Hit(i, w) }
          .sortBy(h => (-h.weight, h.item))

      def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
      def outputEncoder: Encoder[Seq[Hit]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
    }
  }

}
