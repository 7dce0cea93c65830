package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SketchAlgos

/** Per-source bottom-k state: the k smallest distinct gram hashes seen
  * so far, ascending — ≤ k longs per source whatever the stream
  * volume. */
case class KmvState(hashes: Seq[Long])

/** The stream's per-batch emission: sketch size, θ (the k-th smallest
  * hash, = the largest tracked when the sketch is full), and the
  * (k−1)·2⁶⁰/θ distinct estimate (exact count while the sketch is
  * not yet full). */
case class KmvEstimate(source: String, nHashes: Int, theta: Long,
    est: Long)

/** `distinct_kmv_setops`'s sketch maintained INCREMENTALLY in stream
  * state via `mapGroupsWithState` — the third streaming sketch face
  * beside [[StreamHll]] (distinct count) and [[StreamHeavyHitters]]
  * (frequent items): per source, the k smallest distinct word-3-gram
  * hashes. KMV merge is union-then-retake-k — commutative,
  * associative and IDEMPOTENT (a replayed document's hashes are
  * already members or too large), so reprocessing cannot corrupt the
  * state, and any micro-batch split ends at the same sketch as one
  * batch pass. Each arriving document is sketched ROW-LOCALLY by the
  * same [[SketchAlgos.kminHashData]] kernel the batch entry calls.
  *
  * Unlike the HLL registers, the KMV state supports SET OPERATIONS
  * between keys (the `distinct_kmv_setops` estimators run on exactly
  * this state), so a snapshot of this stream's state table IS the
  * input to pairwise union/intersection/Jaccard estimation — the
  * streaming path to "how much does today's crawl overlap with
  * yesterday's" without re-scanning either corpus.
  *
  * Scale: ≤ k longs per source, bounded by source cardinality ×
  * capacity, not stream volume; sources partition across executors
  * and checkpoint with the query. */
object StreamKmv {

  /** 2⁶⁰ — the md5-prefix hash space size (matches the batch entry's
    * 1152921504606846976 literal). */
  val HashSpace: Long = 1L << 60

  /** Batch-kernel adapter: the document's ≤k smallest distinct gram
    * hashes (empty when fewer than 3 tokens). */
  private[streaming] def docHashes(text: String, k: Int): Array[Long] =
    SketchAlgos.kminHashData(UTF8String.fromString(text), k, 3)
      .toLongArray()

  /** Union-then-retake-k — the KMV merge law. Both sides ascending →
    * merged ascending, deduplicated, truncated at k. */
  private[streaming] def merge(a: Seq[Long], b: Array[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** The batch entry's estimator restated: with a FULL sketch,
    * est = (k−1)·2⁶⁰/θ where θ = the k-th smallest (the count of
    * tracked hashes strictly below θ is k−1, matching the
    * `|{h < θ}|·2⁶⁰/θ` form); a not-yet-full sketch IS the distinct
    * set, so the count is exact. */
  private[streaming] def estimate(hashes: Seq[Long], k: Int): Long =
    if (hashes.size < k) hashes.size.toLong
    else {
      val theta = hashes.last
      ((BigInt(k - 1) * HashSpace) / theta).toLong
    }

  def kmvStream(ds: Dataset[DocArrival], k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, s"k must be >= 2, got $k")
    implicit val outEnc = Encoders.product[KmvEstimate]
    implicit val stEnc = Encoders.product[KmvState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival],
            state: GroupState[KmvState]) =>
          val init = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val next = rows.foldLeft(init)(
            (acc, r) => merge(acc, docHashes(r.text, k), k))
          state.update(KmvState(next))
          KmvEstimate(source, next.size,
            if (next.isEmpty) 0L else next.last, estimate(next, k))
      }
  }
}
