package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — the two-live-streams face
  * of Structured Streaming (impressions ⋈ clicks, orders ⋈ fills):
  * both sides buffer rows in keyed state and match as the other side's
  * rows arrive.
  *
  * Unbounded state is the failure mode at scale: without a time bound
  * Spark must keep EVERY past row of both streams forever. Two fences
  * make the state finite, and both are mandatory here rather than
  * optional hints:
  *   - a watermark on each side (how late a row can arrive), and
  *   - an event-time range predicate tying the two clocks together
  *     (`right.ts` within `[left.ts, left.ts + within]`), from which
  *     Spark derives a state eviction horizon on BOTH sides — a left
  *     row older than `watermark - within` can never match a future
  *     right row, so its state is dropped.
  *
  * Outer variants ride the same horizon: a left-outer row emits its
  * null-padded result only once the global watermark proves no
  * matching right row can still arrive (correctness over latency, the
  * same late-data contract as the windowed aggregations).
  *
  * The join keys stay in the ON clause as an equi-conjunct, so the
  * physical plan is a StreamingSymmetricHashJoin hash-partitioned by
  * key — state lookups are local to the key's partition; nothing
  * resembling a cross-stream scan survives at 100 TB.
  */
object StreamStreamJoin {

  /** Join rows of `right` to rows of `left` with equal `key` whose
    * `rightTs` falls in `[leftTs, leftTs + within]`.
    *
    * @param maxDelay watermark delay on both sides, e.g. "10 seconds"
    * @param within   match window, e.g. "10 seconds"
    * @param joinType "inner", "left_outer", ... (outer types require
    *                 exactly this watermark + range shape, enforced by
    *                 Spark's UnsupportedOperationChecker at start())
    */
  def joinWithin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      maxDelay: String, within: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, maxDelay).alias("l")
    val r = right.withWatermark(rightTs, maxDelay).alias("r")
    l.join(r,
      expr(
        s"""l.$key = r.$key AND
           |r.$rightTs >= l.$leftTs AND
           |r.$rightTs <= l.$leftTs + interval $within""".stripMargin),
      joinType)
  }
}
