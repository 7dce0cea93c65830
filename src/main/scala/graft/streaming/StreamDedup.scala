package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the streaming face of `ext/Dedup.exact`:
  * suppress re-occurrences of identical content as the corpus streams
  * in, instead of a batch groupBy after the fact.
  *
  * State discipline at scale: the dedup key is the sha-256 content
  * digest (32 bytes/row in the state store, never the document), and
  * `dropDuplicatesWithinWatermark` lets the state store EVICT digests
  * once the watermark passes — bounded state, which plain
  * `dropDuplicates` (grow-forever state) cannot promise on an
  * unbounded stream. Semantics: within any watermark window a content
  * value is emitted exactly once; a re-occurrence after eviction
  * re-emits, which downstream exact dedup (batch, cheap on the
  * already-thinned stream) absorbs.
  */
object StreamDedup {

  /** @param tsCol   event-time column (watermark anchor)
    * @param contentCol column whose bytes define row identity
    * @param delay   watermark delay, e.g. "10 minutes" — also the
    *                guaranteed dedup horizon */
  def dedupByContent(df: DataFrame, tsCol: String, contentCol: String,
      delay: String): DataFrame =
    df.withColumn("content_sha", sha2(col(contentCol).cast("binary"), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_sha")
}
