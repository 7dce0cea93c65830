package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ext.TextOps

/** A doc's fingerprint in one SimHash band bucket, on the stream. */
case class BandedDoc(band: Int, bval: Long, doc_id: Long, fp: Long)

/** [[BandedDoc]] plus event time, for the TTL-evicting variant. */
case class BandedDocTs(band: Int, bval: Long, doc_id: Long, fp: Long,
    ts: java.sql.Timestamp)

/** A confirmed streaming near-dup: `id_b` arrived while `id_a` (an
  * earlier doc within Hamming <= maxHamming) was still in state. */
case class NearDupHit(id_a: Long, id_b: Long, band: Int, hamming: Int)

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

  /** Streaming CONTAMINATION flagging — the streaming face of
    * `ext/Dedup.ngramOverlapCounts`: as the corpus streams in, emit each
    * document that shares any token `n`-gram with the (static, small)
    * eval/benchmark set, so contaminated docs are dropped during
    * ingestion instead of by a later batch sweep.
    *
    * Scale shape, unchanged from batch: the eval side's distinct grams
    * are BROADCAST into every micro-batch (stream-static join — no
    * stream state for the join itself); a doc's exploded grams survive
    * only on a hit, and `dropDuplicatesWithinWatermark` collapses
    * multi-gram hits to one flag row per doc with WATERMARK-BOUNDED
    * state (the id, not the document). A doc re-arriving after its
    * horizon re-flags — idempotent for the downstream exclusion join.
    *
    * @param delay watermark delay on `tsCol`, also the per-doc dedup
    *              horizon */
  def contaminatedByNgrams(df: DataFrame, evalDocs: DataFrame,
      tsCol: String, idCol: String, textCol: String,
      n: Int = 13, delay: String = "10 minutes"): DataFrame = {
    val evalGrams = evalDocs
      .where(col(textCol).isNotNull)
      .select(explode(graft.ext.Dedup.tokenNgrams(col(textCol), n))
        .as("gram"))
      .distinct()
    df.where(col(textCol).isNotNull)
      .withWatermark(tsCol, delay)
      .select(col(tsCol), col(idCol),
        explode(graft.ext.Dedup.tokenNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .select(col(tsCol), col(idCol))
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** Streaming NEAR-dup detection — the streaming face of
    * `ext/Dedup.simhashNearDupPairs`, same Manku multi-index geometry:
    * each doc's 63-bit single-pass SimHash splits into 4 16-bit bands;
    * a pair within Hamming <= maxHamming (< 4) agrees exactly on >= 1
    * band (pigeonhole), so state partitions by (band, band_value) and a
    * new doc only ever compares against its own bucket — never the
    * stream history. Both fingerprints are in hand at the bucket (8
    * bytes each beside the id — the state carries sketches, never
    * documents), so the band hit is CONFIRMED with `bit_count` before
    * it is emitted: the output is (id_a, id_b, band, hamming) near-dup
    * pairs, not raw candidates.
    *
    * A pair sharing several bands emits once per shared band
    * (exactly like the batch band join pre-`distinct`) — downstream
    * dedups on (id_a, id_b), batch-cheap on the thinned pair stream.
    * State per bucket is a FIFO of the last `stateDocsPerBand`
    * (id, fp) entries: bounded state on an unbounded stream, with the
    * honest recall trade every eviction policy has (a near-dup of an
    * evicted doc is missed — size the cap to the bucket's expected
    * dwell time, or add an event-time timeout for calendar eviction).
    */
  def nearDupBySimhash(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, stateDocsPerBand: Int = 64): Dataset[NearDupHit] = {
    require(maxHamming < 4,
      s"maxHamming=$maxHamming breaks the 4-band pigeonhole guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val banded = df
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        call_function("simhash63", TextOps.tokens(col(textCol))).as("fp"))
      .select(explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bval"),
          col("doc_id"), col("fp"))): _*)).as("bd"))
      .select($"bd.band", $"bd.bval", $"bd.doc_id", $"bd.fp")
      .as[BandedDoc]
    banded
      .groupByKey(bd => (bd.band, bd.bval))
      .flatMapGroupsWithState[List[(Long, Long)], NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil) // newest first
          val hits = List.newBuilder[NearDupHit]
          // arrival order within a batch is nondeterministic; doc_id
          // order makes the emitted (a, b) orientation deterministic
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            for ((sid, sfp) <- seen if sid != r.doc_id) {
              val h = java.lang.Long.bitCount(sfp ^ r.fp)
              if (h <= maxHamming)
                hits += NearDupHit(math.min(sid, r.doc_id),
                  math.max(sid, r.doc_id), band, h)
            }
            // a re-delivered doc_id replaces its old entry, so state
            // stays one entry per doc instead of shrinking FIFO capacity
            // and causing peers to emit duplicate pairs. The re-delivery
            // itself still re-compares against the bucket and re-emits
            // its (already-seen) pairs once per arrival — absorbed by
            // the same downstream (id_a, id_b) dedup as multi-band hits.
            seen = ((r.doc_id, r.fp) :: seen.filterNot(_._1 == r.doc_id))
              .take(stateDocsPerBand)
          }
          state.update(seen)
          hits.result().iterator
      }
  }

  /** [[nearDupBySimhash]] with CALENDAR eviction — the event-time
    * timeout the capacity-only variant's docstring promises: state
    * entries older than `ttl` behind the WATERMARK are dropped at the
    * bucket's next arrival, and a bucket idle past its newest entry's
    * ttl is removed whole by the event-time timeout (no tombstone
    * accumulation from buckets that stop receiving). The recall
    * contract becomes a TIME guarantee instead of a count guarantee:
    * two near-dups whose event times are within `ttl` (and inside the
    * watermark's lag discipline) always pair, no matter how many
    * unrelated docs landed in the bucket between them — while at-scale
    * state is bounded by arrival rate × ttl, not by stream lifetime.
    * The FIFO cap stays as a backstop against a single hot bucket.
    *
    * The caller must NOT pre-apply `withWatermark` — it is applied here
    * on `tsCol` with `delay`, because `EventTimeTimeout` requires the
    * watermark and the eviction rule is defined against it.
    *
    * @param ttlMs eviction horizon in EVENT-TIME milliseconds
    * @param delay watermark delay, e.g. "10 seconds" — late data beyond
    *              this is dropped before the bucket sees it */
  def nearDupBySimhashTtl(df: DataFrame, idCol: String, textCol: String,
      tsCol: String, ttlMs: Long, delay: String,
      maxHamming: Int = 3,
      stateDocsPerBand: Int = 1024): Dataset[NearDupHit] = {
    require(maxHamming < 4,
      s"maxHamming=$maxHamming breaks the 4-band pigeonhole guarantee")
    require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // ts stays a TOP-LEVEL column through the fan-out: the event-time
    // watermark tag lives in the attribute's metadata, and a field
    // re-extracted from a struct is a fresh attribute without it
    val banded = df
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(tsCol).cast("timestamp").as("ts"),
        call_function("simhash63", TextOps.tokens(col(textCol))).as("fp"))
      .withWatermark("ts", delay)
      .select($"ts", explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bval"),
          col("doc_id"), col("fp"))): _*)).as("bd"))
      .select($"bd.band", $"bd.bval", $"bd.doc_id", $"bd.fp", $"ts")
      .as[BandedDocTs]
    banded
      .groupByKey(bd => (bd.band, bd.bval))
      .flatMapGroupsWithState[List[(Long, Long, Long)], NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rows, state: GroupState[List[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            // idle bucket: every entry is past its ttl by construction
            // of the timeout timestamp — drop the whole bucket
            state.remove()
            Iterator.empty
          } else {
            val wmMs = state.getCurrentWatermarkMs()
            // calendar eviction first: entries whose event time is more
            // than ttl behind the watermark can no longer pair with any
            // in-horizon arrival — drop before comparing
            var seen = state.getOption.getOrElse(Nil) // newest first
              .filter(_._3 >= wmMs - ttlMs)
            val hits = List.newBuilder[NearDupHit]
            for (r <- rows.toSeq.sortBy(_.doc_id)) {
              val tsMs = r.ts.getTime
              for ((sid, sfp, _) <- seen if sid != r.doc_id) {
                val h = java.lang.Long.bitCount(sfp ^ r.fp)
                if (h <= maxHamming)
                  hits += NearDupHit(math.min(sid, r.doc_id),
                    math.max(sid, r.doc_id), band, h)
              }
              seen = ((r.doc_id, r.fp, tsMs) ::
                seen.filterNot(_._1 == r.doc_id)).take(stateDocsPerBand)
            }
            state.update(seen)
            // the bucket as a whole expires when its NEWEST entry falls
            // ttl behind the watermark; the timestamp must sit strictly
            // ahead of the current watermark or the runtime rejects it
            val newestMs = seen.map(_._3).max
            state.setTimeoutTimestamp(math.max(newestMs + ttlMs, wmMs + 1))
            hits.result().iterator
          }
      }
  }
}
