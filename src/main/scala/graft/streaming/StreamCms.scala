package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.SketchAlgos

/** Per-source CMS state: the d = 4 × w = 256 cell array, flattened
  * row-major (cell(salt, b) at index salt·256 + b) — 1024 longs per
  * source no matter how many documents have streamed through. */
case class CmsState(cells: Array[Long])

/** The stream's per-batch emission: folded occurrence count, the
  * cell checksum (Σ (i+1)·cells(i) — gates the full array), and the
  * cells themselves so a reader (and the spec) can merge states
  * across sources by element-wise SUM. */
case class CmsEstimate(source: String, n: Long, cellCheck: Long,
    cells: Seq[Long])

/** `sketch_cms_bigram` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState` — completing the streaming sketch quartet
  * (HLL/KMV/MG shipped in [[StreamHll]]/[[StreamKmv]]/
  * [[StreamHeavyHitters]]). CMS cells are plain SUMS over the bigram
  * occurrence stream, so the update rule is commutative/associative
  * (NOT idempotent — a replayed document double-counts, same caveat
  * as any counting sketch; exactly-once sinks or the MG/HLL faces
  * cover replay-exposed paths). The salt table is FROZEN by
  * construction — cell(salt, b) hashes with the same
  * `md5(salt || ':' || gram)` prefix-60 arithmetic the batch entry's
  * column formulation computes (the [[StreamPsi]] frozen-reference
  * contract), so stream cells and batch cells are the same numbers by
  * construction; StreamCmsSpec proves the per-source final states
  * SUM to the batch entry's global cells bit-for-bit over shuffled
  * multi-batch arrivals, and that the min-over-salt point estimates
  * decoded from the streamed cells equal the batch entry's top-20
  * `est` column.
  *
  * Scale: state is 1024 longs per source — bounded by source
  * cardinality, not stream volume; because cells merge by element-wise
  * sum, per-source (or per-partition) states roll up to any coarser
  * census without touching the stream again.
  */
object StreamCms {

  val D = 4
  val W = 256

  /** The batch entry's cell hash: b = md5(salt ':' gram) prefix-60
    * mod 256 — bit-exact with the SQL column formulation. */
  private[streaming] def cellOf(salt: Int, gram: String): Int = {
    val bytes = (salt.toString + ":" + gram)
      .getBytes(StandardCharsets.UTF_8)
    (SketchAlgos.md5Prefix60(bytes, 0, bytes.length) % W).toInt
  }

  /** Fold one document's word bigrams (all occurrences, the batch
    * entry's `len(toks) >= 2` guard included) into `cells` in place;
    * returns the occurrence count folded. */
  private[streaming] def addDoc(cells: Array[Long], text: String): Long = {
    val toks = text.split(" ", -1)
    if (toks.length < 2) return 0L
    var i = 0
    var n = 0L
    while (i < toks.length - 1) {
      val gram = toks(i) + " " + toks(i + 1)
      var s = 0
      while (s < D) {
        cells(s * W + cellOf(s, gram)) += 1L
        s += 1
      }
      i += 1
      n += 1L
    }
    n
  }

  /** Point estimate for a gram from a cell array: min over the d
    * rows — the batch entry's `min(cells.cell)`. */
  private[streaming] def estimate(cells: Array[Long], gram: String): Long = {
    var best = Long.MaxValue
    var s = 0
    while (s < D) {
      val c = cells(s * W + cellOf(s, gram))
      if (c < best) best = c
      s += 1
    }
    best
  }

  private[streaming] def cellCheck(cells: Array[Long]): Long = {
    var acc = 0L
    var i = 0
    while (i < cells.length) { acc += (i + 1).toLong * cells(i); i += 1 }
    acc
  }

  def cmsStream(ds: Dataset[DocArrival]): Dataset[CmsEstimate] = {
    implicit val outEnc = Encoders.product[CmsEstimate]
    implicit val stEnc = Encoders.product[CmsState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival],
            state: GroupState[CmsState]) =>
          // clone: never mutate a state-store-held array in place
          // (the StreamPsi aliasing rule)
          val cells = state.getOption.map(_.cells.clone())
            .getOrElse(new Array[Long](D * W))
          rows.foreach(r => addDoc(cells, r.text))
          state.update(CmsState(cells))
          CmsEstimate(source, cells.sum / D, cellCheck(cells),
            cells.toSeq)
      }
  }
}
