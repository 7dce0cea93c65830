package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SketchAlgos

/** One streamed document — the stream-side input of the
  * `distinct_hll_portable` census. */
case class DocArrival(source: String, docId: Long, text: String)

/** Per-source HLL state: the 64 registers, element-wise-max-merged —
  * 64 longs per source no matter how many documents have streamed
  * through, the same bounded-state argument as the batch entry's
  * 64-row-per-source exchange. */
case class HllState(regs: Array[Long])

/** The stream's per-batch emission: register fingerprint + integer
  * estimate after folding the batch (column names match the batch
  * entry's `reg_check` / `est`). */
case class HllEstimate(source: String, regCheck: Long, est: Long)

/** `distinct_hll_portable` maintained INCREMENTALLY in stream state via
  * `mapGroupsWithState` — the streaming distinct-count face that
  * [[IncrementalAgg]]'s scaladoc points at (count-distinct is not
  * incrementally maintainable exactly; its SKETCH is, because HLL
  * registers merge by element-wise max, which is commutative,
  * associative and idempotent — reprocessed documents cannot corrupt
  * the state). Each arriving document is sketched ROW-LOCALLY by the
  * same [[SketchAlgos.hllRegsData]] kernel the batch entry calls, so
  * the stream and batch registers are the same bytes by construction;
  * [[estimate]] restates the batch entry's integer estimator
  * (DECIMAL-exact raw branch + linear-counting small-range branch)
  * over a BigInt lattice. StreamHllSpec proves the final stream state
  * equals the batch entry's (reg_check, est) per source over shuffled
  * multi-batch arrivals.
  *
  * Scale: state is 64 longs per source — bounded by source
  * cardinality, not stream volume; sources partition across executors
  * and checkpoint with the query.
  */
object StreamHll {

  val M = 64

  /** Batch-kernel adapter: the document's 64 HLL registers (empty
    * array → all-zero registers when the doc has fewer than 3
    * tokens). */
  private[streaming] def docRegs(text: String): Array[Long] = {
    val a = SketchAlgos
      .hllRegsData(UTF8String.fromString(text), M, 3).toLongArray()
    if (a.isEmpty) new Array[Long](M) else a
  }

  /** Element-wise max merge — commutative/associative/idempotent. */
  private[streaming] def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](M)
    var i = 0
    while (i < M) { out(i) = math.max(a(i), b(i)); i += 1 }
    out
  }

  /** The batch entry's integer estimator over the registers: raw
    * αm·m²·2⁶²/Σ2^(62−M_j) (exact BigInt divisions, α = 709343 ppm),
    * linear counting m·ln(m/V) when V zero registers remain and the
    * raw estimate is ≤ 5m/2 — arithmetic identical to the entry's
    * DECIMAL(38,0) / HUGEINT formulation. */
  private[streaming] def estimate(regs: Array[Long]): Long = {
    var vZero = 0
    var sSum = BigInt(0)
    var i = 0
    while (i < M) {
      if (regs(i) == 0L) vZero += 1
      sSum += BigInt(1) << (62 - regs(i).toInt)
      i += 1
    }
    val raw = (BigInt(709343) * M * M * (BigInt(1) << 62) / sSum /
      1000000).toLong
    if (vZero > 0 && raw <= 160L)
      math.round(64000.0 * math.log(64.0 / vZero)) / 1000L
    else raw
  }

  private[streaming] def regCheck(regs: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < M) { s += (i + 1).toLong * regs(i); i += 1 }
    s
  }

  def hllStream(ds: Dataset[DocArrival]): Dataset[HllEstimate] = {
    implicit val outEnc = Encoders.product[HllEstimate]
    implicit val stEnc = Encoders.product[HllState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival],
            state: GroupState[HllState]) =>
          val init = state.getOption.map(_.regs)
            .getOrElse(new Array[Long](M))
          val next = rows.foldLeft(init)((acc, r) => merge(acc, docRegs(r.text)))
          state.update(HllState(next))
          HllEstimate(source, regCheck(next), estimate(next))
      }
  }
}
