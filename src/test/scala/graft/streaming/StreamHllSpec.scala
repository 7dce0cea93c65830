package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.queries.SketchQueries

/** Incremental HLL distinct census: stream registers are the batch
  * entry's registers by construction (same kernel), the estimator
  * restates the entry's integer arithmetic, and the final stream state
  * equals the batch `distinct_hll_portable` output per source over
  * shuffled multi-batch arrivals. */
class StreamHllSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("merge is element-wise max: commutative, associative, idempotent") {
    val a = Array.tabulate(64)(i => (i % 7).toLong)
    val b = Array.tabulate(64)(i => ((i * 3) % 5).toLong)
    val ab = StreamHll.merge(a, b)
    assert(ab.toSeq == StreamHll.merge(b, a).toSeq)
    assert(StreamHll.merge(ab, b).toSeq == ab.toSeq) // idempotent re-merge
    assert(ab.zipWithIndex.forall { case (v, i) => v == math.max(a(i), b(i)) })
  }

  test("docRegs: fewer than 3 tokens -> all-zero registers (merge " +
      "identity), matching the batch entry where such docs emit no rows") {
    assert(StreamHll.docRegs("two tokens").forall(_ == 0L))
    assert(StreamHll.docRegs("").forall(_ == 0L))
    val some = StreamHll.docRegs("a b c d e")
    assert(some.exists(_ > 0L))
  }

  test("estimate: raw branch matches the BigInt formula; small-range " +
      "branch takes linear counting m*ln(m/V)") {
    // a sparse register set -> v_zero > 0, raw small -> LC branch
    val sparse = new Array[Long](64)
    sparse(3) = 2L; sparse(17) = 1L; sparse(40) = 3L
    val v = 61
    val lc = math.round(64000.0 * math.log(64.0 / v)) / 1000L
    assert(StreamHll.estimate(sparse) == lc)
    // a saturated register set -> raw branch
    val dense = Array.tabulate(64)(i => (i % 4 + 1).toLong)
    var sSum = BigInt(0)
    dense.foreach(m => sSum += BigInt(1) << (62 - m.toInt))
    val raw = (BigInt(709343) * 64 * 64 * (BigInt(1) << 62) / sSum /
      1000000).toLong
    assert(StreamHll.estimate(dense) == raw)
  }

  test("stream: shuffled multi-batch arrivals end at the batch entry's " +
      "(reg_check, est) per source") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .where($"text".isNotNull)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
      .map { case (s, id, t) => DocArrival(s, id, t) }
    val shuffled = new scala.util.Random(7L).shuffle(docs.toSeq)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq

    val source = MemoryStream[DocArrival]
    val q = StreamHll.hllStream(source.toDS())
      .writeStream.format("memory").queryName("hll_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // registers only grow, so regCheck is monotone across batches —
      // the max row is the final state (ties are identical states)
      val streamed = spark.table("hll_state").as[HllEstimate].collect()
        .groupBy(_.source).map { case (s, vs) => s -> vs.maxBy(_.regCheck) }
      // batch truth: the catalog entry itself (reg_check, est columns)
      val batch = SketchQueries.distinctHllPortable
        .query(spark, sfDir)
        .select($"source", $"reg_check", $"est")
        .as[(String, Long, Long)].collect()
        .map { case (s, rc, e) => s -> ((rc, e)) }.toMap
      assert(batch.nonEmpty)
      batch.foreach { case (src, (rc, e)) =>
        val st = streamed(src)
        assert(st.regCheck == rc, s"$src regCheck ${st.regCheck} != $rc")
        assert(st.est == e, s"$src est ${st.est} != $e")
      }
    } finally q.stop()
  }
}
