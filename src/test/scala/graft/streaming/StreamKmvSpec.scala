package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** Streaming KMV: merge laws (idempotent, split-anywhere), estimator
  * regimes (exact below k, (k−1)·2⁶⁰/θ at k), and stream-vs-batch
  * equality of the final sketch per source over shuffled multi-batch
  * arrivals — the batch side being the `distinct_kmv_setops` sketch
  * reconstruction (per-doc kernel → union → k smallest). */
class StreamKmvSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 64

  test("merge: union-retake-k is idempotent and order-insensitive; " +
      "estimator is exact below k and (k-1)*2^60/theta at k") {
    val a = Seq(5L, 9L, 40L)
    val b = Array(1L, 9L, 77L)
    val m = StreamKmv.merge(a, b, 4)
    assert(m == Seq(1L, 5L, 9L, 40L)) // ascending, dedup, capped at k
    assert(StreamKmv.merge(m, b, 4) == m) // replayed batch: no change
    assert(StreamKmv.estimate(Seq(1L, 5L, 9L), 4) == 3L) // exact regime
    val full = Seq(1L, 5L, 9L, 40L)
    assert(StreamKmv.estimate(full, 4) ==
      (BigInt(3) * (1L << 60) / 40L).toLong)
  }

  test("stream: shuffled multi-batch arrivals end at the batch sketch " +
      "(k smallest distinct gram hashes) per source") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .where($"text".isNotNull)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
      .map { case (s, id, t) => DocArrival(s, id, t) }.toSeq
    val shuffled = new scala.util.Random(11L).shuffle(docs)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq

    val source = MemoryStream[DocArrival]
    val q = StreamKmv.kmvStream(source.toDS(), K)
      .writeStream.format("memory").queryName("kmv_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // sketch only grows; nHashes is monotone and theta monotone
      // non-increasing once full — the max-nHashes row is final (ties
      // are identical sketches, so compare on (nHashes, -theta))
      val streamed = spark.table("kmv_state").as[KmvEstimate].collect()
        .groupBy(_.source)
        .map { case (s, vs) => s -> vs.maxBy(v => (v.nHashes, -v.theta)) }
      // batch truth: per-doc kernel -> union -> k smallest (the
      // distinct_kmv_setops sketch reconstruction)
      val batch = docs.groupBy(_.source).map { case (s, sdocs) =>
        val all = sdocs.flatMap(d => StreamKmv.docHashes(d.text, K))
          .distinct.sorted.take(K)
        s -> all
      }
      batch.foreach { case (src, sk) =>
        val st = streamed(src)
        assert(st.nHashes == sk.size, s"$src size ${st.nHashes} != ${sk.size}")
        assert(st.theta == sk.last, s"$src theta diverges")
        assert(st.est == StreamKmv.estimate(sk, K), s"$src est diverges")
      }
    } finally q.stop()
  }
}
