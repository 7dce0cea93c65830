package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.ext.HeavyHitters

/** Streaming Misra-Gries: split-anywhere determinism (any micro-batch
  * partition of the same docId-ordered arrival stream ends at the one
  * sequential fold's counters) and the MG guarantee (counters
  * undercount by ≤ n/k; every item with true frequency > n/k is
  * tracked) against exact counts. */
class StreamHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  /** The single sequential fold the stream must equal (docId order —
    * the stream sorts each batch, and batches are cut in docId order
    * below, so the concatenation is the full docId-ordered fold). */
  private def referenceFold(docs: Seq[DocArrival]): (Long, Map[String, Long]) =
    docs.sortBy(_.docId).foldLeft((0L, Map.empty[String, Long])) {
      case ((n, m), doc) =>
        StreamHeavyHitters.tokensOf(doc.text)
          .foldLeft((n, m)) { case ((n1, m1), t) =>
            (n1 + 1L, HeavyHitters.reduceStep(m1, t, K))
          }
    }

  test("reduceStep: MG guarantee on a crafted skewed stream — counter " +
      "undercounts by <= n/k and the majority item is tracked") {
    val stream = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")
    val shuffled = new scala.util.Random(3L).shuffle(stream)
    val m = shuffled.foldLeft(Map.empty[String, Long])(
      (acc, t) => HeavyHitters.reduceStep(acc, t, K))
    val n = stream.size.toLong
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    m.foreach { case (t, w) =>
      assert(w <= exact(t), s"$t overcounts: $w > ${exact(t)}")
      assert(exact(t) - w <= n / K, s"$t undercount beyond n/k")
    }
    assert(m.contains("hot"), "frequency > n/k must be tracked")
  }

  test("stream: docId-ordered micro-batches end at the sequential " +
      "fold's exact counters, and the n/k guarantee holds vs true " +
      "per-source counts") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .where($"text".isNotNull)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
      .map { case (s, id, t) => DocArrival(s, id, t) }.toSeq
    // batches cut in docId order so batch concatenation == the
    // reference fold's order (MG is order-sensitive by design)
    val ordered = docs.sortBy(_.docId)
    val batches = ordered.grouped(math.max(1, ordered.size / 4)).toSeq

    val source = MemoryStream[DocArrival]
    val q = StreamHeavyHitters.hhStream(source.toDS(), K)
      .writeStream.format("memory").queryName("hh_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("hh_state").as[HhUpdate].collect()
        .groupBy(_.source).map { case (s, vs) => s -> vs.maxBy(_.nTokens) }
      val bySource = docs.groupBy(_.source)
      bySource.foreach { case (src, sdocs) =>
        val (nRef, mRef) = referenceFold(sdocs)
        val st = streamed(src)
        assert(st.nTokens == nRef, s"$src n ${st.nTokens} != $nRef")
        assert(st.items.zip(st.weights).toMap == mRef,
          s"$src counters diverge from the sequential fold")
        // the guarantee vs exact counts
        val exact = sdocs.flatMap(d => StreamHeavyHitters.tokensOf(d.text))
          .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        st.items.zip(st.weights).foreach { case (t, w) =>
          assert(w <= exact(t))
          assert(exact(t) - w <= nRef / K)
        }
        exact.filter(_._2 > nRef / K).keys.foreach { hot =>
          assert(st.items.contains(hot), s"$src: $hot above n/k untracked")
        }
      }
    } finally q.stop()
  }
}
