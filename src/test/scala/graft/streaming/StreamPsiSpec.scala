package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.queries.EventQueries

/** Streaming PSI monitor parity: with the reference frozen from the
  * batch entry's first half (bins over the corpus-wide range) and the
  * second half streamed in shuffled micro-batches, the final stream
  * PSI equals `events_psi_drift`'s psi_nano bit for bit. */
class StreamPsiSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def rows: Seq[(String, Long, Long)] =
    Tables.events(spark, sfDir)
      .select($"event_type", unix_micros($"ts"),
        round($"value" * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq

  /** (refs, secondHalf) replicated from the batch entry's definitions:
    * time-midpoint split, 10 bins over each series' full range. */
  private def split: (Map[String, PsiRef], Seq[ValueArrival]) = {
    val byType = rows.groupBy(_._1)
    val refs = byType.map { case (t, rs) =>
      val t0 = rs.map(_._2).min; val t1 = rs.map(_._2).max
      val mn = rs.map(_._3).min; val mx = rs.map(_._3).max
      val ref = PsiRef(new Array[Long](StreamPsi.Bins), mn, mx)
      rs.filter(r => 2 * r._2 <= t0 + t1)
        .foreach(r => ref.counts(StreamPsi.bin(ref, r._3)) += 1L)
      t -> ref
    }
    val second = byType.toSeq.flatMap { case (t, rs) =>
      val t0 = rs.map(_._2).min; val t1 = rs.map(_._2).max
      rs.filter(r => 2 * r._2 > t0 + t1).map(r => ValueArrival(t, r._3))
    }
    (refs, second)
  }

  test("psiNano is additive-state invariant: folding in any batch " +
      "split gives the same final PSI (counts are plain sums)") {
    val (refs, second) = split
    val t = second.head.series
    val mine = second.filter(_.series == t)
    val ref = refs(t)
    def fold(xs: Seq[ValueArrival]): Array[Long] = {
      val c = new Array[Long](StreamPsi.Bins)
      xs.foreach(v => c(StreamPsi.bin(ref, v.cents)) += 1L)
      c
    }
    val whole = StreamPsi.psiNano(ref.counts, fold(mine))
    for (cut <- Seq(1, mine.size / 3, mine.size - 1)) {
      val (a, b) = mine.splitAt(cut)
      val c = fold(a)
      fold(b).zipWithIndex.foreach { case (v, i) => c(i) += v }
      assert(StreamPsi.psiNano(ref.counts, c) == whole, s"cut=$cut")
    }
  }

  test("stream over shuffled second-half arrivals ends at the batch " +
      "entry's psi_nano per series") {
    implicit val sqlCtx = spark.sqlContext
    val (refs, second) = split
    val shuffled = new scala.util.Random(17L).shuffle(second)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq

    val source = MemoryStream[ValueArrival]
    val q = StreamPsi.psiStream(source.toDS(), refs)
      .writeStream.format("memory").queryName("psi_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("psi_state").as[PsiEstimate].collect()
        .groupBy(_.series).map { case (s, vs) => s -> vs.maxBy(_.nCur) }
      val batch = EventQueries.eventsPsiDrift.query(spark, sfDir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(batch.nonEmpty)
      batch.foreach { case (series, (n1, n2, psi)) =>
        val st = streamed(series)
        assert(st.nRef == n1, s"$series ref count ${st.nRef} != $n1")
        assert(st.nCur == n2, s"$series cur count ${st.nCur} != $n2")
        assert(st.psiNano == psi, s"$series psi ${st.psiNano} != $psi")
      }
    } finally q.stop()
  }
}
