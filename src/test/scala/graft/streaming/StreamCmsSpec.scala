package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.queries.SketchQueries

/** Incremental CMS bigram census: the stream face's frozen-salt cell
  * hash is the batch entry's md5 column arithmetic bit-for-bit, the
  * per-source states merge by element-wise sum to the batch GLOBAL
  * cells over shuffled multi-batch arrivals, and the min-over-salt
  * point estimates decoded from the streamed cells equal the batch
  * `sketch_cms_bigram` entry's top-20 `est` column. */
class StreamCmsSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("cellOf matches the batch entry's md5 column arithmetic") {
    val grams = Seq("alpha beta", "beta gamma", "x y", "one two")
    val expected = grams.flatMap(g => (0 until 4).map(s => (g, s)))
      .toDF("g", "s")
      .withColumn("b",
        conv(substring(md5(concat($"s".cast("string"), lit(":"), $"g")),
          1, 15), 16, 10).cast("long") % 256)
      .as[(String, Int, Long)].collect()
    expected.foreach { case (g, s, b) =>
      assert(StreamCms.cellOf(s, g) == b.toInt, s"($s, $g)")
    }
  }

  test("addDoc: fewer than 2 tokens folds nothing; counts are per " +
      "OCCURRENCE (repeated bigrams count every time)") {
    val none = new Array[Long](4 * 256)
    assert(StreamCms.addDoc(none, "solo") == 0L)
    assert(StreamCms.addDoc(none, "") == 0L)
    assert(none.forall(_ == 0L))
    val cells = new Array[Long](4 * 256)
    assert(StreamCms.addDoc(cells, "a b a b") == 3L) // "a b","b a","a b"
    assert(cells.sum == 3L * 4)
    // "a b" folded twice: its min-over-salt estimate reads >= 2
    assert(StreamCms.estimate(cells, "a b") >= 2L)
  }

  test("stream: shuffled multi-batch arrivals sum to the batch global " +
      "cells; decoded top-20 estimates equal the batch entry's est") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .where($"text".isNotNull)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
      .map { case (s, id, t) => DocArrival(s, id, t) }
    val shuffled = new scala.util.Random(11L).shuffle(docs.toSeq)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq

    val source = MemoryStream[DocArrival]
    val q = StreamCms.cmsStream(source.toDS())
      .writeStream.format("memory").queryName("cms_state")
      .outputMode("update").start()
    val global = new Array[Long](4 * 256)
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // counts only grow, so n is monotone per source — the max row is
      // the final state
      val finals = spark.table("cms_state").as[CmsEstimate].collect()
        .groupBy(_.source).map { case (_, vs) => vs.maxBy(_.n) }
      finals.foreach(e =>
        e.cells.zipWithIndex.foreach { case (v, i) => global(i) += v })
    } finally q.stop()

    // batch global cells via the entry's exact column formulation
    val cen = Tables.documents(spark, sfDir).where($"text".isNotNull)
      .select(graft.ext.TextOps.tokens($"text").as("toks"))
      .where(size($"toks") >= 2)
      .select(explode(transform(sequence(lit(1), size($"toks") - 1),
        i => array_join(slice($"toks", i, lit(2)), " "))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val cells = cen
      .select($"w", $"c", explode(sequence(lit(0), lit(3))).as("salt"))
      .withColumn("b",
        conv(substring(md5(concat($"salt".cast("string"), lit(":"), $"w")),
          1, 15), 16, 10).cast("long") % 256)
      .groupBy($"salt", $"b").agg(sum($"c").as("cell"))
      .as[(Int, Long, Long)].collect()
    val expected = new Array[Long](4 * 256)
    cells.foreach { case (s, b, c) => expected(s * 256 + b.toInt) = c }
    assert(expected.sum > 0)
    assert(global.toSeq == expected.toSeq,
      "streamed per-source states must SUM to the batch global cells")

    // the batch entry's top-20 estimates decode from the streamed cells
    val entryEst = SketchQueries.sketchCmsBigram.query(spark, sfDir)
      .select($"gram", $"est").as[(String, Long)].collect()
    assert(entryEst.nonEmpty)
    entryEst.foreach { case (g, e) =>
      assert(StreamCms.estimate(global, g) == e, s"gram $g")
    }
  }
}
