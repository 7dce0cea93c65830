package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.queries.SketchQueries

/** Incremental lattice quantiles: the stream face's cell/decode/rank
  * arithmetic is the batch entry's column arithmetic bit-for-bit, and
  * the final stream state reproduces the batch `sketch_quantiles`
  * output per group over shuffled multi-batch arrivals. */
class StreamQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("cell/decode match the batch column arithmetic; decode is the " +
      "lattice lower bound within 2^-4 relative") {
    val vs = Seq(1L, 15L, 16L, 17L, 31L, 32L, 100L, 12345L, 999999L,
      (1L << 40) + 12345L)
    val expected = vs.toDF("v")
      .withColumn("idx", when($"v" < 16, $"v")
        .otherwise(lit(16L) * (length(bin($"v")) - 1).cast("long") +
          expr("shiftright(v, cast(length(bin(v)) - 5 as int)) % 16")))
      .withColumn("dec", expr("CASE WHEN idx < 16 THEN idx ELSE " +
        "shiftleft(16 + idx % 16, cast(idx div 16 - 4 as int)) END"))
      .as[(Long, Long, Long)].collect()
    expected.foreach { case (v, idx, dec) =>
      assert(StreamQuantiles.cell(v) == idx, s"cell($v)")
      assert(StreamQuantiles.decode(idx) == dec, s"decode($idx)")
      // lower bound: dec <= v, and relative gap < 2^-4
      assert(dec <= v && (v - dec).toDouble / v < 1.0 / 16, s"bound($v)")
    }
    // monotone: v1 <= v2 -> cell(v1) <= cell(v2) (rank safety)
    val sorted = vs.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(StreamQuantiles.cell(a) <= StreamQuantiles.cell(b))
    }
  }

  test("quantile: ceil-rank scan over the lattice (tiny hand case)") {
    // values 1,2,3,4 (cells are exact below 16): q50 rank ceil(2)=2 ->
    // value 2; q99 rank ceil(3.96)=4 -> value 4
    val cells = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    assert(StreamQuantiles.quantile(cells, 4, 1, 2) == 2L)
    assert(StreamQuantiles.quantile(cells, 4, 9, 10) == 4L)
    assert(StreamQuantiles.quantile(cells, 4, 99, 100) == 4L)
  }

  test("stream: shuffled multi-batch arrivals end at the batch entry's " +
      "(n, state_cells, state_check, q50/q90/q99_est) per group") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.orders(spark, sfDir)
      .select($"o_orderstatus",
        round($"o_totalprice" * 100).cast("long").as("v"))
      .as[(String, Long)].collect()
      .map { case (st, v) => PriceArrival(st, v) }
    val shuffled = new scala.util.Random(13L).shuffle(rows.toSeq)
    val batches = shuffled.grouped(math.max(1, shuffled.size / 4)).toSeq

    val source = MemoryStream[PriceArrival]
    val q = StreamQuantiles.quantileStream(source.toDS())
      .writeStream.format("memory").queryName("quant_state")
      .outputMode("update").start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      // n is monotone per group — the max row is the final state
      val streamed = spark.table("quant_state").as[QuantEstimate].collect()
        .groupBy(_.status).map { case (s, vs) => s -> vs.maxBy(_.n) }
      val batch = SketchQueries.sketchQuantiles.query(spark, sfDir)
        .select($"o_orderstatus", $"n", $"state_cells", $"state_check",
          $"q50_est", $"q90_est", $"q99_est")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      assert(batch.nonEmpty)
      batch.foreach { case (st, n, cells, check, q50, q90, q99) =>
        val got = streamed(st)
        assert(got.n == n, s"$st n")
        assert(got.stateCells == cells, s"$st cells")
        assert(got.stateCheck == check, s"$st check")
        assert(got.q50Est == q50, s"$st q50")
        assert(got.q90Est == q90, s"$st q90")
        assert(got.q99Est == q99, s"$st q99")
      }
    } finally q.stop()
  }
}
