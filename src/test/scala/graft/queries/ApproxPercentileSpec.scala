package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Percentile sketch vs exact: the rows-only catalog entry
  * `agg_approx_percentiles` has no SQL oracle (sketch internals are
  * engine-specific), so the error bound is pinned here — at accuracy
  * 10000 the returned value's rank must sit within 1/10000 of the
  * requested percentile's rank (the documented guarantee). */
class ApproxPercentileSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_percentile rank error within 1/accuracy of exact") {
    val rnd = new scala.util.Random(7)
    val n = 50000
    val vals = Seq.fill(n)(rnd.nextDouble() * 1000)
    val df = vals.toDF("v")
    val sorted = vals.sorted.toIndexedSeq
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val approx = df.select(percentile_approx($"v", lit(p), lit(10000)))
        .collect().head.getDouble(0)
      // rank of the sketch's answer in the true sorted order
      val rank = sorted.count(_ <= approx).toDouble / n
      assert(math.abs(rank - p) <= 1.0 / 10000 + 1.0 / n,
        s"p=$p approx=$approx rank=$rank")
    }
  }

  test("agg_approx_percentiles tracks the exact per-group percentiles on testdata") {
    val exact = ReshapeQueries.aggPercentiles
      .query(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = ReshapeQueries.aggApproxPercentiles
      .query(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    for ((k, (m, p90)) <- exact) {
      // exact interpolates between order stats, the sketch returns one —
      // at sf0.01 group sizes the two must agree within 1%
      assert(math.abs(approx(k)._1 - m) / m < 0.01, s"$k median")
      assert(math.abs(approx(k)._2 - p90) / p90 < 0.01, s"$k p90")
    }
  }
}
