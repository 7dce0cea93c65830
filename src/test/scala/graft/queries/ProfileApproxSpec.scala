package graft.queries

import graft.SparkTestBase

/** The HLL column profile tracks the exact profile within sketch error
  * on real testdata. */
class ProfileApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("approx profile matches exact counts and bounds distinct error") {
    val d = "/root/testdata/sf0.001"
    val exact = TransformQueries.profileColumns.query(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = TransformQueries.profileColumnsApprox.query(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, (n, nn, dApprox)) =>
      val (en, enn, ed) = exact(c)
      assert(n == en && nn == enn, s"$c row/nonnull counts must be exact")
      // default rsd 5% → allow 3x margin
      assert(math.abs(dApprox - ed) <= math.max(1L, (ed * 0.15).toLong),
        s"$c: approx $dApprox vs exact $ed")
    }
  }
}
