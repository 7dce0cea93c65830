package graft.queries

import graft.SparkTestBase

/** `sketch_quantiles` invariants the oracle's value-compare can't
  * articulate: the lattice decode is a LOWER bound of the exact
  * rank-quantile, the realized relative error stays inside the 2⁻⁴
  * design bound (err_ppm ≤ 62500), and the state is genuinely
  * constant-size (≤ 16·64 cells per group). */
class SketchQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("est <= exact, err_ppm within the 2^-4 lattice bound, state " +
      "bounded, every group present") {
    val rows = SketchQueries.sketchQuantiles.query(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (st, n, cells, _, q50e, q50x, e50, q90e, q90x, e90,
        q99e, q99x, e99) = (r._1, r._2, r._3, r._4, r._5, r._6, r._7,
        r._8, r._9, r._10, r._11, r._12, r._13)
      assert(n > 0 && cells > 0 && cells <= 16 * 64, s"$st state size")
      Seq((q50e, q50x, e50), (q90e, q90x, e90), (q99e, q99x, e99))
        .foreach { case (est, exact, ppm) =>
          assert(est <= exact, s"$st: lattice decode is a lower bound")
          assert(ppm >= 0 && ppm <= 62500,
            s"$st: err $ppm ppm exceeds the 2^-4 design bound")
          assert(ppm == (1000000L * (exact - est)) / exact, s"$st ppm")
        }
      // quantiles are ordered: q50 <= q90 <= q99 on both arms
      assert(q50x <= q90x && q90x <= q99x, s"$st exact order")
      assert(q50e <= q90e && q90e <= q99e, s"$st est order")
    }
  }

  test("window union: weekly quantiles from SUMMED day states keep the " +
      "lattice bound — merging adds no error term") {
    val rows = SketchQueries.sketchQuantilesWindowUnion.query(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (week, nDays, n, cells) = (r._1, r._2, r._3, r._4)
      assert(nDays >= 1 && n > 0 && cells <= 16 * 64, s"week $week")
      Seq((r._6, r._7, r._8), (r._9, r._10, r._11), (r._12, r._13, r._14))
        .foreach { case (est, exact, ppm) =>
          assert(est <= exact && ppm <= 62500,
            s"week $week: merged-state decode must keep the 2^-4 bound")
        }
    }
  }
}
