package graft.queries

import graft.SparkTestBase

/** `stats_spearman_rank` semantics on planted fixtures the sf corpus's
  * near-zero association can't pin: a perfect monotone (even
  * NONLINEAR) relation reads exactly +1e6 ppm, a perfect reversal
  * exactly −1e6, a single outlier barely moves rho (the rank-immunity
  * Pearson lacks), ties break by the value lexicon, and byte-identical
  * duplicate rows pair ALIGNED (well-defined d², no row-identity
  * ambiguity). */
class SpearmanSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Double, Option[Long])] =
    AggQueries.spearmanByGroup(rows.toDF("g", "x", "y"))
      .as[(String, Long, Double, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def rho(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    run(rows).map { case (g, (_, _, r)) => g -> r.getOrElse(Long.MinValue) }

  test("perfect monotone (nonlinear y = x^2) -> exactly 1e6 ppm; " +
      "perfect reversal -> exactly -1e6 ppm") {
    val mono = (1L to 50L).map(i => ("up", i, i * i))
    val anti = (1L to 50L).map(i => ("dn", i, -i))
    val got = rho(mono ++ anti)
    assert(got("up") == 1000000L, s"got $got")
    assert(got("dn") == -1000000L, s"got $got")
  }

  test("rank immunity: one extreme outlier in a monotone series leaves " +
      "rho at 1e6 (same ranks), where Pearson would collapse") {
    val rows = (1L to 49L).map(i => ("g", i, i * 10)) :+
      (("g", 50L, 1000000000L))
    assert(rho(rows)("g") == 1000000L)
  }

  test("degenerate n = 1 group emits NULL rho, not a division by zero") {
    val got = AggQueries.spearmanByGroup(
      Seq(("solo", 5L, 7L)).toDF("g", "x", "y"))
      .as[(String, Long, Double, Option[Long])].collect()
    assert(got.head._4.isEmpty)
  }

  test("matches the closed form on a hand case: swap two neighbors " +
      "-> rho = 1 - 12/(n^3 - n)") {
    // y order = x order with elements 2 and 3 swapped: sum_d2 = 2
    val rows = Seq[(String, Long, Long)](
      ("h", 1L, 10L), ("h", 2L, 30L), ("h", 3L, 20L), ("h", 4L, 40L))
    val n = 4L
    val expected = 1000000L - (6000000L * 2) / (n * n * n - n)
    assert(rho(rows)("h") == expected)
  }

  test("byte-identical duplicate rows pair aligned: d is " +
      "block-constant, sum_d2 well-defined whatever the row order") {
    // two identical (5, 50) rows inside a monotone series: aligned
    // pairing keeps every d = 0 -> rho exactly 1e6. A crossed pairing
    // would read sum_d2 = 2; the value-determined ranks forbid it.
    val rows = Seq[(String, Long, Long)](
      ("g", 1L, 10L), ("g", 5L, 50L), ("g", 5L, 50L), ("g", 9L, 90L))
    val got = run(rows)("g")
    assert(got._2 == 0.0, s"sum_d2 must be 0, got $got")
    assert(got._3.contains(1000000L))
    // and x-ties with DIFFERENT y break by y on both sides: still a
    // permutation, sum_d2 stable
    val ties = Seq[(String, Long, Long)](
      ("t", 1L, 10L), ("t", 5L, 70L), ("t", 5L, 30L), ("t", 9L, 90L))
    val t = run(ties)("t")
    assert(t._1 == 4L && t._2 == 0.0,
      s"x-tie broken by y aligns with the y-order here: $t")
  }
}
