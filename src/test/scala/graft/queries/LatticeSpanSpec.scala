package graft.queries

import graft.SparkTestBase

/** `sketch_quantiles_span` semantics on planted fixtures: ad-hoc day
  * spans answered purely from per-day lattice states, exact decode for
  * sub-16 cent values (lattice cells 0-15 are exact), the documented
  * < 2⁻⁴ under-read for a large value, band mass est vs exact, and a
  * span clipped past the data's edge (partial coverage). */
class LatticeSpanSpec extends SparkTestBase {
  import spark.implicits._

  // days 100-104: values 1..10, five copies each (one per day);
  // days 105-109: value 1000, two copies per day
  private lazy val rows: Seq[(Long, Long)] =
    (for { d <- 100L to 104L; v <- 1L to 10L } yield (d, v)) ++
      (for { d <- 105L to 109L; _ <- 1 to 2 } yield (d, 1000L))

  private lazy val got = SketchQueries.latticeSpanStats(
    rows.toDF("day", "v"),
    spans = Seq((1, 0, 4), (2, 5, 9), (3, 0, 9), (4, 8, 20)),
    bandLo = 4L, bandHi = 10L)
    .collect().map(r => r.getInt(0) -> r).toMap

  test("small-value span decodes exactly: cells 0-15 are exact, so " +
      "q50/q90 est == exact and band est == exact") {
    val r = got(1) // days 100-104: 50 rows of 1..10
    assert(r.getLong(3) == 5L, s"n_days: $r")        // n_days
    assert(r.getLong(4) == 50L)                      // n
    assert(r.getLong(6) == 5L && r.getLong(7) == 5L) // q50 est/exact
    assert(r.getLong(8) == 0L)                       // q50_err_ppm
    assert(r.getLong(9) == 9L && r.getLong(10) == 9L) // q90 est/exact
    // band [4, 10): values 4..9 -> 6 values x 5 days
    assert(r.getLong(14) == 30L && r.getLong(15) == 30L)
    assert(r.getLong(16) == 0L) // band_err_ppm
  }

  test("large-value span under-reads by < 2^-4: v=1000 decodes to " +
      "992 (cell lower bound), err 8000 ppm; empty band reads 0") {
    val r = got(2) // days 105-109: ten rows of 1000
    assert(r.getLong(4) == 10L)
    assert(r.getLong(6) == 992L && r.getLong(7) == 1000L,
      s"decode: $r")
    assert(r.getLong(8) == 8000L) // (1e6*8)//1000
    assert(r.getLong(14) == 0L && r.getLong(15) == 0L) // band empty
  }

  test("whole-corpus span merges day states: quantiles cross the " +
      "value regimes (rank 30 -> 6, rank 54 -> 1000-cell)") {
    val r = got(3)
    assert(r.getLong(3) == 10L && r.getLong(4) == 60L)
    assert(r.getLong(6) == 6L && r.getLong(7) == 6L)     // q50
    assert(r.getLong(9) == 992L && r.getLong(10) == 1000L) // q90
    assert(r.getLong(14) == 30L && r.getLong(15) == 30L) // band
  }

  test("span clipped past the data edge reports partial coverage: " +
      "offsets 8..20 see only days 108-109") {
    val r = got(4)
    assert(r.getLong(1) == 108L && r.getLong(2) == 120L) // day_a/day_b
    assert(r.getLong(3) == 2L, s"n_days: $r")
    assert(r.getLong(4) == 4L)
    assert(r.getLong(6) == 992L && r.getLong(7) == 1000L)
  }
}
