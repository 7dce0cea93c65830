package graft.queries

import graft.SparkTestBase

/** `stats_spearman_lattice` midrank algebra on planted fixtures:
  * sub-16 values occupy EXACT lattice cells, so the lattice rho must
  * equal the exact rho identically there; identical tie structure on
  * both sides reads exactly ±1e6; a group collapsed into one cell
  * (zero variance) emits NULL rather than dividing by zero. */
class LatticeSpearmanSpec extends SparkTestBase {
  import spark.implicits._

  private def lattice(rows: Seq[(String, Long, Long)])
      : Map[String, Option[Long]] =
    AggQueries.spearmanLatticeByGroup(rows.toDF("g", "x", "y"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap

  private def exact(rows: Seq[(String, Long, Long)])
      : Map[String, Option[Long]] =
    AggQueries.spearmanByGroup(rows.toDF("g", "x", "y"))
      .as[(String, Long, Double, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap

  test("sub-16 values sit in exact cells: on a tie-free permutation " +
      "the lattice rho matches the exact rho to the 1-ppm " +
      "truncation-vs-rounding quantum") {
    // tie-free: midranks == classic ranks, so the two arms compute
    // the same rational rho; the exact arm TRUNCATES its ppm integer
    // division while the lattice arm ROUNDS the IEEE ratio — at most
    // 1 ppm apart, never more
    val perm = Seq(3L, 11L, 7L, 1L, 15L, 9L, 2L, 8L, 14L, 5L, 12L,
      4L, 10L, 6L, 13L)
    val rows = perm.zipWithIndex.map { case (y, i) =>
      ("p", i.toLong + 1L, y) }
    val l = lattice(rows)("p").get
    val e = exact(rows)("p").get
    assert(math.abs(l - e) <= 1L, s"lattice $l vs exact $e")
  }

  test("identical tie structure on both sides reads exactly +1e6; " +
      "sub-16 reversal reads exactly -1e6 (== exact)") {
    // y = x across cell regimes: same cells, same counts -> midranks
    // identical -> Pearson exactly 1
    val mono = Seq(5L, 5L, 120L, 1300L, 1300L, 48000L, 700000L)
      .map(v => ("up", v, v))
    val anti = (1L to 15L).map(i => ("dn", i, 16L - i))
    val got = lattice(mono ++ anti)
    assert(got("up").contains(1000000L), s"got $got")
    assert(got("dn").contains(-1000000L), s"got $got")
    assert(exact(anti)("dn").contains(-1000000L))
  }

  test("zero variance (one cell) and n = 1 emit NULL, not a division " +
      "by zero") {
    val oneCell = Seq.fill(5)(("c", 100L, 7L)) // all x in one cell
    assert(lattice(oneCell)("c").isEmpty)
    assert(lattice(Seq(("solo", 5L, 7L)))("solo").isEmpty)
  }
}
