package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Skyline.frontier vs the O(n²) dominance definition — the prefix-scan
  * formulation must agree with the spec stated directly. */
class SkylineSpec extends SparkTestBase {

  private def frontier(pts: Seq[(Long, Long)],
      bucketWidth: Long = 4L): Set[(Long, Long)] = {
    import spark.implicits._
    val df = pts.zipWithIndex
      .map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("id", "score", "value")
    Skyline.frontier(df, "score", "value", bucketWidth)
      .select("score", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** The definition, verbatim: survive iff nothing dominates you. */
  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (s, v) =>
      !pts.exists { case (s2, v2) =>
        s2 >= s && v2 >= v && (s2 > s || v2 > v)
      }
    }.toSet

  test("hand cases: staircase survives, dominated interior drops, " +
      "duplicates of a frontier point all survive") {
    // staircase (5,1) (3,3) (1,5): mutually incomparable
    val stairs = Seq((5L, 1L), (3L, 3L), (1L, 5L))
    assert(frontier(stairs) == stairs.toSet)
    // (2,2) is dominated by (3,3)
    assert(frontier(stairs :+ (2L, 2L)) == stairs.toSet)
    // duplicate frontier points don't dominate each other
    assert(frontier(Seq((4L, 4L), (4L, 4L))) == Set((4L, 4L)))
    // same score, different value: only the max value survives
    assert(frontier(Seq((4L, 1L), (4L, 9L))) == Set((4L, 9L)))
    // single point
    assert(frontier(Seq((0L, 0L))) == Set((0L, 0L)))
  }

  test("negative scores cross the div-truncation boundary correctly") {
    // bucketWidth 4 with scores straddling 0: truncation (not floor)
    // puts -3..3 in bucket 0 — the monotonicity argument must hold
    val pts = Seq((-5L, 9L), (-1L, 7L), (0L, 5L), (3L, 3L), (7L, 1L))
    assert(frontier(pts) == brute(pts))
  }

  test("forAll: prefix-scan frontier equals the quadratic definition " +
      "(ties, duplicates, negatives, bucket-boundary scores included)") {
    // small domains force same-score and same-value collisions — the
    // interesting inputs for the per-score collapse and strictness
    val genPts: Gen[List[(Long, Long)]] =
      Gen.choose(1, 16).flatMap { n =>
        Gen.listOfN(n, for {
          s <- Gen.choose(-9L, 9L)
          v <- Gen.choose(-4L, 4L)
        } yield (s, v))
      }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(Seed(135792468L))
    val res = SCTest.check(params, Prop.forAll(genPts) { pts =>
      frontier(pts) == brute(pts)
    })
    assert(res.passed, s"skyline law: ${res.status}")
  }
}
