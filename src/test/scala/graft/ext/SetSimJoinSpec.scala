package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** SetSimJoin.selfJoin vs the quadratic Jaccard definition — prefix
  * filtering must be LOSSLESS (the theorem's whole claim) and the
  * integer verify must implement ≥ exactly, boundary included. */
class SetSimJoinSpec extends SparkTestBase {

  private def join(sets: Seq[(Long, Seq[String])], tNum: Int,
      tDen: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val df = sets.toDF("id", "arr")
      .selectExpr("id", "array_distinct(arr) AS arr")
    SetSimJoin.selfJoin(df, "id", "arr", tNum, tDen)
      .select("id_a", "id_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def brute(sets: Seq[(Long, Seq[String])], tNum: Int,
      tDen: Int): Set[(Long, Long, Long)] = {
    val m = sets.map { case (id, s) => id -> s.distinct.toSet }
    (for {
      (a, sa) <- m; (b, sb) <- m if a < b
      ov = (sa & sb).size.toLong
      if (tDen + tNum).toLong * ov >= tNum.toLong * (sa.size + sb.size)
    } yield (a, b, ov)).toSet
  }

  test("hand cases: identical sets, boundary jaccard, disjoint sets") {
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "d"),      // J=1 with 1
      3L -> Seq("a", "b", "c", "x"),      // J(1,3)=3/5 — EXACT boundary
      4L -> Seq("p", "q", "r", "s"))      // disjoint
    val got = join(sets, 3, 5)
    assert(got == brute(sets, 3, 5))
    assert(got.contains((1L, 2L, 4L)))
    assert(got.contains((1L, 3L, 3L))) // >= semantics keeps the boundary
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("forAll: prefix-filtered join equals quadratic Jaccard at several " +
      "thresholds (small element domain forces heavy overlap)") {
    val genSets: Gen[List[(Long, List[String])]] =
      Gen.choose(2, 8).flatMap { n =>
        Gen.sequence[List[(Long, List[String])], (Long, List[String])](
          (0 until n).map { i =>
            Gen.choose(1, 6).flatMap(k =>
              Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
                .map(els => (i.toLong, els)))
          })
      }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(10)
      .withInitialSeed(Seed(86420135L))
    val res = SCTest.check(params, Prop.forAll(genSets) { sets =>
      join(sets, 3, 5) == brute(sets, 3, 5) &&
        join(sets, 4, 5) == brute(sets, 4, 5) &&
        join(sets, 1, 1) == brute(sets, 1, 1)
    })
    assert(res.passed, s"setsim law: ${res.status}")
  }
}
