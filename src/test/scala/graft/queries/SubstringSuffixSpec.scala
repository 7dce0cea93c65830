package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** `dedup_substring_suffix` semantics on PLANTED fixtures the sf corpus
  * can't pin: embedded duplicates at arbitrary offsets (the alignment
  * case the strided window census misses), exact run boundaries,
  * within-doc self-repeats, and sub-threshold near-misses — checked
  * against a brute-force plain-Scala reference (every position whose
  * L-window occurs ≥ 2 times in the corpus, islands-merged). */
class SubstringSuffixSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 10 // small threshold so fixtures stay readable

  private def runs(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
    TextQueries.substringSuffixRuns(docs.toDF("doc_id", "text"), L)
      .as[(Long, Long, Long, Long)].collect().toSeq

  /** Brute-force reference: multiset of all L-windows; a position is
    * duplicated iff its window occurs ≥ 2 times anywhere (same doc
    * included); consecutive duplicated positions merge into one
    * maximal run. */
  private def reference(
      docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val counts = docs.flatMap { case (_, t) =>
      (0 to t.length - L).map(i => t.substring(i, i + L))
    }.groupBy(identity).map { case (w, o) => w -> o.size }
    docs.flatMap { case (id, t) =>
      val dupPos = (0 to t.length - L)
        .filter(i => counts(t.substring(i, i + L)) >= 2)
        .map(_ + 1) // 1-based like SQL substring
      // islands merge
      val groups = dupPos.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      groups.map(g =>
        (id, g.head.toLong, (g.last - g.head + L).toLong, g.size.toLong))
    }.sortBy(r => (r._1, r._2))
  }

  test("embedded duplicate at MISALIGNED offsets is caught at its true " +
      "boundaries (the strided census's alignment caveat)") {
    // the shared 24-char paragraph sits at offset 0 in doc 1 and
    // offset 7 in doc 2 — stride-based windows with stride > 1 can
    // miss this alignment; stride-1 suffix windows cannot
    val shared = "abcdefghijklmnopqrstuvwx" // 24 chars
    val docs = Seq(
      1L -> (shared + "0123456789zzz"),
      2L -> ("PREFIX-" + shared + "-SUFFIX"))
    val got = runs(docs)
    assert(got == reference(docs), s"got $got")
    // doc 1: run starts at pos 1, covers the 24 shared chars
    // (windows 1..15 → run_len 24); doc 2: starts at pos 8
    assert(got.contains((1L, 1L, 24L, 15L)), s"got $got")
    assert(got.contains((2L, 8L, 24L, 15L)), s"got $got")
  }

  test("within-doc self-repeat is duplication (Lee et al. semantics); " +
      "periodic text merges into one maximal run") {
    val docs = Seq(
      1L -> ("abcabcabcabcabcabcabc" + "UNIQUETAIL-0987654321"),
      2L -> "completely unrelated text with no repeats at all here")
    val got = runs(docs)
    assert(got == reference(docs), s"got $got")
    assert(got.count(_._1 == 1L) == 1, "periodic prefix = ONE maximal run")
    assert(!got.exists(_._1 == 2L), "unique doc has no runs")
  }

  test("sub-threshold shared substring (L-1 chars) is NOT flagged") {
    val shared = "123456789" // L-1 = 9 chars; tails repeat-free
    val docs = Seq(
      1L -> (shared + "qwertyuiopasdfghjklz"),
      2L -> (shared + "mnbvcxzlkjhgfdsapoiu"))
    val got = runs(docs)
    assert(got == reference(docs), s"got $got")
    assert(got.isEmpty, s"9-char share must not flag at L=10: $got")
  }

  test("two separate shared paragraphs in one doc emit two maximal runs") {
    val p1 = "AAAAAAAAAAjjjjjjjjjj" // 20 chars
    val p2 = "BBBBBBBBBBkkkkkkkkkk" // 20 chars
    val docs = Seq(
      1L -> (p1 + "-x1y2z3w4v5u6t7s8-" + p2),
      2L -> (p1 + "=different middle==" + p2 + "tail"))
    val got = runs(docs)
    assert(got == reference(docs), s"got $got")
    assert(got.count(_._1 == 1L) == 2, s"two distinct runs in doc 1: $got")
  }

  test("property: operator == brute-force reference on random " +
      "small-alphabet corpora (collision-safe hash prefilter)") {
    val genDoc = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(6, genDoc)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      runs(docs) == reference(docs)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(Seed(181818L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"suffix-run equivalence: ${res.status}")
  }
}
