package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** `dedup_strip_spans` semantics on PLANTED fixtures: keep-first-
  * occurrence across documents (the canonical copy survives intact,
  * later copies lose the span), intra-doc self-repeats, coverage
  * merging of removed windows with gap ≤ L, short-doc passthrough —
  * all checked against a brute-force plain-Scala reference of the
  * definition (window content occurs ≥ 2 times ∧ occurrence is not
  * the (min doc_id, min pos) one → its L chars are removed). */
class StripCrossDocSpec extends SparkTestBase {
  import spark.implicits._

  private val L = 10 // small threshold so fixtures stay readable

  private def strip(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, String)] =
    TextQueries.stripCrossDocSpans(docs.toDF("doc_id", "text"), L)
      .as[(Long, Long, Long, Long, String)].collect().toSeq

  /** Brute-force reference of the entry's exact definition. */
  private def reference(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, String)] = {
    case class Occ(doc: Long, pos: Int) // pos 1-based
    val occs = docs.flatMap { case (id, t) =>
      (1 to t.length - L + 1).map(p =>
        t.substring(p - 1, p - 1 + L) -> Occ(id, p))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val removed: Map[Long, Seq[Int]] = occs.valuesIterator
      .filter(_.size >= 2)
      .flatMap { os =>
        val first = os.minBy(o => o.doc * 100000000L + o.pos)
        os.filterNot(o => o.doc == first.doc && o.pos == first.pos)
      }.toSeq.groupBy(_.doc).view
      .mapValues(_.map(_.pos).sorted).toMap
    docs.filter(_._2.nonEmpty).map { case (id, t) =>
      val ps = removed.getOrElse(id, Seq.empty)
      // merge same-length windows: break when gap > L
      val groups = ps.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head.head + L =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      val runs = groups.map(g => (g.head, g.last + L - 1))
      val cov = runs.flatMap { case (s, e) => s to e }.toSet
      val clean = (1 to t.length).filterNot(cov)
        .map(i => t.charAt(i - 1)).mkString
      (id, t.length.toLong, runs.size.toLong, cov.size.toLong, clean)
    }.sortBy(_._1)
  }

  test("cross-doc copy: the canonical (min doc_id, min pos) copy " +
      "survives intact, the later copy loses exactly the span") {
    val span = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars >= L
    val docs = Seq(
      1L -> ("HEAD-" + span + "-TAIL-one"),
      2L -> ("zz " + span + " other stuff here"))
    val got = strip(docs)
    assert(got == reference(docs), s"got $got")
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1 canonical: nothing removed
    assert(byId(1L)._4 == 0L && byId(1L)._5 == docs.head._2)
    // doc 2: the 30 shared chars are gone, the rest survives
    assert(byId(2L)._3 == 1L && byId(2L)._4 == 30L)
    assert(byId(2L)._5 == "zz  other stuff here")
  }

  test("intra-doc self-repeat: first occurrence kept, second removed") {
    // the two copies get DIFFERENT following chars ("-" vs "=") so no
    // straddling window duplicates — removal is exactly the span
    val span = "0123456789ABCDEFGHIJ" // 20 chars
    val docs = Seq(3L -> (span + "-middle-" + span + "=end"))
    val got = strip(docs)
    assert(got == reference(docs), s"got $got")
    val r = got.head
    assert(r._4 == 20L, s"second copy's 20 chars removed: $r")
    assert(r._5 == span + "-middle-" + "=end")
  }

  test("short docs (< L) and unique docs pass through whole; empty " +
      "text is excluded") {
    val docs = Seq(
      1L -> "tiny", 2L -> "another unique doc body x", 3L -> "")
    val got = strip(docs)
    assert(got == reference(docs), s"got $got")
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.forall(r => r._4 == 0L && r._3 == 0L))
    assert(got.map(_._5) == Seq("tiny", "another unique doc body x"))
  }

  test("overlapping removed-window coverage merges into ONE interval " +
      "instead of double-counting the overlap") {
    // doc 11 opens with the 16-char region ABCDEFGHIJKLMNOP; doc 10
    // (canonical) contains its 10-char prefix S1 and its 10-char
    // suffix S2 at DISJOINT offsets. In doc 11 the two removed
    // windows sit at pos 1 and pos 7 — coverage [1,10] and [7,16]
    // overlap, so they must merge to one 16-char interval.
    val s1 = "ABCDEFGHIJ"
    val s2 = "GHIJKLMNOP"
    val docs = Seq(
      10L -> (s1 + "-filler-xyz-" + s2),
      11L -> ("ABCDEFGHIJKLMNOP" + "-tail"))
    val got = strip(docs)
    assert(got == reference(docs), s"got $got")
    val r = got.find(_._1 == 11L).get
    assert(r._3 == 1L, s"one merged run: $r")
    assert(r._4 == 16L, s"16 chars covered once, not 20: $r")
    assert(r._5 == "-tail")
  }

  test("ScalaCheck: random small-alphabet corpora match the brute-force " +
      "reference") {
    val genDoc = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val genCorpus = Gen.chooseNum(1, 5).flatMap(k =>
      Gen.listOfN(k, genDoc).map(_.zipWithIndex
        .map { case (t, i) => (i + 1).toLong -> t }))
    val prop = Prop.forAll(genCorpus) { docs =>
      strip(docs) == reference(docs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12)
        .withInitialSeed(Seed(19L)), prop)
    assert(res.passed, res.status.toString)
  }
}
