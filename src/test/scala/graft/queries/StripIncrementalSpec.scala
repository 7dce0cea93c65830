package graft.queries

import graft.SparkTestBase

/** `dedup_strip_incremental` semantics on planted cross-batch
  * duplicates (r19 verdict item 6): a new-batch doc sharing a span
  * with the REFERENCE corpus loses every copy of it (the reference
  * copy is canonical); a span duplicated only WITHIN the new batch
  * keeps its struct-min first occurrence; reference docs are never in
  * the output; short new docs pass through untouched. */
class StripIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  // collision-free per-id filler: c_i = (id*31 + 7i) mod 26 — two ids
  // share a 50-char window only if id ≡ id' (mod 26); ids kept distinct
  private def filler(id: Int, n: Int): String =
    (0 until n).map(i => ((id * 31 + i * 7) % 26 + 'a').toChar).mkString

  private val S = filler(99, 60)  // span shared new-vs-REFERENCE
  private val T = filler(104, 55) // span shared within the NEW batch

  // new batch = doc_id % 3 == 0 (ids 3, 6, 9, 12); reference = 1
  private val docs: Seq[(Long, String)] = Seq(
    1L -> (filler(1, 30) + S + filler(101, 30)), // reference, canonical S
    3L -> (filler(3, 40) + S + filler(103, 40)), // new: S must strip
    6L -> (filler(6, 50) + T + filler(106, 30)), // new: first T, keeps
    9L -> (filler(9, 20) + T + filler(109, 25)), // new: second T, strips
    12L -> "tiny")                               // new, < L: untouched

  private lazy val got = TextQueries.stripIncremental(
    docs.toDF("doc_id", "text"), L = 50)
    .as[(Long, Long, Long, Long, String)].collect()

  test("only new-batch docs are emitted, ordered by doc_id") {
    assert(got.map(_._1).toSeq == Seq(3L, 6L, 9L, 12L))
  }

  test("a span present in the reference corpus strips from the new " +
      "doc completely (reference copy is canonical)") {
    val r = got.find(_._1 == 3L).get
    assert(r._3 == 1L, s"n_runs: $r")
    assert(r._4 == 60L, s"n_removed: $r")
    assert(r._5 == filler(3, 40) + filler(103, 40))
  }

  test("within-batch duplicate keeps the struct-min first occurrence " +
      "and strips the later one") {
    val first = got.find(_._1 == 6L).get
    assert(first._4 == 0L, s"first occurrence must keep: $first")
    assert(first._5 == filler(6, 50) + T + filler(106, 30))
    val second = got.find(_._1 == 9L).get
    assert(second._3 == 1L && second._4 == 55L, s"second: $second")
    assert(second._5 == filler(9, 20) + filler(109, 25))
  }

  test("short new docs (< L chars) pass through untouched") {
    val r = got.find(_._1 == 12L).get
    assert(r._2 == 4L && r._4 == 0L && r._5 == "tiny")
  }
}
