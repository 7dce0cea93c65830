package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles: distinct character n-grams, short-input safe") {
    val out = Seq("abcde", "ab", "aaaa").toDF("t")
      .select(TextOps.shingles($"t", 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("abc", "bcd", "cde"))
    assert(out(1) == Set("ab")) // shorter than n: one truncated shingle
    assert(out(2) == Set("aaa")) // distinct collapses repeats
  }

  test("jaccard: exact overlap ratio") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(TextOps.jaccard($"x", $"y")).collect().head.getDouble(0) == 0.5)
  }

  test("bpe token count: words plus isolated punctuation") {
    val out = Seq("hello, world! x2", "nopunct").toDF("t")
      .select(TextOps.bpeTokenCount($"t")).collect().map(_.getInt(0))
    assert(out(0) == 5) // "hello" "," "world" "!" "x2"
    assert(out(1) == 1)
  }

  test("avgTokenLen and punctRatio") {
    val df = Seq("ab cdef").toDF("t")
    val row = df.select(
      TextOps.avgTokenLen(TextOps.tokens($"t")).as("l"),
      TextOps.punctRatio(lit("ab,c!")).as("p")).collect().head
    assert(row.getDouble(0) == 3.0)
    assert(row.getDouble(1) == 0.4)
  }

  test("langIdPredict: argmax of stopword overlap, deterministic ties") {
    val profiles = Seq(
      "en" -> Seq("the", "and"),
      "fr" -> Seq("le", "et"))
    val out = Seq("the cat and the dog", "le chat et", "xyz")
      .toDF("t")
      .select(TextOps.langIdPredict(TextOps.tokens($"t"), profiles).as("l"))
      .collect().map(_.getString(0))
    assert(out(0) == "en")
    assert(out(1) == "fr")
    assert(out(2) == "fr") // 0-0 tie → lexicographically larger code wins
  }

  test("PII scrub: counts and redaction, email-before-IP ordering, " +
      "version strings are the documented false-positive") {
    val rows = Seq(
      "write to alice.b+spam@mail.example.co.uk or bob@ex.io today",
      "server 10.0.200.1 and 192.168.1.1 rebooted",
      "call 555-867-5309 now",
      "released 1.2.3.4 of the engine at v1.2.3.4 tag", // bare quad only
      "no pii here at all",
      "mixed bob@ex.io from 10.0.0.1 call 555-123-4567")
      .toDF("t")
      .select(
        TextOps.countMatches($"t", TextOps.EmailRe).as("e"),
        TextOps.countMatches($"t", TextOps.Ipv4Re).as("i"),
        TextOps.countMatches($"t", TextOps.PhoneRe).as("p"),
        TextOps.scrubPii($"t").as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows(0)._1 == 2 && rows(0)._2 == 0 && rows(0)._3 == 0)
    assert(rows(0)._4 == "write to <EMAIL> or <EMAIL> today",
      s"email domains must be eaten whole, got '${rows(0)._4}'")
    assert(rows(1)._2 == 2 && rows(1)._4 ==
      "server <IP> and <IP> rebooted")
    assert(rows(2)._3 == 1 && rows(2)._4 == "call <PHONE> now")
    // a BARE dotted quad is the documented false positive; a vN.N.N.N
    // token is saved by \b (no word boundary between 'v' and a digit)
    assert(rows(3)._2 == 1, s"bare quad matches, v-prefixed does not: ${rows(3)}")
    assert(rows(4) == ((0, 0, 0, "no pii here at all")))
    assert(rows(5)._4 == "mixed <EMAIL> from <IP> call <PHONE>")
  }
}
