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

  test("tokenNgrams: window positions, short-doc and exact-length edges") {
    val out = Seq("a b c d", "a b", "a", "x y z")
      .toDF("t")
      .select(TextOps.tokenNgrams(TextOps.tokens($"t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty) // 2 tokens < n=3: guarded empty, not [1,0]
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq("x y z")) // exactly n tokens: one gram
  }

  test("topGramChars: chars(g)*count(g) of the most frequent gram, " +
      "lexicographically-smallest tie-break") {
    val out = Seq(
      Seq("b b", "a a", "b b", "a a", "c c"), // tie at 2: "a a" wins → 3*2
      Seq("zz zz"), // single gram: 5*1
      Seq.empty[String]) // no grams: 0
      .toDF("g")
      .select(TextOps.topGramChars($"g")).collect().map(_.getInt(0))
    assert(out(0) == 6, "count-2 tie must break to 'a a' (3 chars * 2)")
    assert(out(1) == 5)
    assert(out(2) == 0)
  }

  test("dupGramExtraChars: chars(g)*(c-1) summed over duplicated grams") {
    val out = Seq(
      Seq("ab", "cd", "ab", "ab", "ef"), // "ab" c=3 → 2*(3-1)=4
      Seq("xyz", "xyz"), // 3*(2-1)=3
      Seq("a", "b", "c"), // all unique → 0
      Seq("q"), // size<2 guard
      Seq.empty[String])
      .toDF("g")
      .select(TextOps.dupGramExtraChars($"g")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(4, 3, 0, 0, 0))
  }

  test("repetition fractions: hand-computed Gopher signals on a " +
      "pathological doc") {
    // "a a a a": 2-grams = ["a a"]x3 → top chars 3*3=9, text len 7.
    // Overlapping windows make the fraction exceed 1, as in the paper.
    val row = Seq("a a a a").toDF("text")
      .select(
        (TextOps.topGramChars(
          TextOps.tokenNgrams(TextOps.tokens($"text"), 2)).cast("double")
          / length($"text")).as("top2"),
        TextOps.dupGramExtraChars(
          TextOps.tokenNgrams(TextOps.tokens($"text"), 2)).as("dup2"))
      .collect().head
    assert(math.abs(row.getDouble(0) - 9.0 / 7.0) < 1e-12)
    assert(row.getInt(1) == 6) // "a a" c=3 → 3*(3-1)
  }
}
