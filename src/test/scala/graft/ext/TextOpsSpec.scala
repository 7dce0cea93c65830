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
}
