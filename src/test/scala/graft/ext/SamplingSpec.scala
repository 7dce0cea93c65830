package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq.tabulate(2000)(i => (i.toLong, s"document body $i"))
    .toDF("id", "text")

  test("hash sample is deterministic and rate lands near the threshold") {
    val a = docs.filter(Sampling.hashKeep($"text", "40")).select($"id")
      .collect().map(_.getLong(0)).toSet
    val b = docs.filter(Sampling.hashKeep($"text", "40")).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same data + same threshold must select the same rows")
    // expected rate 0x40/256 = 25%; binomial(2000, .25) ±5σ ≈ ±97
    assert(math.abs(a.size - 500) < 100, s"rate off: ${a.size}/2000")
  }

  test("a lower threshold selects a subset of a higher one (nested samples)") {
    val small = docs.filter(Sampling.hashKeep($"text", "10")).select($"id")
      .collect().map(_.getLong(0)).toSet
    val big = docs.filter(Sampling.hashKeep($"text", "80")).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "nested-sample property violated")
  }

  test("identical content samples identically regardless of id") {
    val dup = Seq((1L, "same text"), (2L, "same text")).toDF("id", "text")
    val kept = dup.filter(Sampling.hashKeep($"text", "80"))
      .collect().length
    assert(kept == 0 || kept == 2, "duplicate rows must sample together")
  }

  test("stratified keep applies the stratum's own threshold; unlisted strata drop") {
    val rows = Seq.tabulate(600)(i =>
      (i.toLong, s"text $i", Seq("en", "fr", "xx")(i % 3)))
      .toDF("id", "text", "lang")
    val kept = rows.filter(Sampling.stratifiedKeep($"text", $"lang",
        Seq("en" -> "00", "fr" -> "gg")))
      .select($"lang").collect().map(_.getString(0))
    assert(!kept.contains("xx"), "unlisted stratum must drop")
    assert(!kept.contains("en"), "threshold 00 keeps nothing")
    assert(kept.count(_ == "fr") == 200, "gg sentinel keeps the whole stratum")
  }

  test("numeric keys hash their canonical decimal text (cross-engine form)") {
    // the contract another engine replays is md5(key::VARCHAR); a raw
    // binary cast of a LongType would hash big-endian bytes instead.
    // Reference keep-set computed from the JDK's own md5 of the text.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 2000L).filter(i => md5hex(i.toString) < "40").toSet
    val got = docs.filter(Sampling.hashKeep($"id", "40")).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"integer keys must sample by their decimal-text hash; " +
        s"onlyGot=${(got -- expected).take(5)} onlyExp=${(expected -- got).take(5)}")
  }

  test("thresholds are validated") {
    intercept[IllegalArgumentException] {
      Sampling.hashKeep($"text", "XYZ")
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedKeep($"text", $"lang", Seq("en" -> "4", "fr" -> "40"))
    }
  }
}
