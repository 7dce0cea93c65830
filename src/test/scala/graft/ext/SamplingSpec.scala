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

  test("capPerKey: two-phase pre-prune == one-shot window on skewed keys; " +
      "deterministic across reruns; exact dups rank adjacently by tie") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{md5, row_number}
    val rnd = new scala.util.Random(7)
    // one hot key with 500 rows (incl. exact-dup contents), tails of 1-20
    val rows = (0 until 500).map(i =>
      (i.toLong, "hot", s"content ${rnd.nextInt(100)}")) ++
      (0 until 60).map(i => (1000L + i, s"k${i % 7}", s"c$i"))
    val df = rows.toDF("id", "key", "content")
    val twoPhase = Sampling.capPerKey(df, Seq("key"), $"content", $"id",
      k = 5, salts = 8)
      .select($"key", $"id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = df.withColumn("rk", row_number().over(
        Window.partitionBy($"key")
          .orderBy(md5($"content".cast("binary")).asc, $"id".asc)).cast("int"))
      .where($"rk" <= 5)
      .select($"key", $"id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(twoPhase == oneShot,
      s"pre-prune must be lossless; onlyTwo=${(twoPhase -- oneShot).take(5)} " +
        s"onlyOne=${(oneShot -- twoPhase).take(5)}")
    // rerun identical (content-keyed determinism)
    val rerun = Sampling.capPerKey(df, Seq("key"), $"content", $"id",
      k = 5, salts = 8)
      .select($"key", $"id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rerun == twoPhase)
    // keys with fewer than k rows keep everything
    val small = oneShot.filter(_._1 == "k0")
    assert(small.nonEmpty && small.size <= 5)
  }

  test("weightedKey: deterministic, negative, and weight-monotone in " +
    "expectation (Efraimidis-Spirakis inclusion scales with weight)") {
    // two weight classes over the same texts: w=1000 vs w=10.
    val weighted = Seq.tabulate(2000) { i =>
      (i.toLong, s"doc $i", if (i < 1000) 1000L else 10L)
    }.toDF("id", "text", "w")
    val keyed = weighted
      .withColumn("k", Sampling.weightedKey($"text", $"w"))
      .select($"id", $"w", $"k").collect()
    assert(keyed.forall(_.getDouble(2) < 0.0), "ln(u)/w must be negative")
    // rerun identical (content-keyed, no rand())
    val rerun = weighted
      .withColumn("k", Sampling.weightedKey($"text", $"w"))
      .select($"id", $"w", $"k").collect()
    assert(keyed.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      rerun.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // top-200 keys should be overwhelmingly from the heavy class: each
    // heavy item is ~100x more likely than a light one at every rank.
    val heavyInTop = keyed.sortBy(-_.getDouble(2)).take(200)
      .count(_.getLong(1) == 1000L)
    assert(heavyInTop > 180, s"heavy class underrepresented: $heavyInTop/200")
  }
}
