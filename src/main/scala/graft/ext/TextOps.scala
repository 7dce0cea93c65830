package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, character shingles, token statistics, SimHash
  * fingerprints, and a stopword-overlap language-ID heuristic.
  *
  * Everything is a pure column expression over built-in functions — no
  * UDFs, so the whole surface stays inside whole-stage codegen and
  * scales as row-local work fused into the scan.
  */
object TextOps {

  /** Whitespace tokenization (the simplest reference-style split). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: word runs plus isolated punctuation, the
    * standard pre-tokenizer regex shape. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Distinct character n-gram shingles — the unit for Jaccard
    * similarity and MinHash. `text.substr` accepts column offsets, so
    * the shingle set is a single `transform` over an index sequence. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** |A ∩ B| / |A ∪ B| over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** 63-bit SimHash over a token array: per bit, count tokens whose
    * xxhash64 has the bit set minus those that don't; the sign vector is
    * the fingerprint. Near-duplicate texts land within a small Hamming
    * distance. Bit 63 is left out to stay in positive Long territory.
    *
    * Built as 63 static conditional sums over the exploded token hash —
    * the per-token work is one xxhash64 plus codegen'd bit tests. */
  val SimhashBits = 63

  /** Per-bit ±1 contributions for one token hash. Used with
    * explode(tokens) → groupBy(doc) → sum each bit → [[assembleSimhash]]. */
  def simhashBitVotes(tokenHash: Column): Seq[Column] =
    (0 until SimhashBits).map { i =>
      when(tokenHash.bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)
    }

  /** Recombine the 63 summed votes into the fingerprint long. */
  def assembleSimhash(bitSums: Seq[Column]): Column =
    bitSums.zipWithIndex.map { case (s, i) =>
      when(s >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Hamming distance between two SimHash fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Stopword-overlap language scores: for each (lang, stopwords) entry,
    * the number of distinct stopwords present in the token array. The
    * argmax (ties broken toward the lexicographically larger code, via
    * struct max) is the predicted language. */
  def langIdPredict(toks: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scored = profiles.map { case (lang, words) =>
      struct(
        size(array_intersect(array_distinct(toks),
          array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Quality-score heuristics: mean token length and punctuation ratio. */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double") / size(toks)

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^\\w\\s]", "")))
      .cast("double") / length(text)

  /** PII patterns for corpus scrubbing (the C4-style regex pass).
    * Deliberately restricted to the regex subset Java and RE2 agree on
    * (character classes, bounded repeats, ASCII \b — no lookaround, no
    * backreferences) so a SQL engine can replay the scrub verbatim. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Occurrence count of `re` in `text` (codegen'd, no UDF). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Redact emails, then IPv4s, then phone numbers — email first so an
    * address' dotted domain can never be half-eaten as an IP. Each class
    * gets a typed sentinel, preserving downstream tokenization. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
