package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling — the reproducibility primitive
  * a 100 TB pipeline needs where `rand()`-based sampling cannot go:
  * the same row is kept or dropped on every run, on every cluster, at
  * every scale factor, with no seed plumbing and no shuffle.
  *
  * Mechanism: hash the key column with md5, take the first k hex chars,
  * and keep rows whose prefix is lexicographically below a threshold.
  * Zero-padded fixed-width hex compares exactly like the number it
  * encodes, so `substring(md5(x), 1, k) < t` keeps a `int(t,16)/16^k`
  * fraction — pure string comparison, no float math, bit-identical in
  * any engine with md5 (which is how the DuckDB oracle replays it).
  *
  * Properties that make this the scale-grade sample:
  *   - narrow (codegen'd scan-side filter; no shuffle, no state);
  *   - nested: a lower threshold selects a subset of a higher one, so
  *     a 1% debug sample is contained in the 10% eval sample;
  *   - stratification is just a per-stratum threshold expression;
  *   - exact-dup rows sample identically (same content → same hash),
  *     which is what you want when sampling pre-dedup corpora.
  */
object Sampling {

  /** Hash input: the key's CANONICAL TEXT form. A bare
    * `cast("binary")` only works for strings and would turn numeric
    * keys into big-endian bytes no SQL engine's `md5(x::VARCHAR)`
    * reproduces — so every key is first rendered as a string, making
    * string and integer keys cross-engine-deterministic (DuckDB hashes
    * the same "12345" text). Fractional types are NOT part of the
    * contract: their text rendering is engine-specific. */
  private def canonical(key: Column): Column =
    key.cast("string").cast("binary")

  /** Keep predicate: md5(key)'s first `threshold.length` hex chars
    * compare below `threshold` (lowercase hex, e.g. "1a" ≈ 26/256).
    * `key` contract: a string or integer column (see [[canonical]]). */
  def hashKeep(key: Column, threshold: String): Column = {
    require(threshold.nonEmpty && threshold.matches("[0-9a-f]+"),
      s"threshold must be lowercase hex, got '$threshold'")
    substring(md5(canonical(key)), 1, threshold.length) < lit(threshold)
  }

  /** Per-stratum thresholds (stratified deterministic sampling): the
    * stratum column selects which threshold applies; unlisted strata
    * are dropped. All thresholds must share one width so the substring
    * is computed once. */
  def stratifiedKeep(key: Column, stratum: Column,
      thresholds: Seq[(String, String)]): Column = {
    val widths = thresholds.map(_._2.length).distinct
    require(widths.size == 1, s"thresholds must share one width: $thresholds")
    val prefix = substring(md5(canonical(key)), 1, widths.head)
    thresholds.foldLeft(lit(false)) { case (acc, (value, t)) =>
      acc || (stratum === value && prefix < lit(t))
    }
  }
}
