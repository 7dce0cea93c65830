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

  /** Efraimidis–Spirakis key for weighted sampling WITHOUT replacement
    * (Efraimidis & Spirakis 2006): each row gets `key = u^(1/w)` for a
    * uniform `u`, and the k rows with the LARGEST keys are a weighted
    * k-sample. We rank on the order-equivalent `ln(u)/w` (monotone in
    * u^(1/w); avoids pow's tiny-exponent underflow for huge weights)
    * and derive `u = (h+1)/2^60` from the row's md5 — a ratio of exact
    * integers, so the key is deterministic and cross-engine
    * reproducible (DuckDB replays the identical arithmetic), unlike
    * `rand()`-seeded sampling which no two cluster runs repeat.
    *
    * Scale shape: pure row-local scan-side expression + TakeOrdered
    * top-k — no shuffle beyond the k-row final merge, works unchanged
    * at 100 TB. `weight` must be a positive integer column. */
  def weightedKey(key: Column, weight: Column): Column = {
    val h = conv(substring(md5(canonical(key)), 1, 15), 16, 10)
      .cast("long")
    log((h + lit(1L)).cast("double") / lit(1152921504606846976.0d)) /
      weight.cast("double")
  }

  /** Deterministic per-key quota cap — "keep at most `k` rows per key",
    * the anti-domain-dominance rule of web-corpus builds (C4-family
    * per-host caps), selecting the `k` rows with the SMALLEST
    * (md5(content), tie) rank so reruns keep the same rows.
    *
    * TWO-PHASE for scale: a single `row_number` over a hot key sorts
    * every row of that key on one task. Phase 1 ranks within
    * (key, salt) — `salts`-way split of every hot key, salt derived
    * deterministically from the tie column — and keeps ≤ k per slice;
    * phase 2 ranks the ≤ salts·k survivors per key exactly. Any global
    * top-k row is also top-k within its own slice (fewer than k rows of
    * the slice can outrank it), so the result is IDENTICAL to the
    * one-shot window — the property `SamplingSpec` asserts and the
    * catalog oracle hash-checks cross-engine.
    *
    * Emits the input columns plus `rk` (1-based rank within the key).
    * `content`/`tie` contract as [[canonical]]: string or integer. */
  def capPerKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      content: Column, tie: Column, k: Int,
      salts: Int = 16): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"cap must be positive: $k")
    require(salts > 0, s"salts must be positive: $salts")
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val h = md5(canonical(content))
    val preW = Window.partitionBy((keys :+ pmod(xxhash64(tie), lit(salts))): _*)
      .orderBy(h.asc, tie.asc)
    val exactW = Window.partitionBy(keys: _*).orderBy(h.asc, tie.asc)
    df.withColumn("__srk", row_number().over(preW))
      .where(col("__srk") <= k)
      .drop("__srk")
      .withColumn("rk", row_number().over(exactW).cast("int"))
      .where(col("rk") <= k)
  }
}
