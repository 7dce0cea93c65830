package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Sampling

/** Deterministic hash-sampling entries — reproducible corpus sampling
  * for the training-data pipeline (ext/Sampling.scala).
  */
object SampleQueries {

  /** ~10.2% deterministic Bernoulli sample of documents (md5 prefix
    * < "1a" = 26/256). The oracle replays the identical rule through
    * DuckDB's md5 — green means the sample membership is bit-stable
    * across engines, which is the whole point of hash sampling. */
  val sampleHashDeterministic: CatalogEntry = CatalogEntry(
    "sample_hash_deterministic",
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE substring(md5(text), 1, 2) < '1a'
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .filter(Sampling.hashKeep($"text", "1a"))
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Stratified deterministic sample: per-language keep rates
    * (en 25%, fr 50%, es 12.5%, de 12.5%, zh 100%) — the downsample-
    * the-dominant-language operation of corpus curation. Emits
    * per-stratum kept counts so the rate realization is visible. */
  val sampleStratifiedHash: CatalogEntry = CatalogEntry(
    "sample_stratified_hash",
    """SELECT lang, count(*)::BIGINT AS n_kept,
      |  min(doc_id)::BIGINT AS min_doc_id,
      |  max(doc_id)::BIGINT AS max_doc_id
      |FROM documents
      |WHERE (lang = 'en' AND substring(md5(text), 1, 2) < '40')
      |   OR (lang = 'fr' AND substring(md5(text), 1, 2) < '80')
      |   OR (lang = 'es' AND substring(md5(text), 1, 2) < '20')
      |   OR (lang = 'de' AND substring(md5(text), 1, 2) < '20')
      |   OR (lang = 'zh' AND substring(md5(text), 1, 2) < 'gg')
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val rates = Seq(
      "en" -> "40", "fr" -> "80", "es" -> "20", "de" -> "20",
      "zh" -> "gg") // "gg" > any hex prefix → keep all of zh
    Tables.documents(s, d)
      .filter(Sampling.stratifiedKeep($"text", $"lang", rates))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"lang")
  }

  /** Per-source quota cap — "at most K documents per domain", the
    * anti-domain-dominance rule every web-corpus build applies (C4 and
    * successors cap per-host page counts). Selection is deterministic:
    * rank docs within a source by (md5(text), doc_id) and keep the K
    * smallest — re-running on the same corpus keeps the same documents,
    * and the oracle replays the identical rule.
    *
    * Scale shape: a single `row_number` per source sorts EVERY row of a
    * hot domain on one task. The implementation is two-phase: phase 1
    * ranks within (source, salt-of-doc_id) — 16-way split of each hot
    * key — and keeps ≤ K per salt slice, so at most 16·K rows per
    * source survive to phase 2's exact global rank per source. The
    * per-salt top-K is a superset of the global top-K (any global
    * winner is also a winner in its own slice), so the result is
    * IDENTICAL to the one-shot window — which is exactly what the
    * single-window oracle proves. */
  val sampleCapPerSource: CatalogEntry = CatalogEntry(
    "sample_cap_per_source",
    """SELECT doc_id, source, rk
      |FROM (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(text), doc_id)::INT AS rk
      |  FROM documents)
      |WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin) { (s, d) =>
    import s.implicits._
    Sampling.capPerKey(
      Tables.documents(s, d).select($"doc_id", $"source", $"text"),
      keyCols = Seq("source"), content = $"text", tie = $"doc_id", k = 10)
      .select($"doc_id", $"source", $"rk")
      .orderBy($"source", $"rk")
  }

  def entries: Seq[CatalogEntry] = Seq(
    sampleHashDeterministic, sampleStratifiedHash, sampleCapPerSource)
}
