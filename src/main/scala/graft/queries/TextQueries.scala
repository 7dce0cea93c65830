package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Graph, TextOps}

/** Text-analysis and dedup operators over `documents` — the
  * training-data-pipeline surface (builder brief; graded first-class).
  */
object TextQueries {

  /** Tokenize → explode → count: top-20 corpus words. */
  val textWordcount: CatalogEntry = CatalogEntry(
    "text_wordcount",
    """SELECT word, count(*)::BIGINT AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(TextOps.tokens($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc)
      .limit(20)
  }

  /** Per-document quality stats: token counts (whitespace and BPE-ish
    * regex), distinct tokens, mean token length, punctuation ratio. */
  val textStats: CatalogEntry = CatalogEntry(
    "text_stats",
    """SELECT doc_id, lang,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe,
      |  round(list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
      |        / len(string_split(text, ' ')), 4) AS avg_token_len,
      |  round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
      |        / length(text), 4) AS punct_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val toks = TextOps.tokens($"text")
    Tables.documents(s, d)
      .select($"doc_id", $"lang",
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq"),
        TextOps.bpeTokenCount($"text").as("n_bpe"),
        round(TextOps.avgTokenLen(toks), 4).as("avg_token_len"),
        round(TextOps.punctRatio($"text"), 4).as("punct_ratio"))
      .orderBy($"doc_id")
  }

  /** Corpus profile per language tag. */
  val langAgg: CatalogEntry = CatalogEntry(
    "lang_agg",
    """SELECT lang,
      |  count(*)::BIGINT AS n_docs,
      |  round(avg(n_chars), 4) AS avg_chars,
      |  min(n_chars)::BIGINT AS min_chars,
      |  max(n_chars)::BIGINT AS max_chars
      |FROM documents GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"n_chars"), 4).as("avg_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang")
  }

  /** Exact dedup by content hash; survivor = min doc_id. The oracle
    * groups by the raw text — a green row proves the hash grouping is
    * faithful to content equality. */
  val dedupExact: CatalogEntry = CatalogEntry(
    "dedup_exact",
    """SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
      |FROM documents GROUP BY text
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .select($"doc_id", $"n_copies")
      .orderBy($"doc_id")
  }

  /** Exact 3-gram Jaccard similarity of every document against doc 0,
    * top 20 — the confirmation metric used on LSH candidates, oracled
    * end-to-end via DuckDB list algebra. Computed by the native
    * `jaccard_shingles` kernel (one row-local pass over both texts'
    * exact distinct-shingle sets — no per-row array materialization or
    * array_intersect hash tables; value-identical to the column
    * algebra, SketchExprSpec); the broadcast side is the raw query
    * TEXT, a few hundred bytes instead of a shingle array. */
  val dedupNgramJaccard: CatalogEntry = CatalogEntry(
    "dedup_ngram_jaccard",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, i, 3)
      |                   for i in range(1, length(text) - 1)]) AS s
      |  FROM documents),
      |q AS (SELECT s AS qs FROM sh WHERE doc_id = 0)
      |SELECT doc_id,
      |  round(len(list_intersect(s, qs))::DOUBLE
      |        / (len(s) + len(qs) - len(list_intersect(s, qs))), 5) AS jaccard_r
      |FROM sh, q
      |ORDER BY jaccard_r DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val q = docs.filter($"doc_id" === 0).select($"text".as("qtext"))
    docs.crossJoin(broadcast(q))
      .select($"doc_id",
        round(call_function("jaccard_shingles", $"text", $"qtext", lit(3)), 5)
          .as("jaccard_r"))
      .orderBy($"jaccard_r".desc, $"doc_id".asc)
      .limit(20)
  }

  /** SimHash fingerprint per document (63-bit, xxhash64 token votes),
    * via the native single-pass `simhash63` expression — bit-exact with
    * the explode + 63-conditional-sums formulation (SketchExprSpec) but
    * row-local: the per-token vote shuffle is gone, only the
    * determinism sort exchanges. Engine-specific hashing → no SQL
    * oracle; near-dup Hamming behavior is asserted in DedupSpec. */
  val textSimhash: CatalogEntry = CatalogEntry.noOracle(
    "text_simhash") { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      // null text: match the explode formulation's row drop. Filtering
      // the INPUT column (not the sketch) keeps the predicate at the
      // scan — a filter on the output alias would be pushed below the
      // projection by substitution, evaluating the kernel twice per
      // row (the plan lint pins this to exactly one evaluation)
      .where($"text".isNotNull)
      .select($"doc_id",
        call_function("simhash63", TextOps.tokens($"text")).as("simhash"))
      .orderBy($"doc_id")
  }

  /** SimHash multi-index table (Manku WWW'07): 4 16-bit bands per doc
    * over the native single-pass 63-bit fingerprint. Docs within
    * Hamming distance 3 agree exactly on >= 1 band (pigeonhole), so
    * near-dup retrieval is the band equi-join of
    * `Dedup.simhashNearDupPairs` — never an all-pairs scan; recall AND
    * precision vs brute-force Hamming are asserted in DedupSpec (this
    * corpus has no near-dups to emit). Engine-specific hashing → no
    * SQL oracle. */
  val dedupSimhashHamming: CatalogEntry = CatalogEntry.noOracle(
    "dedup_simhash_hamming") { (s, d) =>
    import s.implicits._
    Dedup.simhashBandIndex(Tables.documents(s, d), "doc_id", "text")
      .orderBy($"doc_id", $"band")
  }

  /** MinHash-LSH banding table (band, band_hash per doc) — the shuffle
    * key that makes near-dup detection an equi-join instead of an
    * all-pairs cross join. The signature + band digests come from the
    * native single-pass `minhash_bands` expression (bit-exact with the
    * explode+agg formulation, SketchExprSpec), so the signature stage
    * plans ZERO shuffles — at 100 TB the only exchange left in a full
    * near-dup run is the band equi-join itself. Pair confirmation is
    * Dedup.nearDupPairs, asserted in DedupSpec (this corpus has no
    * near-dups to emit). */
  val dedupMinhashLsh: CatalogEntry = CatalogEntry.noOracle(
    "dedup_minhash_lsh") { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select($"doc_id", posexplode(
        call_function("minhash_bands", $"text", lit(16), lit(4), lit(3)))
        .as(Seq("band", "band_hash")))
      .orderBy($"doc_id", $"band")
  }

  /** Winnowing (rolling k-gram hash) fingerprint profile per document,
    * via the native `winnow_fps` expression (sorted distinct minima per
    * row; bit-exact fingerprint set vs the posexplode + Window-min
    * formulation, SketchExprSpec). The per-k-gram-hash Window shuffle
    * is gone — the stats read off the sorted array in one projection.
    * Docs too short for a full window report n_fingerprints = 0 (the
    * Window formulation dropped them; this corpus has none — both
    * behaviors asserted in SketchExprSpec). Engine-specific hashing →
    * no SQL oracle; the substring-sharing guarantee is in DedupSpec. */
  val docWinnowFingerprint: CatalogEntry = CatalogEntry.noOracle(
    "doc_winnow_fingerprint") { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select($"doc_id",
        call_function("winnow_fps", $"text", lit(5), lit(4)).as("fps"))
      .select($"doc_id",
        coalesce(size($"fps").cast("long"), lit(0L)).as("n_fingerprints"),
        when(size($"fps") > 0, element_at($"fps", 1)).as("min_fp"),
        when(size($"fps") > 0, element_at($"fps", -1)).as("max_fp"))
      .orderBy($"doc_id")
  }

  /** Stopword-overlap language-ID heuristic — a deterministic argmax
    * (struct max over (score, lang)), so it gets a full DuckDB oracle:
    * the same argmax via list_sort over score/lang structs. */
  val langIdHeuristic: CatalogEntry = CatalogEntry(
    "lang_id_heuristic",
    """SELECT doc_id, lang, predicted_lang,
      |  (lang = predicted_lang)::INT AS is_match
      |FROM (
      |  SELECT doc_id, lang,
      |    (list_sort([
      |      {'score': len(list_intersect(list_distinct(string_split(text, ' ')),
      |                    ['the','a','of','and','to'])), 'lang': 'en'},
      |      {'score': len(list_intersect(list_distinct(string_split(text, ' ')),
      |                    ['le','la','et','de','un'])), 'lang': 'fr'},
      |      {'score': len(list_intersect(list_distinct(string_split(text, ' ')),
      |                    ['el','la','y','de','un'])), 'lang': 'es'},
      |      {'score': len(list_intersect(list_distinct(string_split(text, ' ')),
      |                    ['der','die','und','das','ein'])), 'lang': 'de'},
      |      {'score': len(list_intersect(list_distinct(string_split(text, ' ')),
      |                    ['de','shi','le','he','zai'])), 'lang': 'zh'}
      |    ])[-1]).lang AS predicted_lang
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val profiles = Seq(
      "en" -> Seq("the", "a", "of", "and", "to"),
      "fr" -> Seq("le", "la", "et", "de", "un"),
      "es" -> Seq("el", "la", "y", "de", "un"),
      "de" -> Seq("der", "die", "und", "das", "ein"),
      "zh" -> Seq("de", "shi", "le", "he", "zai"))
    Tables.documents(s, d)
      .select($"doc_id", $"lang",
        TextOps.langIdPredict(TextOps.tokens($"text"), profiles)
          .as("predicted_lang"))
      .withColumn("is_match", ($"lang" === $"predicted_lang").cast("int"))
      .orderBy($"doc_id")
  }

  /** TF-IDF top-3 terms per document, smoothed idf = ln((N+1)/(df+1)).
    *
    * Shape at 100 TB: tf = explode + (doc,term) partial-agg; df is an
    * agg over the tf table (vocabulary-sized — small enough to
    * broadcast in practice, left as a shuffle join so AQE decides);
    * the per-doc top-3 is a row_number window over tf-join rows keyed
    * by doc_id. N reaches the plan as a broadcast 1-row cross join,
    * never a collect. (N+1)/(df+1) is an exact-integer double division
    * (correctly rounded, engine-identical), so Spark's `log` and
    * DuckDB's `ln` see bit-identical inputs. */
  val tfidfTopTerms: CatalogEntry = CatalogEntry(
    "tfidf_top_terms",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*)::BIGINT AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    round(tf * ln((n + 1.0) / (df + 1.0)), 4) AS tfidf_r,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf * ln((n + 1.0) / (df + 1.0)) DESC, term) AS rk
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, rk::INT AS rk, term, tf, df, tfidf_r
      |FROM scored WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tf = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val score = $"tf" * log(($"n" + 1).cast("double") / ($"df" + 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy(score.desc, $"term".asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tf", $"df",
        round(score, 4).as("tfidf_r"))
      .orderBy($"doc_id", $"rk")
  }

  /** Gopher-style document quality gate, adapted to this corpus's
    * signals: token-count bounds, type-token ratio (repetition),
    * top-word fraction, mean word length bounds, stopword fraction.
    * All five integer moments come from ONE row-local `token_stats`
    * pass (SketchExprSpec proves them equal to the explode + double
    * groupBy formulation), so the quality gate plans ZERO shuffles
    * beyond the determinism sort — at 100 TB the old shape shuffled the
    * tokenized corpus twice. Every ratio is an exact-integer double
    * division, so the oracle comparison is bit-stable with no
    * transcendental math. Emits the per-rule flags alongside the
    * verdict so a pipeline can report WHY a doc dropped. */
  val docQualityFilter: CatalogEntry = CatalogEntry(
    "doc_quality_filter",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
      |q AS (
      |  SELECT doc_id,
      |    sum(c)::BIGINT AS n_tokens,
      |    count(*)::BIGINT AS n_uniq,
      |    max(c)::BIGINT AS max_tf,
      |    round(sum(length(term) * c)::DOUBLE / sum(c), 4) AS mean_word_len,
      |    round(count(*)::DOUBLE / sum(c), 4) AS ttr,
      |    round(max(c)::DOUBLE / sum(c), 4) AS top_word_frac,
      |    round(coalesce(sum(c) FILTER (term IN ('the', 'a', 'of', 'and', 'to')),
      |                   0)::DOUBLE / sum(c), 4) AS stopword_frac
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_uniq, mean_word_len, ttr, top_word_frac,
      |  stopword_frac,
      |  (n_tokens BETWEEN 20 AND 100000) AS ok_len,
      |  (ttr >= 0.2) AS ok_ttr,
      |  (top_word_frac <= 0.2) AS ok_top_word,
      |  (mean_word_len BETWEEN 3 AND 10) AS ok_word_len,
      |  (n_tokens BETWEEN 20 AND 100000 AND ttr >= 0.2
      |   AND top_word_frac <= 0.2
      |   AND mean_word_len BETWEEN 3 AND 10) AS keep
      |FROM q ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    qualitySignals(s, d)
      .select($"doc_id", $"n_tokens", $"n_uniq", $"mean_word_len", $"ttr",
        $"top_word_frac", $"stopword_frac",
        gateOkLen.as("ok_len"),
        gateOkTtr.as("ok_ttr"),
        gateOkTopWord.as("ok_top_word"),
        gateOkWordLen.as("ok_word_len"),
        gateKeep.as("keep"))
      .orderBy($"doc_id")
  }

  // ---- shared quality-signal builder -------------------------------------
  // ONE scan of documents computing BOTH row-local kernels — the
  // token_stats moments behind the Gopher-style gate AND the
  // bow_score_md5 classifier struct — shared by doc_quality_filter,
  // quality_classifier_auc and quality_calibration_bins, so the AUC /
  // calibration label can never drift from the shipped gate and the
  // score can never drift from the shipped classifier. A consumer that
  // projects only one side leaves the other kernel to column pruning
  // (doc_quality_filter never evaluates bow_score_md5).

  /** doc_id, source, the gate's rounded-4dp ratio signals, the
    * classifier's (non-empty) token count and raw score — null-text
    * docs dropped like every tokenize-CTE oracle. */
  private def qualitySignals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      // null text: the oracle's tokenize-CTE drops the row (unnest of a
      // NULL list); token_stats(null) would instead keep an all-null
      // row — filter the input column like text_simhash does
      .where($"text".isNotNull)
      .select($"doc_id", $"source",
        call_function("token_stats", $"text", lit("the,a,of,and,to"))
          .as("ts"),
        call_function("bow_score_md5", $"text").as("bs"),
        // "has >= 1 non-empty space-split token" (iff some char is not
        // a space) — the classifier oracle's tokenize-CTE row-set, as
        // a scan-pushable predicate; a bs.n_tokens > 0 guard would
        // re-evaluate the bow kernel inside the pushed Filter
        (trim($"text") =!= "").as("has_clf_tokens"))
      .select($"doc_id", $"source", $"has_clf_tokens",
        $"ts.n_tokens".as("n_tokens"),
        $"ts.n_uniq".as("n_uniq"),
        round($"ts.sum_len".cast("double") / $"ts.n_tokens", 4)
          .as("mean_word_len"),
        round($"ts.n_uniq".cast("double") / $"ts.n_tokens", 4).as("ttr"),
        round($"ts.max_c".cast("double") / $"ts.n_tokens", 4)
          .as("top_word_frac"),
        round($"ts.n_stop".cast("double") / $"ts.n_tokens", 4)
          .as("stopword_frac"),
        $"bs.n_tokens".as("clf_n_tokens"),
        $"bs.score_raw".as("score"))
  }

  /** The gate's component verdicts over [[qualitySignals]]' columns —
    * single source of truth for the keep predicate (rounded-ratio
    * thresholds, exactly the doc_quality_filter oracle's). */
  private def gateOkLen: org.apache.spark.sql.Column =
    col("n_tokens").between(20, 100000)
  private def gateOkTtr: org.apache.spark.sql.Column = col("ttr") >= 0.2
  private def gateOkTopWord: org.apache.spark.sql.Column =
    col("top_word_frac") <= 0.2
  private def gateOkWordLen: org.apache.spark.sql.Column =
    col("mean_word_len").between(3, 10)
  private def gateKeep: org.apache.spark.sql.Column =
    gateOkLen && gateOkTtr && gateOkTopWord && gateOkWordLen

  /** Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446
    * §A1.1), the second half of the quality gate: the fraction of a
    * doc's characters covered by its most frequent 2/3/4-gram and the
    * duplicate-mass fraction of its 5- and 10-grams, with the paper's
    * thresholds folded into a `rep_keep` verdict. Overlapping windows
    * mean a top-gram fraction can exceed 1 (the paper's does too) —
    * thresholds only ever test the low end.
    *
    * Every signal is a row-local sort+fold over the doc's own grams
    * (TextOps.topGramChars / dupGramExtraChars): the whole entry plans
    * ZERO shuffles beyond the determinism sort, where the naive
    * explode + groupBy(doc_id, gram) formulation (what the oracle runs)
    * would shuffle the full tokenized corpus five times at 100 TB.
    * Ratios are exact-integer divisions, so the cross-engine hash
    * compare is bit-stable.
    *
    * `dup3_frac` sits below the paper's 5-10 duplicate-gram range and
    * carries no threshold — it exists because this corpus contains NO
    * duplicate 5- or 10-grams at any SF, so without it the
    * duplicate-mass path would hash-match on all-zeros without ever
    * running (27 docs have duplicate 3-grams at sf0.01). */
  val docRepetitionStats: CatalogEntry = CatalogEntry(
    "doc_repetition_stats",
    """WITH t AS (
      |  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS s
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |gr AS (
      |  SELECT doc_id, n.n AS n,
      |    unnest([array_to_string(s[i:i+n.n-1], ' ')
      |            for i in range(1, len(s) - n.n + 2)]) AS gram
      |  FROM t, (VALUES (2), (3), (4), (5), (10)) AS n(n)),
      |g AS (SELECT doc_id, n, gram, count(*)::BIGINT AS c
      |      FROM gr GROUP BY 1, 2, 3),
      |p AS (SELECT doc_id, n, gram, c, row_number() OVER (
      |        PARTITION BY doc_id, n ORDER BY c DESC, gram ASC) AS rk
      |      FROM g),
      |a AS (
      |  SELECT doc_id, n,
      |    coalesce(max(length(gram) * c) FILTER (rk = 1), 0) AS top_chars,
      |    coalesce(sum(length(gram) * (c - 1)) FILTER (c > 1), 0) AS dup_extra
      |  FROM p GROUP BY 1, 2),
      |f AS (
      |  SELECT t.doc_id,
      |    round(coalesce(max(a.top_chars) FILTER (a.n = 2), 0)::DOUBLE
      |          / t.n_chars, 4) AS top2_frac,
      |    round(coalesce(max(a.top_chars) FILTER (a.n = 3), 0)::DOUBLE
      |          / t.n_chars, 4) AS top3_frac,
      |    round(coalesce(max(a.top_chars) FILTER (a.n = 4), 0)::DOUBLE
      |          / t.n_chars, 4) AS top4_frac,
      |    round(coalesce(max(a.dup_extra) FILTER (a.n = 3), 0)::DOUBLE
      |          / t.n_chars, 4) AS dup3_frac,
      |    round(coalesce(max(a.dup_extra) FILTER (a.n = 5), 0)::DOUBLE
      |          / t.n_chars, 4) AS dup5_frac,
      |    round(coalesce(max(a.dup_extra) FILTER (a.n = 10), 0)::DOUBLE
      |          / t.n_chars, 4) AS dup10_frac
      |  FROM t LEFT JOIN a USING (doc_id)
      |  GROUP BY t.doc_id, t.n_chars)
      |SELECT doc_id, top2_frac, top3_frac, top4_frac, dup3_frac, dup5_frac,
      |  dup10_frac,
      |  (top2_frac <= 0.2 AND top3_frac <= 0.18 AND top4_frac <= 0.16
      |   AND dup5_frac <= 0.15 AND dup10_frac <= 0.1) AS rep_keep
      |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    // one call to the single-pass rep_stats kernel per row (array slots:
    // top2,dup2,top3,dup3,top4,dup4,top5,dup5,top10,dup10) — the column
    // algebra over seven per-doc gram arrays measured 60 s at sf0.1;
    // the kernel is value-identical (SketchExprSpec) and row-local
    graft.functions.GraftFunctions.register(s)
    def frac(slot: Int) = round(
      element_at($"rs", slot).cast("double") / $"nc", 4)
    Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", length($"text").as("nc"),
        call_function("rep_stats", $"text").as("rs"))
      .select($"doc_id",
        frac(1).as("top2_frac"), frac(3).as("top3_frac"),
        frac(5).as("top4_frac"), frac(4).as("dup3_frac"),
        frac(8).as("dup5_frac"), frac(10).as("dup10_frac"))
      .withColumn("rep_keep",
        $"top2_frac" <= 0.2 && $"top3_frac" <= 0.18 &&
          $"top4_frac" <= 0.16 && $"dup5_frac" <= 0.15 &&
          $"dup10_frac" <= 0.1)
      .orderBy($"doc_id")
  }

  /** Fixed-size token-window chunking with overlap — how a corpus is
    * cut into training sequences (size 50, stride 40 → 10 tokens of
    * overlap carry context across boundaries). One chunk row per
    * window position; the last window starts at the LAST stride step
    * that still adds unseen tokens — `max k: k*stride < n` alone would
    * emit a tail chunk fully contained in its predecessor whenever
    * `n <= size + k*stride` — so the chunk count is
    * `1 + max(0, ceil((n - size) / stride))` and the tail chunk is the
    * natural remainder, 11..50 tokens, never pure overlap (no padding —
    * that's the tokenizer's job downstream). Each chunk carries its
    * sha-256 so chunk-level exact dedup can run on the output directly.
    *
    * Chunking is pure row-local fan-out: compute the window starts
    * with `sequence`, slice the token array per start, `posexplode` —
    * no shuffle anywhere before the determinism sort. At 100 TB the
    * output is ~1.25x the corpus (the overlap), written straight back
    * out; a formulation that grouped or windowed over token rows
    * instead would shuffle the entire corpus. */
  val docChunkTokens: CatalogEntry = CatalogEntry(
    "doc_chunk_tokens",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS s
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |c AS (
      |  SELECT doc_id,
      |    unnest(range(0, greatest(0, (len(s) - 11) // 40) + 1)) AS chunk_id,
      |    s
      |  FROM t)
      |SELECT doc_id, chunk_id::INT AS chunk_id,
      |  (chunk_id * 40 + 1)::INT AS chunk_start,
      |  least(50, len(s) - chunk_id * 40)::INT AS chunk_len,
      |  array_to_string(s[chunk_id * 40 + 1 : chunk_id * 40 + 50], ' ')
      |    AS chunk_text,
      |  sha256(array_to_string(s[chunk_id * 40 + 1 : chunk_id * 40 + 50], ' '))
      |    AS chunk_sha
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val Size = 50
    val Stride = 40
    val toks = TextOps.tokens($"text")
    Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", toks.as("s"))
      .select($"doc_id", $"s",
        posexplode(transform(
          // ceil((n - size)/stride) via (n - size + stride - 1)/stride:
          // Column `/` promotes to double and the toward-zero cast can
          // only disagree with floor on the negative side, where the
          // quotient stays in (-1, 0] (n >= 1) and both round to the
          // 0 that the single-chunk case needs
          sequence(lit(0), greatest(lit(0),
            ((size($"s") - (Size - Stride + 1)) / Stride).cast("int"))),
          k => array_join(slice($"s", k * Stride + 1, lit(Size)), " "))))
      .select($"doc_id", $"pos".cast("int").as("chunk_id"),
        ($"pos" * Stride + 1).cast("int").as("chunk_start"),
        least(lit(Size), size($"s") - $"pos" * Stride).cast("int")
          .as("chunk_len"),
        $"col".as("chunk_text"),
        sha2($"col".cast("binary"), 256).as("chunk_sha"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Corpus bigram counts, top-20 — the n-gram statistics pass of
    * corpus analysis. Adjacent-token pairs via `zip_with` over two
    * slices (narrow, codegen'd), then explode + count: shuffle carries
    * (bigram, partial count), never documents. */
  val textBigrams: CatalogEntry = CatalogEntry(
    "text_bigrams",
    """WITH t AS (SELECT string_split(text, ' ') AS s FROM documents)
      |SELECT bg, count(*)::BIGINT AS n FROM (
      |  SELECT unnest([s[i] || ' ' || s[i + 1]
      |                 for i in range(1, len(s))]) AS bg FROM t)
      |GROUP BY bg ORDER BY n DESC, bg LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    val toks = TextOps.tokens($"text")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    Tables.documents(s, d)
      .select(explode(bigrams).as("bg"))
      .groupBy($"bg")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bg".asc)
      .limit(20)
  }

  /** Frequent terms via the Misra-Gries typed Aggregator
    * (ext/HeavyHitters): fixed k-counter memory per partition and a
    * k-counter shuffle — the sketch alternative to `text_wordcount`'s
    * vocabulary-sized exact shuffle. Sketch weights are
    * order-dependent lower bounds → rows-only check; the presence and
    * error-bound guarantees are asserted in HeavyHittersSpec. */
  val heavyHittersMg: CatalogEntry = CatalogEntry.noOracle(
    "heavy_hitters_mg") { (s, d) =>
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens($"text")).as("term"))
      .as[String]
    toks.select(graft.ext.HeavyHitters.sketch(40).toColumn)
      .toDF("hits")
      .select(explode($"hits").as("h"))
      .select($"h.item".as("term"), $"h.weight".as("weight_lb"))
      .orderBy($"weight_lb".desc, $"term".asc)
  }

  /** TWO-PASS exact heavy hitters — the production form of the MG
    * sketch, and the entry that puts a FULL ORACLE on it: pass 1 runs
    * the fixed-memory Misra-Gries Aggregator (capacity 40 → every term
    * with true count > n/40 is guaranteed in the candidate set — the
    * superset property HeavyHittersSpec asserts); pass 2 exactly
    * recounts ONLY the ≤ 39 candidates (broadcast semi-join, map-side
    * partial count) and keeps those whose exact count clears the
    * threshold, compared in exact integers (`cnt * 40 > n`). The result
    * is therefore EXACTLY the items with count > n/40 — which is
    * precisely what the DuckDB `HAVING count(*) * 40 > n` oracle
    * computes with no sketch at all. A dropped true heavy hitter
    * (sketch bug) or an inflated candidate (recount bug) both break the
    * hash. At 100 TB: pass 1 shuffles k counters per partition (never
    * the vocabulary), pass 2 shuffles ≤ k partial counts per partition. */
  val heavyHittersExact: CatalogEntry = CatalogEntry(
    "heavy_hitters_exact",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |tot AS (SELECT count(*)::BIGINT AS n FROM tok)
      |SELECT term, count(*)::BIGINT AS cnt
      |FROM tok, tot
      |GROUP BY term, tot.n
      |HAVING count(*) * 40 > tot.n
      |ORDER BY cnt DESC, term""".stripMargin) { (s, d) =>
    import s.implicits._
    val K = 40
    val toks = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select(explode(TextOps.tokens($"text")).as("term"))
    val candidates = toks.as[String]
      .select(graft.ext.HeavyHitters.sketch(K).toColumn)
      .toDF("hits")
      .select(explode($"hits").as("h"))
      .select($"h.item".as("term"))
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(candidates), Seq("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where($"cnt" * K > $"n")
      .select($"term", $"cnt")
      .orderBy($"cnt".desc, $"term")
  }

  /** Corpus normalization (the canonical pre-dedup cleanup): lowercase,
    * strip digits, collapse whitespace runs, trim — all codegen'd
    * string expressions fused into the scan. Emits a before/after
    * change flag and the normalized sha-256 so downstream exact dedup
    * can run on canonical content. */
  val textNormalize: CatalogEntry = CatalogEntry(
    "text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
      |       ' +', ' ', 'g')) AS norm_text,
      |  (trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
      |        ' +', ' ', 'g')) <> text) AS changed,
      |  sha256(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
      |         ' +', ' ', 'g'))) AS norm_sha
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val norm = trim(regexp_replace(
      regexp_replace(lower($"text"), "[0-9]+", ""), " +", " "))
    Tables.documents(s, d)
      .select($"doc_id", norm.as("norm_text"),
        (norm =!= $"text").as("changed"),
        sha2(norm.cast("binary"), 256).as("norm_sha"))
      .orderBy($"doc_id")
  }

  /** MinHash + LSH banding with a PORTABLE hash (md5 prefix as a
    * 60-bit integer, sha256-prefix band digests): the same
    * shingle → k-min-signature → banded-digest pipeline as
    * `dedup_minhash_lsh`, with every stage engine-replayable — and
    * since the Spark side is the NATIVE single-pass kernel
    * (`minhash_bands_md5`, sharing the distinct-shingle/min/band
    * structure with the production `minhash_bands`), a green row here
    * is a cross-engine DuckDB check of the production kernel pipeline
    * itself, not just of a column re-formulation. The production path
    * keeps xxhash64 (several times cheaper per shingle). */
  val dedupMinhashPortable: CatalogEntry = {
    val k = 8
    val mins = (0 until k).map(i =>
      s"""    min(('0x' || substring(md5(sh || '#$i'), 1, 15))::BIGINT) AS mh$i""")
      .mkString(",\n")
    val bands = (0 until k / 2).map(j =>
      s"""  SELECT doc_id, $j AS band,
         |    mh${2 * j}::VARCHAR || '_' || mh${2 * j + 1}::VARCHAR AS pair
         |  FROM h""".stripMargin).mkString("\n  UNION ALL\n")
    CatalogEntry(
      "dedup_minhash_portable",
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([substring(text, i, 3)
         |                          for i in range(1, length(text) - 1)])) AS sh
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |$mins
         |  FROM sh GROUP BY doc_id),
         |b AS (
         |$bands)
         |SELECT doc_id, band::INT AS band,
         |  substring(sha256(pair), 1, 16) AS band_sha
         |FROM b ORDER BY doc_id, band""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select($"doc_id", posexplode(
          call_function("minhash_bands_md5", $"text", lit(k), lit(3)))
          .as(Seq("band", "band_sha")))
        .orderBy($"doc_id", $"band")
    }
  }

  // ---- shared minhash-surface builders ----------------------------------
  // One definition of each surface, used by dedup_minhash_oph,
  // dedup_bbit_minhash AND the dedup_oph_vs_khash agreement census, so
  // the census always measures exactly the surfaces the entries deploy
  // (a densification or banding change here moves all three together).

  /** Word-3-gram CTE prefix (dd/tt/gr) shared by the OPH and k-hash
    * minhash SQL replays. */
  private def gramCtesSql: String =
    """dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
      |gr AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
      |                         for i in range(1, len(toks) - 1)]) AS g
      |  FROM tt WHERE len(toks) >= 3)""".stripMargin

  /** OPH bin mins: one unsalted md5 per gram, bin = h mod k. */
  private def ophMinsSql(k: Int): String = (0 until k).map(j =>
    s"    min(CASE WHEN h % $k = $j THEN h END) AS m$j").mkString(",\n")

  /** OPH rotation densification: empty bin j borrows the nearest
    * non-empty bin clockwise with a +t offset. */
  private def ophDensSql(k: Int): String = (0 until k).map { j =>
    val terms = s"m$j" +: (1 until k).map(t => s"m${(j + t) % k} + $t")
    s"    coalesce(${terms.mkString(", ")}) AS d$j"
  }.mkString(",\n")

  /** k/2 bands × 2 rows over the densified OPH values (FROM dns). */
  private def ophBandsSql(k: Int): String = (0 until k / 2).map(j =>
    s"""  SELECT doc_id, $j AS band,
       |    d${2 * j}::VARCHAR || '_' || d${2 * j + 1}::VARCHAR AS sig
       |  FROM dns""".stripMargin).mkString("\n  UNION ALL\n")

  /** k independent salted-md5 minhashes (the `minhash_words_md5`
    * kernel's SQL replay). */
  private def khashMinsSql(k: Int): String = (0 until k).map(i =>
    s"""    min(('0x' || substring(md5(g || '#$i'), 1, 15))::BIGINT) AS mh$i""")
    .mkString(",\n")

  /** k/2 bands × 2 rows over the k-hash minhash columns. */
  private def khashBandsSql(k: Int, from: String): String =
    (0 until k / 2).map(j =>
      s"""  SELECT doc_id, $j AS band,
         |    mh${2 * j}::VARCHAR || '_' || mh${2 * j + 1}::VARCHAR AS sig
         |  FROM $from""".stripMargin).mkString("\n  UNION ALL\n")

  /** Spread (doc_id, text) input for the minhash surfaces. */
  private def gramInput(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.spreadScan(Tables.documents(s, d).where($"text".isNotNull)
      .select($"doc_id", $"text"))
  }

  /** OPH (doc_id, band, sig) rows via the row-local `minhash_oph_md5`
    * kernel — one call per doc: no gram explode, no k-conditional-min
    * hash-aggregate exchange, densification inside the kernel.
    * Bit-exactness with the explode + k-conditional-mins +
    * coalesce-densification column formulation is pinned by
    * SketchExprSpec. Why not the column form (r18, executing the r17
    * verdict items 1-2): beyond the gram-row explode it pays, its
    * md5-dense generated code re-seeded the r15 JIT-pollution
    * mechanism — the round it joined the sweep, the portable-md5
    * family re-elevated 1.5-1.7x and four unrelated entries read
    * 2.3-2.8x with no code change (BASELINE.md r18 attribution). The
    * kernel returns the EMPTY array for docs with < n tokens — the
    * same docs the SQL replay's `len(toks) >= 3` guard drops. */
  private def ophBandRows(spread: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spread.sparkSession)
    // token-count guard, not size(ds) — a filter on the kernel's own
    // output pushes to the scan with the kernel inlined and doubles
    // the md5 pass (r22; identical row set — the kernel goes empty
    // exactly below 3 tokens, and size(split) = 1 + spaces = its nTok)
    val dns = spread
      .where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        call_function("minhash_oph_md5", col("text"), lit(k), lit(3))
          .as("ds"))
    dns.select(col("doc_id"), posexplode(array((0 until k / 2).map(j =>
        concat_ws("_",
          element_at(col("ds"), 2 * j + 1).cast("string"),
          element_at(col("ds"), 2 * j + 2).cast("string"))): _*))
      .as(Seq("band", "sig")))
  }

  /** k-hash (doc_id, band, sig) rows over the kernel's signature
    * arrays. */
  private def khashBandRows(mh: DataFrame, k: Int): DataFrame =
    mh.select(col("doc_id"), posexplode(array(
      (0 until k / 2).map(j => concat_ws("_",
        element_at(col("mhs"), 2 * j + 1).cast("string"),
        element_at(col("mhs"), 2 * j + 2).cast("string"))): _*))
      .as(Seq("band", "sig")))

  /** Distinct (a < b) candidate pairs from a (doc_id, band, sig)
    * surface — the banded equi-join, never all-pairs. */
  private def bandPairs(rows: DataFrame): DataFrame =
    rows.as("x").join(rows.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

  /** ONE-PERMUTATION HASHING with rotation densification (Li, Owen &
    * Zhang NIPS'12; Shrivastava & Li ICML'14): ONE md5 per gram
    * instead of k — each gram's single 60-bit hash selects bin
    * h mod 16 and competes for that bin's min; empty bins borrow the
    * nearest non-empty bin clockwise with a +t offset (the
    * densification that restores LSH-ability). Emits the same
    * (doc_id, band, band_sha) 8-band × 2-row surface as
    * `dedup_minhash_portable`, so banding quality is directly
    * comparable — [[dedupOphVsKhash]] gates the actual agreement
    * (~76% candidate-set Jaccard vs the k-hash surface at 1/16th the
    * hashing cost).
    *
    * Scale shape (the papers' point): minhashing cost drops from
    * k hashes per gram to ONE — at 100 TB the signature pass is
    * hash-bound, so this is a ~k× scan-CPU reduction. The plan is one
    * row-local `minhash_oph_md5` kernel call per doc (hashing, bin
    * mins, and densification in a single arrayless pass — zero extra
    * rows, zero exchanges before the band equi-join); banding is
    * column arithmetic over the returned k-array. r18 note: the first
    * cut was a gram-explode + 16-conditional-min column formulation —
    * correct, but its md5-dense generated code re-seeded the r15
    * JIT-pollution mechanism across the shared bench session
    * (BASELINE.md r18 attribution); [[ophBandRows]] now deploys the
    * kernel and SketchExprSpec pins bit-equality to the column form. */
  val dedupMinhashOph: CatalogEntry = {
    val k = 16
    CatalogEntry(
      "dedup_minhash_oph",
      s"""WITH $gramCtesSql,
         |hh AS (SELECT doc_id,
         |         ('0x' || substring(md5(g), 1, 15))::BIGINT AS h FROM gr),
         |mns AS (
         |  SELECT doc_id,
         |${ophMinsSql(k)}
         |  FROM hh GROUP BY doc_id),
         |dns AS (
         |  SELECT doc_id,
         |${ophDensSql(k)}
         |  FROM mns),
         |b AS (
         |${ophBandsSql(k)})
         |SELECT doc_id, band::INT AS band,
         |  substring(sha256(sig), 1, 16) AS band_sha
         |FROM b ORDER BY doc_id, band""".stripMargin) { (s, d) =>
      import s.implicits._
      // checkpoint barrier (the dedup_bbit_minhash pattern): pins the
      // kernel projection above the spread exchange — column pruning
      // would otherwise push it below the repartition onto the single
      // pre-exchange scan task of the one-split test parquet
      ophBandRows(gramInput(s, d).localCheckpoint(), k)
        .select($"doc_id", $"band",
          substring(sha2($"sig".cast("binary"), 256), 1, 16).as("band_sha"))
        .orderBy($"doc_id", $"band")
    }
  }

  /** OPH-vs-k-HASH CANDIDATE AGREEMENT census — the hash-gated
    * measurement behind [[dedupMinhashOph]]'s pitch: the candidate
    * pairs from the OPH 8×2 band surface against those from the
    * k = 16 independent-hash surface ([[dedupBbitMinhash]]'s banding),
    * as one row of set algebra (each side's count, the intersection,
    * and the exact-integer Jaccard). On this corpus OPH recovers
    * ~76-80% of the k-hash candidate set at 1/16th the hashing cost —
    * the number a pipeline owner trades off, gated so a densification
    * or banding regression moves it and fails the hash check.
    *
    * Scale shape: both surfaces are the entries' own scale-safe plans
    * (row-local kernel / one gram pass + banded equi-joins, never
    * all-pairs); the census adds one FULL OUTER JOIN of two
    * duplicate-sized pair sets and a 1-row aggregate. */
  val dedupOphVsKhash: CatalogEntry = {
    val k = 16
    CatalogEntry(
      "dedup_oph_vs_khash",
      s"""WITH $gramCtesSql,
         |hkh AS (
         |  SELECT doc_id,
         |${khashMinsSql(k)}
         |  FROM gr GROUP BY doc_id),
         |bkh AS (
         |${khashBandsSql(k, "hkh")}),
         |pkh AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bkh x JOIN bkh y ON x.band = y.band AND x.sig = y.sig
         |                        AND x.doc_id < y.doc_id),
         |hh AS (SELECT doc_id,
         |         ('0x' || substring(md5(g), 1, 15))::BIGINT AS h FROM gr),
         |mns AS (
         |  SELECT doc_id,
         |${ophMinsSql(k)}
         |  FROM hh GROUP BY doc_id),
         |dns AS (
         |  SELECT doc_id,
         |${ophDensSql(k)}
         |  FROM mns),
         |boph AS (
         |${ophBandsSql(k)}),
         |poph AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM boph x JOIN boph y ON x.band = y.band AND x.sig = y.sig
         |                          AND x.doc_id < y.doc_id),
         |u AS (
         |  SELECT coalesce(k.a, o.a) AS a, coalesce(k.b, o.b) AS b,
         |    CASE WHEN k.a IS NOT NULL THEN 1 ELSE 0 END AS in_k,
         |    CASE WHEN o.a IS NOT NULL THEN 1 ELSE 0 END AS in_o
         |  FROM pkh k FULL OUTER JOIN poph o ON k.a = o.a AND k.b = o.b)
         |SELECT sum(in_k)::BIGINT AS n_khash, sum(in_o)::BIGINT AS n_oph,
         |  sum(in_k * in_o)::BIGINT AS n_both,
         |  CASE WHEN count(*) > 0 THEN
         |    ((1000000 * sum(in_k * in_o)) // count(*))::BIGINT
         |  END AS jaccard_ppm
         |FROM u""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val spread = gramInput(s, d).localCheckpoint()
      // k-hash surface: exactly dedup_bbit_minhash's kernel + bands
      // token-count guard, not size(mhs) — a filter on the kernel's
      // output re-inlines the kernel into the pushed scan condition
      // and doubles the md5 pass (see dedup_layer_agreement, r22)
      val mh = spread
        .where(size(split($"text", " ")) >= 3)
        .select($"doc_id",
          call_function("minhash_words_md5", $"text", lit(k), lit(3))
            .as("mhs"))
      val pkh = bandPairs(khashBandRows(mh, k)).withColumn("in_k", lit(1L))
      // OPH surface: exactly dedup_minhash_oph's pipeline
      val poph = bandPairs(ophBandRows(spread, k)).withColumn("in_o", lit(1L))
      pkh.join(poph, Seq("a", "b"), "full_outer")
        .select(coalesce($"in_k", lit(0L)).as("in_k"),
          coalesce($"in_o", lit(0L)).as("in_o"))
        .agg(sum($"in_k").as("n_khash"), sum($"in_o").as("n_oph"),
          sum($"in_k" * $"in_o").as("n_both"),
          // empty-union zero-guard (r17 ADVICE): on a corpus where both
          // band surfaces produce no candidate pairs, count(*) = 0 —
          // guard to NULL on both engines instead of dividing
          expr("""CASE WHEN count(*) > 0 THEN
            |  (1000000L * sum(in_k * in_o)) div count(*) END""".stripMargin)
            .as("jaccard_ppm"))
    }
  }

  /** b-BIT MINWISE HASHING (Li & König, WWW 2010): store only the
    * lowest b = 2 bits of each of k = 16 word-3-gram minhashes and
    * estimate resemblance from b-bit matches with the collision
    * correction — E[match] = C + (1−C)·R with C = 1/2^b, so
    * R̂ = (m/k − 1/4)/(3/4), emitted as the exact integer
    * `greatest(0, (10⁶·(4m − k)) div 3k)` ppm. The entry scores every
    * banded candidate pair BOTH ways (full 60-bit match count vs
    * 2-bit match count) so the b-bit estimator's error against the
    * full estimator is measurable row by row — the evidence for
    * shipping 4-byte signatures.
    *
    * Scale shape (the paper's point): the stored/shuffled signature
    * is k·b = 32 bits per doc instead of k·64 = 1024 — a 32×
    * reduction of the dedup index's memory/network footprint at
    * equal k. Candidates here still come from the full-width 8-band ×
    * 2-row equi-join (never all-pairs; identical candidate set, so
    * the comparison isolates the estimator), signatures are one
    * row-local `minhash_words_md5` kernel call per doc, and scoring
    * is a row-local zip over the two 16-long arrays on the
    * band-bounded pair rows. */
  val dedupBbitMinhash: CatalogEntry = {
    val k = 16
    val fullm = (0 until k)
      .map(i => s"CASE WHEN ha.mh$i = hb.mh$i THEN 1 ELSE 0 END")
      .mkString(" +\n    ")
    val bbitm = (0 until k)
      .map(i => s"CASE WHEN (ha.mh$i & 3) = (hb.mh$i & 3) THEN 1 ELSE 0 END")
      .mkString(" +\n    ")
    CatalogEntry(
      "dedup_bbit_minhash",
      s"""WITH $gramCtesSql,
         |h AS (
         |  SELECT doc_id,
         |${khashMinsSql(k)}
         |  FROM gr GROUP BY doc_id),
         |b AS (
         |${khashBandsSql(k, "h")}),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM b x JOIN b y ON x.band = y.band AND x.sig = y.sig
         |                    AND x.doc_id < y.doc_id)
         |SELECT p.doc_a, p.doc_b,
         |  ($fullm)::BIGINT AS full_match,
         |  ($bbitm)::BIGINT AS bbit_match,
         |  ((1000000 * ($fullm)) // $k)::BIGINT AS r_full_ppm,
         |  greatest(0, (1000000 * (4 * ($bbitm) - $k)) // (3 * $k))::BIGINT
         |    AS r_bbit_ppm
         |FROM pairs p
         |JOIN h ha ON ha.doc_id = p.doc_a
         |JOIN h hb ON hb.doc_id = p.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // spreadScan + checkpoint BARRIER: k=16 md5 per gram is the
      // densest kernel in the dedup family and the test-SF parquet is
      // a single split. A bare spread is not enough — column pruning
      // pushes the kernel projection BELOW the repartition (fewer
      // shuffle bytes), putting all the md5 work back on the one
      // pre-exchange task; checkpointing the spread rows first pins
      // the kernel above the 32-way split. The second checkpoint
      // stops mh's THREE consumers (band rows + both scoring joins)
      // from re-evaluating the kernel.
      val spread = gramInput(s, d).localCheckpoint()
      val mh = spread
        .select($"doc_id",
          call_function("minhash_words_md5", $"text", lit(k), lit(3))
            .as("mhs"))
        .where(size($"mhs") > 0)
        .localCheckpoint()
      val pairs = bandPairs(khashBandRows(mh, k))
        .select($"a".as("doc_a"), $"b".as("doc_b"))
      pairs
        .join(mh.select($"doc_id".as("doc_a"), $"mhs".as("ma")), "doc_a")
        .join(mh.select($"doc_id".as("doc_b"), $"mhs".as("mb")), "doc_b")
        .select($"doc_a", $"doc_b",
          expr("cast(size(filter(zip_with(ma, mb, (x, y) -> x = y)," +
            " v -> v)) as bigint)").as("full_match"),
          expr("cast(size(filter(zip_with(ma, mb," +
            " (x, y) -> (x & 3L) = (y & 3L)), v -> v)) as bigint)")
            .as("bbit_match"))
        .select($"doc_a", $"doc_b", $"full_match", $"bbit_match",
          expr(s"(1000000L * full_match) div $k").as("r_full_ppm"),
          expr(s"greatest(0L, (1000000L * (4L * bbit_match - $k))" +
            s" div ${3 * k})").as("r_bbit_ppm"))
        .orderBy($"doc_a", $"doc_b")
    }
  }

  /** SimHash with the portable md5-prefix token hash, via the native
    * `simhash63_md5` kernel — the identical vote/assemble machinery to
    * the production `simhash63` (the hash's top 3 bits are always
    * clear, which both engines reproduce), so the production kernel's
    * fingerprint algorithm gets a cross-engine DuckDB hash check. The
    * production entry keeps xxhash64. */
  val textSimhashPortable: CatalogEntry = {
    val bits = TextOps.SimhashBits
    val sums = (0 until bits).map(i =>
      s"""    sum(CASE WHEN (h & (1::BIGINT << $i)) != 0
         |        THEN 1 ELSE -1 END) AS s$i""".stripMargin).mkString(",\n")
    val assemble = (0 until bits).map(i =>
      s"(CASE WHEN s$i >= 0 THEN (1::BIGINT << $i) ELSE 0 END)")
      .mkString(" +\n  ")
    CatalogEntry(
      "text_simhash_portable",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
         |  FROM tok),
         |v AS (
         |  SELECT doc_id,
         |$sums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id,
         |  $assemble AS simhash
         |FROM v ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        // null text: the explode/unnest formulations drop the row in
        // both engines; filter the input column (scan-pushable, and the
        // kernel stays a single per-row evaluation)
        .where($"text".isNotNull)
        .select($"doc_id",
          call_function("simhash63_md5", TextOps.tokens($"text"))
            .as("simhash"))
        .orderBy($"doc_id")
    }
  }

  /** Winnowing with the portable md5-prefix k-gram hash, via the
    * native `winnow_fps_md5` kernel — the identical k-gram →
    * window-min-deque → distinct pipeline as the production
    * `winnow_fps`, DuckDB-replayed hash-for-hash, so the MOSS kernel
    * itself is oracle-verified cross-engine. Production keeps
    * xxhash64. */
  val docWinnowPortable: CatalogEntry = CatalogEntry(
    "doc_winnow_portable",
    """WITH g AS (
      |  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
      |    SELECT doc_id,
      |      unnest([{'pos': i,
      |               'h': ('0x' || substring(md5(substring(text, i, 5)), 1, 15))::BIGINT}
      |              for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS u
      |    FROM documents)),
      |w AS (
      |  SELECT doc_id,
      |    min(h) OVER win AS fp,
      |    count(*) OVER win AS wn
      |  FROM g
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
      |f AS (SELECT DISTINCT doc_id, fp FROM w WHERE wn = 4),
      |p AS (SELECT doc_id, count(*)::BIGINT AS n_fingerprints,
      |        min(fp) AS min_fp, max(fp) AS max_fp
      |      FROM f GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(p.n_fingerprints, 0)::BIGINT AS n_fingerprints,
      |  p.min_fp, p.max_fp
      |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select($"doc_id",
        call_function("winnow_fps_md5", $"text", lit(5), lit(4)).as("fps"))
      .select($"doc_id",
        // profile semantics: every doc reports a row; short docs (< one
        // full window) and null text report 0 fingerprints — the oracle
        // LEFT JOINs back to documents so both engines agree
        coalesce(size($"fps").cast("long"), lit(0L)).as("n_fingerprints"),
        when(size($"fps") > 0, element_at($"fps", 1)).as("min_fp"),
        when(size($"fps") > 0, element_at($"fps", -1)).as("max_fp"))
      .orderBy($"doc_id")
  }

  /** SimHash NEAR-DUP PAIR SET with the portable md5 kernel — the
    * missing cross-engine gate on the pair-emitting machinery itself
    * (the production `dedup_simhash_hamming` publishes the band index;
    * its pair behavior was spec-only until this twin). The corpus is
    * augmented with deterministic planted copies — exact duplicates
    * (`doc_id % 17`, Hamming 0) and one-token-appended near-copies
    * (`doc_id % 23`, small nonzero Hamming) — so the gate is
    * NON-VACUOUS: the oracle replays fingerprint → 4-band split → band
    * equi-join → `bit_count(xor) <= 3` confirm hash-for-hash in DuckDB
    * (the banding also surfaces the corpus' natural near-dups). The
    * production path keeps xxhash64; this twin is verification
    * overhead, excluded from the bench production subtotal. */
  val dedupSimhashPortable: CatalogEntry = {
    val bits = TextOps.SimhashBits
    val sums = (0 until bits).map(i =>
      s"""    sum(CASE WHEN (h & (1::BIGINT << $i)) != 0
         |        THEN 1 ELSE -1 END) AS s$i""".stripMargin).mkString(",\n")
    val assemble = (0 until bits).map(i =>
      s"(CASE WHEN s$i >= 0 THEN (1::BIGINT << $i) ELSE 0 END)")
      .mkString(" +\n  ")
    CatalogEntry(
      "dedup_simhash_portable",
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 17 = 0
         |  UNION ALL
         |  SELECT doc_id + 200000, text || ' graftdup' FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 23 = 0),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM aug),
         |h AS (SELECT doc_id,
         |        ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
         |      FROM tok),
         |v AS (
         |  SELECT doc_id,
         |$sums
         |  FROM h GROUP BY doc_id),
         |f AS (SELECT doc_id,
         |  $assemble AS fp
         |  FROM v),
         |b AS (
         |  SELECT doc_id, fp, band, ((fp >> (16 * band)) & 65535) AS bval
         |  FROM f, (SELECT unnest([0, 1, 2, 3]) AS band)),
         |p AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |    bit_count(xor(a.fp, c.fp))::INT AS hamming
         |  FROM b a JOIN b c ON a.band = c.band AND a.bval = c.bval
         |    AND a.doc_id < c.doc_id
         |  WHERE bit_count(xor(a.fp, c.fp)) <= 3)
         |SELECT id_a, id_b, hamming FROM p
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).where($"text".isNotNull)
      val aug = docs.select($"doc_id", $"text")
        .unionByName(docs.where($"doc_id" % 17 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .unionByName(docs.where($"doc_id" % 23 === 0)
          .select(($"doc_id" + 200000).as("doc_id"),
            concat($"text", lit(" graftdup")).as("text")))
      Dedup.simhashNearDupPairs(aug, "doc_id", "text", maxHamming = 3,
        kernel = "simhash63_md5")
        .orderBy($"id_a", $"id_b")
    }
  }

  /** Per-document MISRA-GRIES replay with a deterministic fold order —
    * the cross-engine gate on the MG state machine itself. The
    * corpus-level `heavy_hitters_mg` Aggregator is partition-order-
    * dependent by nature (weights are lower bounds whose exact values
    * depend on merge order), so it can never hash-match a serial
    * replay; THIS twin folds each document's own token sequence —
    * a defined order both engines share — through the identical
    * update rule (increment if tracked; insert if < k−1 counters;
    * else decrement-all-drop-zeros), as a row-local codegen'd
    * `aggregate` HOF on the Spark side and a recursive-CTE state
    * machine in DuckDB. A green hash proves every branch of the MG
    * update agrees token-for-token across engines — the same kernel
    * the Aggregator's reduce runs per partition at 100 TB. k = 4
    * (up to 3 tracked items/doc). */
  val heavyHittersMgPortable: CatalogEntry = CatalogEntry(
    "heavy_hitters_mg_portable",
    """WITH RECURSIVE
      |tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |mg(doc_id, i, n, state) AS (
      |  SELECT doc_id, 1, len(ts), CAST([] AS STRUCT(item VARCHAR, w BIGINT)[])
      |  FROM tok
      |  UNION ALL
      |  SELECT m.doc_id, m.i + 1, m.n,
      |    CASE
      |      WHEN list_contains(list_transform(m.state, y -> y.item), t.ts[m.i])
      |        THEN list_transform(m.state, y -> CASE WHEN y.item = t.ts[m.i]
      |              THEN struct_pack(item := y.item, w := y.w + 1) ELSE y END)
      |      WHEN len(m.state) < 3
      |        THEN list_append(m.state,
      |               struct_pack(item := t.ts[m.i], w := 1::BIGINT))
      |      ELSE list_filter(list_transform(m.state, y ->
      |             struct_pack(item := y.item, w := y.w - 1)), y -> y.w > 0)
      |    END
      |  FROM mg m JOIN tok t USING (doc_id) WHERE m.i <= m.n),
      |fin AS (SELECT doc_id, unnest(state) AS u FROM mg WHERE i = n + 1)
      |SELECT doc_id, u.item AS item, u.w AS weight
      |FROM fin ORDER BY doc_id, weight DESC, item""".stripMargin) { (s, d) =>
    import s.implicits._
    val k = 4
    val mgState = aggregate(
      TextOps.tokens($"text"),
      array().cast("array<struct<item:string,w:bigint>>"),
      (st, t) =>
        when(array_contains(transform(st, y => y("item")), t),
          transform(st, y =>
            when(y("item") === t,
              struct(y("item").as("item"), (y("w") + 1L).as("w")))
              .otherwise(y)))
          .when(size(st) < k - 1,
            concat(st, array(struct(t.as("item"), lit(1L).as("w")))))
          .otherwise(filter(
            transform(st, y =>
              struct(y("item").as("item"), (y("w") - 1L).as("w"))),
            y => y("w") > 0)))
    Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", explode(mgState).as("hit"))
      .select($"doc_id", $"hit.item".as("item"), $"hit.w".as("weight"))
      .orderBy($"doc_id", $"weight".desc, $"item")
  }

  /** Train/eval CONTAMINATION detection — the decontamination step of an
    * LLM training-data pipeline: flag corpus documents sharing any
    * 13-token n-gram with an eval/benchmark set (the overlap rule the
    * GPT-3/PaLM data cards describe). Here the eval set is the
    * deterministic `doc_id % 101 = 0` slice of the corpus standing in
    * for a benchmark suite; eval docs self-flag by construction and any
    * duplicated/plagiarized doc flags with them (at sf0.1 the corpus'
    * duplicated docs produce real non-eval hits).
    *
    * 100 TB shape: the eval side is tiny (benchmark suites are MBs) —
    * its distinct n-gram set is BROADCAST, so the corpus is scanned
    * once with NO corpus-wide shuffle: per-doc grams explode, survive
    * the broadcast inner join only on a hit (rare by construction in a
    * clean corpus), and only those hits reach the per-doc count — the
    * one exchange carries flagged (doc_id, gram) pairs, not the corpus.
    * Production would hash grams to int64 (xxhash64) to shrink the
    * broadcast ~10x; raw gram TEXT is kept here so the DuckDB oracle
    * replays the pipeline verbatim. */
  val decontamNgramOverlap: CatalogEntry = CatalogEntry(
    "decontam_ngram_overlap",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                   for i in range(1, greatest(len(toks) - 11, 1))]) AS gs
      |  FROM t),
      |e AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 101 = 0),
      |h AS (SELECT doc_id, unnest(gs) AS gram FROM g)
      |SELECT h.doc_id, count(*)::BIGINT AS n_hit
      |FROM h JOIN e ON h.gram = e.gram
      |GROUP BY h.doc_id
      |ORDER BY h.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    Dedup.ngramOverlapCounts(docs, docs.where($"doc_id" % 101 === 0),
        "doc_id", "text", n = 13)
      .orderBy($"doc_id")
  }

  /** PII detection + scrubbing — the C4-style regex cleaning pass of a
    * training-data pipeline: count and redact emails / IPv4s / phone
    * numbers per document. The sf corpus carries no PII, so the entry
    * first INJECTS deterministic PII into id-selected docs (1/7 emails,
    * 1/11 IPs, 1/13 phones — pure arithmetic both engines replay), then
    * detects and scrubs it; the oracle hash covers the per-class counts
    * AND the md5 of the scrubbed text, so a green run proves the
    * patterns matched the same spans and the redaction byte-for-byte
    * agrees cross-engine. Patterns live in [[TextOps]] restricted to
    * the Java/RE2-common regex subset. 100 TB shape: narrow per-row
    * expressions, codegen'd, no UDF, no shuffle before the final
    * determinism sort. */
  val piiScrub: CatalogEntry = CatalogEntry(
    "pii_scrub",
    """WITH aug AS (
      |  SELECT doc_id,
      |    text
      |      || CASE WHEN doc_id % 7 = 0
      |           THEN ' contact user' || doc_id || '@mail.example.com'
      |           ELSE '' END
      |      || CASE WHEN doc_id % 11 = 0
      |           THEN ' from 10.0.' || (doc_id % 200) || '.1' ELSE '' END
      |      || CASE WHEN doc_id % 13 = 0
      |           THEN ' call 555-867-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
      |           ELSE '' END AS t
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
      |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
      |    len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phones,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
      |  FROM aug)
      |SELECT doc_id, n_emails, n_ips, n_phones, md5(scrubbed) AS scrub_md5
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val aug = concat($"text",
      when($"doc_id" % 7 === 0, concat(lit(" contact user"),
        $"doc_id".cast("string"), lit("@mail.example.com")))
        .otherwise(lit("")),
      when($"doc_id" % 11 === 0, concat(lit(" from 10.0."),
        ($"doc_id" % 200).cast("string"), lit(".1"))).otherwise(lit("")),
      when($"doc_id" % 13 === 0, concat(lit(" call 555-867-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", aug.as("t"))
      .select($"doc_id",
        TextOps.countMatches($"t", TextOps.EmailRe).cast("long").as("n_emails"),
        TextOps.countMatches($"t", TextOps.Ipv4Re).cast("long").as("n_ips"),
        TextOps.countMatches($"t", TextOps.PhoneRe).cast("long").as("n_phones"),
        md5(TextOps.scrubPii($"t").cast("binary")).as("scrub_md5"))
      .orderBy($"doc_id")
  }

  /** Duplicate CLUSTERING — the closure step after any pair-emitting
    * near-dup detector: if A~B and B~C, all three are one group and one
    * survivor is kept. Pairs here are "docs sharing any 13-token
    * n-gram" via [[graft.ext.Dedup.sharedGramPairs]], which applies the
    * standard hot-gram guard: grams with document frequency > 50 are
    * dropped before pair expansion, bounding edge output at O(50·f)
    * where the raw gram self-join is O(f²) per gram — the difference
    * between a plan and a scale-killer when one boilerplate sentence
    * appears in 10⁶ docs. Clusters are connected components over that
    * pair graph via [[graft.ext.Graph.connectedComponents]] — iterative
    * min-label propagation, one edges⋈labels shuffle per round, rounds
    * = cluster diameter (2-3 for real dup clusters). Output: every
    * clustered doc with its component (= smallest member id, the
    * canonical survivor) and the cluster size. The oracle replays the
    * closure as a DuckDB recursive CTE — an independent fixpoint
    * formulation with the SAME df ≤ 50 cap in its edge CTE, so
    * agreement checks the propagation, not the implementation. */
  val dedupClusterCc: CatalogEntry = CatalogEntry(
    "dedup_cluster_cc",
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                          for i in range(1, greatest(len(toks) - 11, 1))])) AS gram
      |  FROM t),
      |rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 50),
      |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      |      WHERE a.gram IN (SELECT gram FROM rare)),
      |r(id, lbl) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.id),
      |c AS (SELECT id AS doc_id, min(lbl) AS component FROM r GROUP BY id)
      |SELECT doc_id, component,
      |  (count(*) OVER (PARTITION BY component))::BIGINT AS n_members
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val edges = Dedup.sharedGramPairs(
      Tables.documents(s, d), "doc_id", "text", n = 13, maxDf = 50)
    Graph.connectedComponents(edges, "src", "dst")
      .withColumnRenamed("id", "doc_id")
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy($"component")))
      .orderBy($"doc_id")
  }

  /** The same dup-cluster closure through the PATH-HALVING component
    * operator ([[graft.ext.Graph.connectedComponentsStar]]) — the
    * variant whose round count is O(log n) instead of cluster diameter,
    * for corpora whose duplicate graphs chain (serial near-copies of
    * near-copies). Shares `dedup_cluster_cc`'s RECURSIVE-CTE oracle
    * verbatim: the driver hash-gates that BOTH component algorithms
    * land on the identical min-label clustering. */
  val dedupClusterCcStar: CatalogEntry = CatalogEntry(
    "dedup_cluster_cc_star",
    dedupClusterCc.oracle.get) { (s, d) =>
    import s.implicits._
    val edges = Dedup.sharedGramPairs(
      Tables.documents(s, d), "doc_id", "text", n = 13, maxDf = 50)
    Graph.connectedComponentsStar(edges, "src", "dst")
      .withColumnRenamed("id", "doc_id")
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy($"component")))
      .orderBy($"doc_id")
  }

  /** Bloom-prefiltered decontamination — the same train/eval overlap
    * count as `decontam_ngram_overlap`, but the corpus grams first pass
    * a BLOOM FILTER of the eval grams before the exact confirm join.
    * The bloom is built distributed with Spark's own runtime-filter
    * aggregate (`bloom_agg` over xxhash64, surfaced in
    * [[graft.functions.GraftFunctions]]) — never collected to the
    * driver as a set — and probed as a scan-local predicate
    * (`bloom_might_contain`). Blooms have NO false negatives, so the
    * prefilter drops nothing real; the exact join removes the ~1% false
    * positives — the result is bit-identical to the unfiltered plan and
    * shares its oracle SQL shape.
    *
    * 100 TB shape: this is THE decontamination plan at scale — the
    * bloom is KBs where the eval distinct-gram broadcast is MBs-GBs, so
    * the per-gram probe replaces a broadcast-hash-table lookup for the
    * 99.9% of corpus grams that miss, and only bloom survivors reach
    * the join. Eval slice here is `doc_id % 97 = 0` (distinct from its
    * sibling's % 101 so the two entries can't mask each other). */
  val decontamBloomPrefilter: CatalogEntry = CatalogEntry(
    "decontam_bloom_prefilter",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                   for i in range(1, greatest(len(toks) - 11, 1))]) AS gs
      |  FROM t),
      |e AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 97 = 0),
      |h AS (SELECT doc_id, unnest(gs) AS gram FROM g)
      |SELECT h.doc_id, count(*)::BIGINT AS n_hit
      |FROM h JOIN e ON h.gram = e.gram
      |GROUP BY h.doc_id
      |ORDER BY h.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, d)
    Tables.spreadScan(docs.where($"text".isNotNull))
      .select($"doc_id", explode(Dedup.tokenNgrams($"text", 13)).as("gram"))
      .createOrReplaceTempView("graft_bloom_corpus")
    docs.where($"text".isNotNull && $"doc_id" % 97 === 0)
      .select(explode(Dedup.tokenNgrams($"text", 13)).as("gram"))
      .distinct()
      .createOrReplaceTempView("graft_bloom_eval")
    // the bloom rides in as a scalar subquery (the analyzer's required
    // shape for bloom_might_contain — the same one Spark's injected
    // runtime filters use); the predicate references only corpus
    // columns, so it pushes below the join as the prefilter
    s.sql(
      """SELECT /*+ BROADCAST(e) */ doc_id, count(*) AS n_hit
        |FROM graft_bloom_corpus c JOIN graft_bloom_eval e USING (gram)
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(gram), 100000) FROM graft_bloom_eval),
        |  xxhash64(gram))
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)
  }

  /** Sub-document dedup at segment granularity — the C4/RefinedWeb
    * paragraph-dedup rule, recast over fixed 25-token segments (this
    * corpus has no newlines to split on): any segment whose exact text
    * already occurred earlier in the corpus (first occurrence =
    * smallest (doc_id, seg_idx)) is REMOVED, and each document is
    * reassembled from its surviving segments in order. Whole-document
    * dedup misses boilerplate shared across distinct pages; this is the
    * operator that strips it. Docs that lose every segment survive with
    * n_kept = 0 and empty text (the downstream length filter's job).
    *
    * Scale shape: segmentation is row-local fan-out (sequence → slice →
    * posexplode, no token-row shuffle); first-occurrence election is
    * ONE row_number window partitioned by segment text (at 100 TB the
    * shuffle necessarily carries the segment text anyway — it is the
    * reassembly payload); reassembly is one group-by on doc_id; the
    * per-doc segment census rides the pre-explode row so the final join
    * is doc-level, never segment-level. */
  val dedupSegments: CatalogEntry = CatalogEntry(
    "dedup_segments",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS s
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |segs AS (
      |  SELECT doc_id, ((len(s) + 24) // 25)::INT AS n_segs,
      |    unnest(range(0, (len(s) + 24) // 25)) AS seg_idx, s
      |  FROM t),
      |seg2 AS (
      |  SELECT doc_id, n_segs, seg_idx::INT AS seg_idx,
      |    array_to_string(s[seg_idx * 25 + 1 : seg_idx * 25 + 25], ' ')
      |      AS seg_text
      |  FROM segs),
      |kept AS (
      |  SELECT doc_id, seg_idx, seg_text FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
      |    FROM seg2)
      |  WHERE rn = 1),
      |agg AS (
      |  SELECT doc_id, count(*)::INT AS n_kept,
      |    array_to_string(list(seg_text ORDER BY seg_idx), ' ') AS clean_text
      |  FROM kept GROUP BY doc_id),
      |perdoc AS (
      |  SELECT DISTINCT doc_id, n_segs FROM seg2)
      |SELECT p.doc_id, p.n_segs,
      |  coalesce(a.n_kept, 0)::INT AS n_kept,
      |  coalesce(a.clean_text, '') AS clean_text
      |FROM perdoc p LEFT JOIN agg a USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val Seg = 25
    val t = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", TextOps.tokens($"text").as("s"))
      .withColumn("n_segs",
        ((size($"s") + (Seg - 1)) / Seg).cast("int")) // ceil(n/25): n ≥ 1
    val seg2 = t
      .select($"doc_id", $"n_segs",
        posexplode(transform(sequence(lit(0), $"n_segs" - 1),
          k => array_join(slice($"s", k * Seg + 1, lit(Seg)), " "))))
      .select($"doc_id", $"n_segs", $"pos".cast("int").as("seg_idx"),
        $"col".as("seg_text"))
    val kept = seg2
      .withColumn("rn", row_number().over(Window
        .partitionBy($"seg_text").orderBy($"doc_id", $"seg_idx")))
      .where($"rn" === 1)
    val agg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct($"seg_idx", $"seg_text"))),
          x => x.getField("seg_text")), " ").as("clean_text"))
    t.select($"doc_id", $"n_segs")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_segs",
        coalesce($"n_kept", lit(0)).as("n_kept"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  /** Corpus vocabulary with cumulative coverage — the tokenizer-prep
    * census: global token frequencies, frequency rank, and what
    * fraction of all token occurrences the vocabulary up to each rank
    * covers (the Zipf curve a BPE vocab size is chosen from). Emits the
    * top 100 terms; cumulative coverage at rank k depends only on
    * counts at ranks ≤ k, so ranking and the running sum operate on the
    * top-100 slice alone.
    *
    * Scale shape: token counting is a partial-agg group-by (map-side
    * combine shrinks each partition to its distinct tokens before the
    * one vocab-sized exchange); the top-100 slice arrives via
    * TakeOrderedAndProject (never a global sort of the vocabulary); the
    * single-partition cumsum window then touches exactly 100 rows, and
    * the corpus-total token count joins as a broadcast one-row scalar. */
  val vocabCoverage: CatalogEntry = CatalogEntry(
    "vocab_coverage",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |counts AS (
      |  SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
      |tot AS (SELECT sum(n)::BIGINT AS t FROM counts),
      |top AS (
      |  SELECT token, n,
      |    row_number() OVER (ORDER BY n DESC, token)::INT AS rank,
      |    sum(n) OVER (ORDER BY n DESC, token
      |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      |  FROM counts)
      |SELECT token, n, rank,
      |  round(cum::DOUBLE / t::DOUBLE, 6) AS cum_frac
      |FROM top, tot WHERE rank <= 100
      |ORDER BY rank""".stripMargin) { (s, d) =>
    import s.implicits._
    val counts = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select(explode(TextOps.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum($"n").as("t"))
    val w = Window.orderBy($"n".desc, $"token")
    counts
      .orderBy($"n".desc, $"token").limit(100) // TakeOrderedAndProject
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cum",
        sum($"n").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .crossJoin(broadcast(total))
      .select($"token", $"n", $"rank",
        round($"cum".cast("double") / $"t".cast("double"), 6).as("cum_frac"))
      .orderBy($"rank")
  }

  /** Unigram-LM cross-entropy scoring — the CCNet-family quality
    * signal: train a unigram language model on the corpus itself
    * (token frequencies), then score every document by its average
    * negative log-likelihood (and perplexity). High-ppl docs are
    * gibberish/OCR noise; abnormally low-ppl docs are boilerplate —
    * both are what the quality gate trims at the tails.
    *
    * Cross-engine determinism: log-probs are `ln` of ratios of EXACT
    * integer counts (identical IEEE input → identical double, the
    * round-3 discipline) — and, round-9 advice fix, each per-token
    * log-prob is QUANTIZED to integer nano-units (`round(lp·1e9)::LONG`)
    * BEFORE the per-doc sum. A double sum is order-dependent and
    * Spark's partial-agg order differs from DuckDB's, so on a large
    * corpus `round(-sum(lp)/n, 6)` can flip on a half-ulp boundary;
    * the int64 sum is associative-commutative-EXACT in any order (doc
    * sums stay far below 2^53 for the ::DOUBLE hop back), and the
    * ≤0.5e-9-per-token quantization bias vanishes under the 1e-6
    * output rounding. ppl exponentiates the ROUNDED avg so both
    * engines exponentiate the same decimal. Scale shape: one
    * vocab-sized count exchange, the scoring join streams the token
    * fan-out against the (orders smaller) vocab side — Catalyst
    * broadcasts it when stats allow — and the per-doc aggregate is the
    * only corpus-sized shuffle. */
  val docLmScore: CatalogEntry = CatalogEntry(
    "doc_lm_score",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |vocab AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
      |tot AS (SELECT sum(n)::BIGINT AS t FROM vocab),
      |lp AS (SELECT token,
      |         round(ln(n::DOUBLE / t::DOUBLE) * 1e9, 0)::BIGINT AS lp_q
      |       FROM vocab, tot),
      |scored AS (SELECT doc_id, lp.lp_q FROM tok JOIN lp USING (token))
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  round(-(sum(lp_q)::DOUBLE / 1e9) / count(*), 6) AS avg_nll,
      |  round(exp(round(-(sum(lp_q)::DOUBLE / 1e9) / count(*), 6)), 4) AS ppl
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val tok = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("token"))
    val vocab = tok.groupBy($"token").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum($"n").as("t"))
    val lp = vocab.crossJoin(broadcast(total))
      .select($"token",
        round(log($"n".cast("double") / $"t".cast("double")) * lit(1e9), 0)
          .cast("long").as("lp_q"))
    val avgNll =
      round(-(sum($"lp_q").cast("double") / lit(1e9)) / count(lit(1)), 6)
    tok.join(lp, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        avgNll.as("avg_nll"),
        round(exp(avgNll), 4).as("ppl"))
      .orderBy($"doc_id")
  }

  /** Bigram-LM cross-entropy scoring — [[docLmScore]]'s conditional
    * upgrade: score each document under a self-trained BIGRAM model
    * with add-one (Laplace) smoothing, P(w₂|w₁) = (c(w₁w₂)+1) /
    * (c(w₁·)+V). The unigram score rewards any common-word soup; the
    * bigram score additionally punishes implausible SEQUENCES of
    * common words — the word-salad/SEO-spam signature a unigram model
    * is blind to. Same exactness discipline: log-probs are `ln` of
    * exact-integer ratios, nano-quantized per bigram BEFORE the
    * per-doc sum (order-free BIGINT), ppl exponentiates the rounded
    * average. Docs with fewer than two tokens have no bigram chain
    * and are absent from the output by construction.
    *
    * Scale shape: the context denominator c(w₁·) is reduced FROM the
    * bigram census (sum over the right word) — no second corpus
    * count; V is one distinct-count pass; the scoring join streams
    * the corpus bigram fan-out against the bigram-vocabulary table
    * (shuffle join once the vocabulary outgrows broadcast — the join
    * key is the bigram, so skew follows gram frequency and the
    * standard salting applies); the per-doc aggregate is the only
    * corpus-keyed shuffle. */
  val docLmBigramScore: CatalogEntry = CatalogEntry(
    "doc_lm_bigram_score",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |bg AS (
      |  SELECT doc_id,
      |    unnest([toks[i] || ' ' || toks[i+1]
      |            for i in range(1, len(toks))]) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |c12 AS (SELECT bigram, count(*)::BIGINT AS n12 FROM bg GROUP BY bigram),
      |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
      |         sum(n12)::BIGINT AS n1
      |       FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT token)::BIGINT AS vs FROM (
      |        SELECT unnest(string_split(text, ' ')) AS token
      |        FROM documents WHERE text IS NOT NULL AND length(text) > 0)),
      |lp AS (
      |  SELECT bigram,
      |    round(ln((n12 + 1)::DOUBLE / (n1 + vs)::DOUBLE) * 1e9, 0)::BIGINT
      |      AS lp_q
      |  FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = c1.w1, v),
      |scored AS (SELECT doc_id, lp_q FROM bg JOIN lp USING (bigram))
      |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |  round(-(sum(lp_q)::DOUBLE / 1e9) / count(*), 6) AS avg_nll,
      |  round(exp(round(-(sum(lp_q)::DOUBLE / 1e9) / count(*), 6)), 4) AS ppl
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val t = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .where(size($"toks") >= 2)
    val bg = t.select($"doc_id", explode(expr(
      "transform(sequence(1, size(toks) - 1)," +
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
      .as("bigram"))
    val c12 = bg.groupBy($"bigram").agg(count(lit(1)).as("n12"))
    val c1 = c12
      .groupBy(split($"bigram", " ").getItem(0).as("w1"))
      .agg(sum($"n12").as("n1"))
    val v = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select(explode(TextOps.tokens($"text")).as("token"))
      .agg(count_distinct($"token").as("vs"))
    val lp = c12
      .withColumn("w1", split($"bigram", " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .select($"bigram",
        round(log(($"n12" + 1).cast("double") / ($"n1" + $"vs").cast("double"))
          * lit(1e9), 0).cast("long").as("lp_q"))
    val avgNll =
      round(-(sum($"lp_q").cast("double") / lit(1e9)) / count(lit(1)), 6)
    bg.join(lp, Seq("bigram"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        avgNll.as("avg_nll"),
        round(exp(avgNll), 4).as("ppl"))
      .orderBy($"doc_id")
  }

  /** EXCESS-LOSS RANKING — the surprise GAP between the two deployed
    * LM scorers, per doc in exact integer nano-nats: bigram avg NLL
    * ([[docLmBigramScore]]'s conditional model) minus unigram avg NLL
    * ([[docLmScore]]'s frequency model), top-50 by the gap. A doc
    * whose sequences are much more surprising than its word
    * frequencies predict is either novel signal or word salad — the
    * cheap deterministic analogue of reducible-holdout-loss selection
    * (Mindermann et al., ICML 2022: prioritize points whose training
    * loss exceeds an irreducible reference loss), with the pipeline's
    * own unigram LM as the reference model. Both scoring chains are
    * nested verbatim from their entries (the measurement cannot drift
    * from the scorers), and the gap stays on the integer lattice —
    * per-doc totals of the nano-quantized log-probs, one truncating
    * division each — so the ranking is bit-stable where a
    * difference-of-rounded-doubles would not be.
    *
    * Scale shape: the two LM chains are the existing scale-safe plans
    * (vocab/bigram censuses + broadcast totals); the composite adds
    * one |docs|-row join and a TakeOrdered(50) — no window over the
    * corpus, the rank runs on the 50-row shortlist. */
  val docLmExcessRank: CatalogEntry = CatalogEntry(
    "doc_lm_excess_rank",
    """WITH dd AS (SELECT doc_id, text FROM documents
      |            WHERE text IS NOT NULL AND length(text) > 0),
      |utok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |         FROM dd),
      |uvocab AS (SELECT token, count(*)::BIGINT AS n FROM utok
      |           GROUP BY token),
      |utot AS (SELECT sum(n)::BIGINT AS t FROM uvocab),
      |ulp AS (SELECT token,
      |          round(ln(n::DOUBLE / t::DOUBLE) * 1e9, 0)::BIGINT AS lp_q
      |        FROM uvocab, utot),
      |u AS (SELECT doc_id, count(*)::BIGINT AS n_tok,
      |        -sum(lp_q)::BIGINT AS u_tot
      |      FROM utok JOIN ulp USING (token) GROUP BY doc_id),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
      |bg AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
      |                              for i in range(1, len(toks))]) AS bigram
      |       FROM t WHERE len(toks) >= 2),
      |c12 AS (SELECT bigram, count(*)::BIGINT AS n12 FROM bg
      |        GROUP BY bigram),
      |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
      |         sum(n12)::BIGINT AS n1
      |       FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT token)::BIGINT AS vs FROM utok),
      |blp AS (SELECT bigram,
      |          round(ln((n12 + 1)::DOUBLE / (n1 + vs)::DOUBLE) * 1e9, 0)
      |            ::BIGINT AS lp_q
      |        FROM c12 JOIN c1 ON string_split(bigram, ' ')[1] = c1.w1, v),
      |b AS (SELECT doc_id, count(*)::BIGINT AS n_big,
      |        -sum(lp_q)::BIGINT AS b_tot
      |      FROM bg JOIN blp USING (bigram) GROUP BY doc_id),
      |sel AS (SELECT u.doc_id, u.n_tok AS n_tokens,
      |          (u.u_tot // u.n_tok) AS u_nll_nano,
      |          (b.b_tot // b.n_big) AS b_nll_nano,
      |          (b.b_tot // b.n_big - u.u_tot // u.n_tok) AS excess_nano
      |        FROM u JOIN b USING (doc_id)
      |        ORDER BY excess_nano DESC, doc_id LIMIT 50)
      |SELECT row_number() OVER (ORDER BY excess_nano DESC, doc_id)::BIGINT
      |    AS rnk,
      |  doc_id, n_tokens, u_nll_nano, b_nll_nano, excess_nano
      |FROM sel ORDER BY rnk""".stripMargin) { (s, d) =>
    import s.implicits._
    val dd = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
    val tok = dd.select($"doc_id", explode(TextOps.tokens($"text")).as("token"))
    val vocab = tok.groupBy($"token").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum($"n").as("t"))
    val ulp = vocab.crossJoin(broadcast(total))
      .select($"token",
        round(log($"n".cast("double") / $"t".cast("double")) * lit(1e9), 0)
          .cast("long").as("lp_q"))
    val u = tok.join(ulp, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"), (-sum($"lp_q")).as("u_tot"))
    val t = dd.select($"doc_id", TextOps.tokens($"text").as("toks"))
      .where(size($"toks") >= 2)
    val bg = t.select($"doc_id", explode(expr(
      "transform(sequence(1, size(toks) - 1)," +
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
      .as("bigram"))
    val c12 = bg.groupBy($"bigram").agg(count(lit(1)).as("n12"))
    val c1 = c12
      .groupBy(split($"bigram", " ").getItem(0).as("w1"))
      .agg(sum($"n12").as("n1"))
    val v = tok.agg(count_distinct($"token").as("vs"))
    val blp = c12
      .withColumn("w1", split($"bigram", " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .select($"bigram",
        round(log(($"n12" + 1).cast("double") / ($"n1" + $"vs").cast("double"))
          * lit(1e9), 0).cast("long").as("lp_q"))
    val b = bg.join(blp, Seq("bigram"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_big"), (-sum($"lp_q")).as("b_tot"))
    val sel = u.join(b, "doc_id")
      .select($"doc_id", $"n_tok".as("n_tokens"),
        expr("u_tot div n_tok").as("u_nll_nano"),
        expr("b_tot div n_big").as("b_nll_nano"),
        expr("b_tot div n_big - u_tot div n_tok").as("excess_nano"))
      .orderBy($"excess_nano".desc, $"doc_id").limit(50)
    sel
      .withColumn("rnk", row_number()
        .over(Window.orderBy($"excess_nano".desc, $"doc_id")).cast("long"))
      .select($"rnk", $"doc_id", $"n_tokens", $"u_nll_nano", $"b_nll_nano",
        $"excess_nano")
      .orderBy($"rnk")
  }

  /** GREEDY SEQUENCE PACKING — the "fill the context window" step
    * between a curated corpus and a training run: documents are packed
    * in doc_id order into bins of at most 60 tokens; a document that
    * does not fit opens the next bin (an oversized document gets a bin
    * of its own). Emits each document's bin id and token offset within
    * the bin — the (sequence, position) a trainer would slice. The
    * budget sits INSIDE the fixture's 10-100-token doc range on
    * purpose: all three fold branches (fits / opens-bin / oversized
    * own-bin) fire on real rows, so the cross-engine replay is
    * non-vacuous for each.
    *
    * The fold is inherently sequential PER SHARD, and that is the scale
    * story: packing has no cross-shard semantics (bins never span
    * shards), so the corpus shards by source — compose the shard key
    * with a doc_id bucket to bound any hot shard — and each shard's
    * ordered fold runs row-local as a codegen'd `aggregate` HOF over
    * its sorted doc list after ONE shuffle. The HOF accumulator is
    * rebuilt per step (`concat` copies), an O(m²)-bytes-per-shard
    * cost that caps the practical shard at a few thousand docs — at
    * 100 TB pick the doc_id bucket so shards stay that size (the
    * 32-byte/doc state makes 2k-doc shards ~128 MB of copying, still
    * row-local and embarrassingly parallel). The DuckDB oracle replays
    * the identical fold as a recursive-CTE state machine, so a hash
    * match proves every branch (fits / opens-bin / oversized) agrees
    * step-for-step across engines. */
  val packSequencesGreedy: CatalogEntry = {
    val budget = 60L
    CatalogEntry(
      "pack_sequences_greedy",
      s"""WITH RECURSIVE
         |tok AS (
         |  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n
         |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         |arr AS (
         |  SELECT source,
         |    list(struct_pack(doc_id := doc_id, n := n) ORDER BY doc_id) AS ds
         |  FROM tok GROUP BY source),
         |rec(source, i, m, bin, off, used) AS (
         |  SELECT source, 0, len(ds), 0::BIGINT, 0::BIGINT, 0::BIGINT FROM arr
         |  UNION ALL
         |  SELECT r.source, r.i + 1, r.m,
         |    CASE WHEN r.used = 0 OR r.used + a.ds[r.i + 1].n <= $budget
         |         THEN r.bin ELSE r.bin + 1 END,
         |    CASE WHEN r.used = 0 OR r.used + a.ds[r.i + 1].n <= $budget
         |         THEN r.used ELSE 0::BIGINT END,
         |    CASE WHEN r.used = 0 OR r.used + a.ds[r.i + 1].n <= $budget
         |         THEN r.used + a.ds[r.i + 1].n ELSE a.ds[r.i + 1].n END
         |  FROM rec r JOIN arr a USING (source) WHERE r.i < r.m)
         |SELECT r.source, a.ds[r.i].doc_id AS doc_id, a.ds[r.i].n AS n_tokens,
         |  r.bin AS bin, r.off AS bin_offset
         |FROM rec r JOIN arr a USING (source) WHERE r.i >= 1
         |ORDER BY r.source, doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val tok = Tables.documents(s, d)
        .where($"text".isNotNull && length($"text") > 0)
        .select($"source", $"doc_id",
          size(TextOps.tokens($"text")).cast("long").as("n"))
      val accType =
        "array<struct<doc_id:bigint,n:bigint,bin:bigint,bin_offset:bigint>>"
      tok.groupBy($"source")
        .agg(sort_array(collect_list(struct($"doc_id", $"n"))).as("ds"))
        .select($"source", explode(aggregate(
          $"ds",
          struct(array().cast(accType).as("acc"),
            lit(0L).as("bin"), lit(0L).as("used")),
          (st, e) => {
            // an empty bin always accepts (an oversized doc OWNS the
            // current empty bin rather than skipping a bin id)
            val fits = st("used") === 0L || st("used") + e("n") <= budget
            val bin = when(fits, st("bin")).otherwise(st("bin") + 1L)
            val off = when(fits, st("used")).otherwise(lit(0L))
            val used = when(fits, st("used") + e("n")).otherwise(e("n"))
            struct(
              concat(st("acc"), array(struct(e("doc_id").as("doc_id"),
                e("n").as("n"), bin.as("bin"), off.as("bin_offset"))))
                .as("acc"),
              bin.as("bin"), used.as("used"))
          },
          st => st("acc"))).as("p"))
        .select($"source", $"p.doc_id".as("doc_id"), $"p.n".as("n_tokens"),
          $"p.bin".as("bin"), $"p.bin_offset".as("bin_offset"))
        .orderBy($"source", $"doc_id")
    }
  }

  /** FIRST-FIT-DECREASING SEQUENCE PACKING — the classical FFD upgrade
    * over [[packSequencesGreedy]]'s doc-order next-fit: within each
    * source shard, documents are sorted by token length DESCENDING
    * (ties on doc_id) and each is placed into the FIRST already-open
    * bin with room, opening a new bin only when none fits. FFD's
    * 11/9·OPT+6/9 guarantee (Johnson 1973) vs next-fit's 2·OPT is the
    * textbook reason curation pipelines length-sort before committing
    * context-window budget; [[packEfficiencyCensus]] prices the two
    * against the ceil(Σtokens/budget) lower bound side by side (on
    * this corpus FFD strictly dominates: fewer bins on every source at
    * every SF, ~50 bins saved at sf0.01).
    *
    * Scale shape: identical to the greedy fold — packing is
    * sequential PER SHARD with no cross-shard semantics, so one
    * shuffle groups each source's (doc_id, n) list and the whole FFD
    * state machine runs row-local as a codegen'd `aggregate` HOF. The
    * extra state vs greedy is the open-bin load vector (array<bigint>,
    * one slot per bin opened so far) scanned per doc for the first
    * fit — O(m·bins) per shard on top of the fold's O(m²)-bytes acc
    * copying, the same few-thousand-docs-per-shard practical cap (at
    * 100 TB compose the shard key with a doc_id bucket exactly as the
    * greedy scaladoc prescribes). The DuckDB oracle replays the
    * identical machine as a recursive CTE whose per-step LATERAL
    * computes the same first-fit index over the same load vector, so
    * a hash match proves fit/open decisions agree step-for-step. */
  val packSequencesFfd: CatalogEntry = {
    val budget = 60L
    CatalogEntry(
      "pack_sequences_ffd",
      s"""WITH RECURSIVE
         |tok AS (
         |  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n
         |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         |arr AS (
         |  SELECT source,
         |    list(struct_pack(doc_id := doc_id, n := n)
         |         ORDER BY n DESC, doc_id) AS ds
         |  FROM tok GROUP BY source),
         |rec(source, i, m, bins, bin, off) AS (
         |  SELECT source, 0, len(ds), []::BIGINT[], 0::BIGINT, 0::BIGINT
         |  FROM arr
         |  UNION ALL
         |  SELECT r.source, r.i + 1, r.m,
         |    CASE WHEN fit.j IS NOT NULL
         |         THEN list_transform(r.bins, (b, k) ->
         |                CASE WHEN k = fit.j
         |                     THEN b + a.ds[r.i + 1].n ELSE b END)
         |         ELSE list_append(r.bins, a.ds[r.i + 1].n) END,
         |    CASE WHEN fit.j IS NOT NULL THEN (fit.j - 1)::BIGINT
         |         ELSE len(r.bins)::BIGINT END,
         |    CASE WHEN fit.j IS NOT NULL THEN r.bins[fit.j]
         |         ELSE 0::BIGINT END
         |  FROM rec r JOIN arr a USING (source),
         |    LATERAL (SELECT list_filter(list_transform(r.bins, (b, k) ->
         |        CASE WHEN b + a.ds[r.i + 1].n <= $budget THEN k END),
         |      x -> x IS NOT NULL)[1] AS j) fit
         |  WHERE r.i < r.m)
         |SELECT r.source, a.ds[r.i].doc_id AS doc_id, a.ds[r.i].n AS n_tokens,
         |  r.bin AS bin, r.off AS bin_offset
         |FROM rec r JOIN arr a USING (source) WHERE r.i >= 1
         |ORDER BY r.source, doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val tok = Tables.documents(s, d)
        .where($"text".isNotNull && length($"text") > 0)
        .select($"source", $"doc_id",
          size(TextOps.tokens($"text")).cast("long").as("n"))
      val accType =
        "array<struct<doc_id:bigint,n:bigint,bin:bigint,bin_offset:bigint>>"
      // sort_array ascending on (nn = -n, doc_id) = (n DESC, doc_id)
      tok.groupBy($"source")
        .agg(sort_array(collect_list(
          struct((-$"n").as("nn"), $"doc_id", $"n"))).as("ds"))
        .select($"source", explode(aggregate(
          $"ds",
          struct(array().cast(accType).as("acc"),
            array().cast("array<bigint>").as("bins")),
          (st, e) => {
            // 1-based index of the FIRST open bin with room; null when
            // none fits. The HOF evaluator substitutes a referenced
            // Column EXPRESSION at every use site, so this O(bins)
            // scan must be LET-BOUND — evaluated once per step via a
            // single-element transform whose lambda variable is the
            // value — or the bins-update transform below re-runs it
            // per element (O(bins²)/doc; measured 22× on the fold).
            val fitIdxExpr = get(filter(transform(st("bins"),
              (b, i) => when(b + e("n") <= budget, i + lit(1L))),
              x => x.isNotNull), lit(0))
            get(transform(array(fitIdxExpr), fitIdx => {
              val fits = fitIdx.isNotNull
              val bin = when(fits, fitIdx - 1L)
                .otherwise(size(st("bins")).cast("long"))
              val off = when(fits,
                element_at(st("bins"), fitIdx.cast("int"))).otherwise(lit(0L))
              val bins = when(fits, transform(st("bins"),
                (b, i) => when(i.cast("long") + 1L === fitIdx, b + e("n"))
                  .otherwise(b)))
                .otherwise(concat(st("bins"), array(e("n"))))
              struct(
                concat(st("acc"), array(struct(e("doc_id").as("doc_id"),
                  e("n").as("n"), bin.as("bin"), off.as("bin_offset"))))
                  .as("acc"),
                bins.as("bins"))
            }), lit(0))
          },
          st => st("acc"))).as("p"))
        .select($"source", $"p.doc_id".as("doc_id"), $"p.n".as("n_tokens"),
          $"p.bin".as("bin"), $"p.bin_offset".as("bin_offset"))
        .orderBy($"source", $"doc_id")
    }
  }

  /** Hashed bag-of-words linear quality classifier (the fastText-style
    * model-based filter of modern corpus curation, e.g. the CCNet /
    * LLaMA-data "quality classifier" stage) with a DETERMINISTIC model:
    * token → 60-bit md5 prefix → one of 1024 hash buckets (the hashing
    * trick — the vocabulary never materializes, so the model is a
    * fixed-width weight vector no matter the corpus), bucket → integer
    * weight via a Knuth multiplicative mix. The per-doc score is an
    * exact BIGINT sum, so the keep/drop bit is bit-stable across
    * engines — a float sigmoid would add nothing but summation-order
    * risk. Scale shape: tokenize + hash + weight are scan-local (the
    * row-local `bow_score_md5` kernel — the token rows never exist and
    * the md5 calls stay inside one compiled method instead of
    * HOF-inlined md5-dense generated code, the r15/r17/r18 JIT trap),
    * one partial-agg exchange of |docs| rows; a real learned weight
    * table would broadcast identically. */
  val qualityClassifierScore: CatalogEntry = CatalogEntry(
    "quality_classifier_score",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |hashed AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(w), 1, 15))::BIGINT % 1024 AS b
      |  FROM tok WHERE w <> ''),
      |scored AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |    sum((b * 2654435761) % 1048576 - 524288)::BIGINT AS score_raw
      |  FROM hashed GROUP BY doc_id)
      |SELECT doc_id, n_tokens, score_raw,
      |  CASE WHEN score_raw >= 0 THEN 1 ELSE 0 END AS kept
      |FROM scored ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select($"doc_id",
        call_function("bow_score_md5", $"text").as("bs"))
      .select($"doc_id", $"bs.n_tokens".as("n_tokens"),
        $"bs.score_raw".as("score_raw"))
      .withColumn("kept",
        when($"score_raw" >= 0L, 1).otherwise(0))
      .orderBy($"doc_id")
  }

  /** ROC-AUC OF THE QUALITY CLASSIFIER, exactly — per source, the
    * probability (in ppm) that the hashed-BoW classifier
    * ([[qualityClassifierScore]]) ranks a gate-kept doc above a
    * gate-dropped one (ties ½), with the Gopher-style rule gate
    * ([[docQualityFilter]]'s `keep`) as the reference label: the
    * measurement behind "can the cheap model-based filter replace the
    * rule stack per source, or only pre-rank for it". Computed as the
    * tie-aware Mann-Whitney rank-sum on the INTEGER lattice — scores
    * are exact BIGINTs, group average-ranks are kept DOUBLED (first +
    * last rank of the tie run, always an integer), so
    * AUC = (Σ2R⁺ − n⁺(n⁺+1)) / (2 n⁺ n⁻) needs one truncating division
    * to ppm and can't flip on float summation. Sources where the gate
    * keeps everything (or nothing) have no ranking question — NULL,
    * visibly.
    *
    * Label and score come from [[qualitySignals]] — the same one-scan
    * builder doc_quality_filter ships, so the measured gate/classifier
    * pair IS the deployed pair. Scale shape: both kernels are
    * scan-local; the rank-sum runs on the (source, score) PARTIAL-AGG
    * table (≤ |distinct scores| rows — classifier scores collide, docs
    * never cross the wire), one window + one re-aggregate on that
    * metadata-scale table. */
  val qualityClassifierAuc: CatalogEntry = CatalogEntry(
    "quality_classifier_auc",
    s"""WITH qf AS (${docQualityFilter.oracle.get.replace("\n", "\n      ")}),
      |sc AS (${qualityClassifierScore.oracle.get.replace("\n", "\n      ")}),
      |j AS (SELECT d.source, sc.score_raw AS score,
      |        CASE WHEN qf.keep THEN 1 ELSE 0 END AS pos
      |      FROM sc JOIN qf USING (doc_id) JOIN documents d USING (doc_id)),
      |g AS (SELECT source, score, count(*)::BIGINT AS c,
      |        sum(pos)::BIGINT AS p
      |      FROM j GROUP BY 1, 2),
      |r AS (SELECT source, c, p,
      |        1 + coalesce(sum(c) OVER (PARTITION BY source ORDER BY score
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
      |      FROM g),
      |t AS (SELECT source, sum(c)::BIGINT AS n, sum(p)::BIGINT AS npos,
      |        sum(p::HUGEINT * (2 * a + c - 1))::HUGEINT AS dsum
      |      FROM r GROUP BY source)
      |SELECT source, n AS n_docs, npos AS n_pos,
      |  CASE WHEN npos > 0 AND npos < n THEN
      |    ((500000::HUGEINT * (dsum - npos::HUGEINT * (npos + 1)))
      |     // (npos::HUGEINT * (n - npos)))::BIGINT END AS auc_ppm
      |FROM t ORDER BY source""".stripMargin) { (s, d) =>
    import s.implicits._
    // The score oracle's tokenize-CTE only emits docs with >= 1
    // non-empty token (none are filtered in this corpus; the predicate
    // pins the row-set contract anyway)
    val j = qualitySignals(s, d)
      .where($"has_clf_tokens")
      .select($"source", $"score",
        when(gateKeep, 1L).otherwise(0L).as("pos"))
    val g = j.groupBy($"source", $"score")
      .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
    val w = Window.partitionBy($"source").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.select($"source", $"c", $"p",
      (coalesce(sum($"c").over(w), lit(0L)) + 1L).as("a"))
    r.groupBy($"source")
      // p·(2a + c − 1) reaches 2n² per tie-group — decimal BEFORE the
      // multiply so warehouse-scale n can't overflow the rank sum
      .agg(sum($"c").as("n"), sum($"p").as("npos"),
        sum($"p".cast("decimal(19,0)") *
          (lit(2L) * $"a" + $"c" - 1L)).as("dsum"))
      .select($"source", $"n".as("n_docs"), $"npos".as("n_pos"),
        when($"npos" > 0L && $"npos" < $"n",
          expr("""(cast(500000 as decimal(38,0))
            | * (dsum - cast(npos as decimal(38,0)) * (npos + 1)))
            | div (cast(npos as decimal(38,0)) * (n - npos))"""
            .stripMargin))
          .cast("long").as("auc_ppm"))
      .orderBy($"source")
  }

  /** CALIBRATION / RELIABILITY TABLE of the quality classifier — the
    * corpus split into 10 score deciles (rank-based, ties never split
    * a score group: a group's bin is its MIDPOINT rank's decile, so
    * the binning is a pure function of the score multiset), each bin
    * reporting its doc count, score range, and the empirical
    * gate-keep rate in exact ppm. The reliability curve is what turns
    * a raw classifier score into a trustable keep-probability before
    * anyone thresholds it at scale ([[qualityClassifierAuc]] says IF
    * the ranking is good; this says WHERE to cut); on this corpus it
    * also exposes the score-gate ANTI-correlation (keep rate falls as
    * score rises) that the AUC census quantifies per source.
    *
    * Scale shape: identical to the AUC entry — kernels scan-local,
    * binning + census on the (score → count) partial-agg table; the
    * total-count denominator arrives as a broadcast 1-row scalar,
    * never a collect. The cumulative-rank window runs single-partition
    * over that aggregated table (|distinct scores| rows — fine up to
    * many millions of one-counter rows); a corpus whose distinct-score
    * count itself explodes coarsens the score lattice first
    * (`score div 2^s` — same deciles, 2^s fewer groups). */
  val qualityCalibrationBins: CatalogEntry = CatalogEntry(
    "quality_calibration_bins",
    s"""WITH qf AS (${docQualityFilter.oracle.get.replace("\n", "\n      ")}),
      |sc AS (${qualityClassifierScore.oracle.get.replace("\n", "\n      ")}),
      |j AS (SELECT sc.score_raw AS score,
      |        CASE WHEN qf.keep THEN 1 ELSE 0 END AS pos
      |      FROM sc JOIN qf USING (doc_id)),
      |g AS (SELECT score, count(*)::BIGINT AS c, sum(pos)::BIGINT AS p
      |      FROM j GROUP BY 1),
      |r AS (SELECT score, c, p,
      |        coalesce(sum(c) OVER (ORDER BY score
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a0
      |      FROM g),
      |n AS (SELECT sum(c)::BIGINT AS n FROM g),
      |b AS (SELECT ((2 * a0 + c - 1) * 5) // n AS bin, score, c, p
      |      FROM r CROSS JOIN n)
      |SELECT bin::BIGINT AS bin, sum(c)::BIGINT AS n_docs,
      |  min(score)::BIGINT AS min_score, max(score)::BIGINT AS max_score,
      |  sum(p)::BIGINT AS n_pos,
      |  ((1000000 * sum(p)) // sum(c))::BIGINT AS pos_rate_ppm
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    import s.implicits._
    val j = qualitySignals(s, d)
      .where($"has_clf_tokens")
      .select($"score", when(gateKeep, 1L).otherwise(0L).as("pos"))
    val g = j.groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
    val w = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.select($"score", $"c", $"p",
      coalesce(sum($"c").over(w), lit(0L)).as("a0"))
    val n = g.agg(sum($"c").as("n"))
    r.crossJoin(broadcast(n))
      .select(expr("((2 * a0 + c - 1) * 5) div n").as("bin"),
        $"score", $"c", $"p")
      .groupBy($"bin")
      .agg(sum($"c").as("n_docs"),
        min($"score").as("min_score"), max($"score").as("max_score"),
        sum($"p").as("n_pos"),
        expr("(1000000L * sum(p)) div sum(c)").as("pos_rate_ppm"))
      .orderBy($"bin")
  }

  /** QUALITY-GATE ABLATION CENSUS — per gate rule (length, TTR,
    * top-word share, mean word length): how many docs FAIL it, and how
    * many fail ONLY it (the rule's unique contribution — the number
    * that says which rules earn their place and which are dead weight
    * behind the others); beside each, the corpus size and the gate's
    * total drop count. On this corpus the length rule does nearly all
    * the work and TTR/word-length are entirely shadowed — exactly the
    * audit a curation pipeline runs before tuning thresholds
    * ([[qualityClassifierAuc]] asks "can a model replace the stack";
    * this asks "which rules ARE the stack").
    *
    * Rules come from the shared [[qualitySignals]]/gate columns, so the
    * ablated gate is the shipped gate. Scale shape: the per-rule flags
    * are scan-local; ONE 1-row aggregate holds all ten counters; the
    * 4-row output is an explode of that row — no broadcast, no
    * second pass. */
  val qualityGateAblation: CatalogEntry = CatalogEntry(
    "quality_gate_ablation",
    s"""WITH qf AS (${docQualityFilter.oracle.get.replace("\n", "\n      ")}),
      |g AS (SELECT NOT ok_len AS f_len, NOT ok_ttr AS f_ttr,
      |        NOT ok_top_word AS f_top, NOT ok_word_len AS f_wl
      |      FROM qf),
      |a AS (SELECT count(*)::BIGINT AS n,
      |        count(*) FILTER (f_len)::BIGINT AS n_len,
      |        count(*) FILTER (f_len AND NOT f_ttr AND NOT f_top
      |                         AND NOT f_wl)::BIGINT AS o_len,
      |        count(*) FILTER (f_ttr)::BIGINT AS n_ttr,
      |        count(*) FILTER (f_ttr AND NOT f_len AND NOT f_top
      |                         AND NOT f_wl)::BIGINT AS o_ttr,
      |        count(*) FILTER (f_top)::BIGINT AS n_top,
      |        count(*) FILTER (f_top AND NOT f_len AND NOT f_ttr
      |                         AND NOT f_wl)::BIGINT AS o_top,
      |        count(*) FILTER (f_wl)::BIGINT AS n_wl,
      |        count(*) FILTER (f_wl AND NOT f_len AND NOT f_ttr
      |                         AND NOT f_top)::BIGINT AS o_wl,
      |        count(*) FILTER (f_len OR f_ttr OR f_top OR f_wl)::BIGINT
      |          AS n_any
      |      FROM g)
      |SELECT r.rule, r.n_fail, r.n_only_fail, n AS n_docs,
      |  n_any AS n_dropped,
      |  ((1000000 * r.n_fail) // n)::BIGINT AS fail_ppm
      |FROM a, LATERAL (VALUES ('len', n_len, o_len), ('ttr', n_ttr, o_ttr),
      |  ('top_word', n_top, o_top), ('word_len', n_wl, o_wl))
      |  AS r(rule, n_fail, n_only_fail)
      |ORDER BY r.rule""".stripMargin) { (s, d) =>
    import s.implicits._
    val g = qualitySignals(s, d)
      .select((!gateOkLen).as("f_len"), (!gateOkTtr).as("f_ttr"),
        (!gateOkTopWord).as("f_top"), (!gateOkWordLen).as("f_wl"))
    val a = g.agg(
      count(lit(1)).as("n"),
      count(when($"f_len", 1)).as("n_len"),
      count(when($"f_len" && !$"f_ttr" && !$"f_top" && !$"f_wl", 1))
        .as("o_len"),
      count(when($"f_ttr", 1)).as("n_ttr"),
      count(when($"f_ttr" && !$"f_len" && !$"f_top" && !$"f_wl", 1))
        .as("o_ttr"),
      count(when($"f_top", 1)).as("n_top"),
      count(when($"f_top" && !$"f_len" && !$"f_ttr" && !$"f_wl", 1))
        .as("o_top"),
      count(when($"f_wl", 1)).as("n_wl"),
      count(when($"f_wl" && !$"f_len" && !$"f_ttr" && !$"f_top", 1))
        .as("o_wl"),
      count(when($"f_len" || $"f_ttr" || $"f_top" || $"f_wl", 1))
        .as("n_any"))
    a.select(explode(array(
        struct(lit("len").as("rule"), $"n_len".as("n_fail"),
          $"o_len".as("n_only_fail")),
        struct(lit("ttr").as("rule"), $"n_ttr".as("n_fail"),
          $"o_ttr".as("n_only_fail")),
        struct(lit("top_word").as("rule"), $"n_top".as("n_fail"),
          $"o_top".as("n_only_fail")),
        struct(lit("word_len").as("rule"), $"n_wl".as("n_fail"),
          $"o_wl".as("n_only_fail")))).as("r"),
        $"n", $"n_any")
      .select($"r.rule".as("rule"), $"r.n_fail".as("n_fail"),
        $"r.n_only_fail".as("n_only_fail"), $"n".as("n_docs"),
        $"n_any".as("n_dropped"),
        expr("(1000000L * r.n_fail) div n").as("fail_ppm"))
      .orderBy($"rule")
  }

  /** MODEL-vs-GATE FILTER AGREEMENT (2×2 Cohen's kappa) — the decision
    * companion to [[qualityClassifierAuc]]: the AUC asks "does the
    * model RANK like the gate"; this asks whether the model's shipped
    * DECISION (score ≥ 0, `quality_classifier_score`'s `kept` bit)
    * agrees with the rule gate beyond chance. Emits the full 2×2
    * confusion (both-keep / model-only / gate-only / both-drop),
    * observed and chance agreement, and κ in exact ppm (marginal
    * products in DECIMAL(38,0)/HUGEINT — [[statsCohenKappa]]'s
    * arithmetic on two categories). On this corpus κ < 0: the hashed
    * classifier's threshold decision is anti-correlated with the gate,
    * the same verdict the calibration table shows graphically — the
    * number that stops anyone swapping the rule stack for this model
    * at this threshold.
    *
    * Scale shape: both bits come from the one-scan [[qualitySignals]]
    * builder; ONE 1-row aggregate; no joins, no windows. */
  val qualityFilterAgreement: CatalogEntry = CatalogEntry(
    "quality_filter_agreement",
    s"""WITH qf AS (${docQualityFilter.oracle.get.replace("\n", "\n      ")}),
      |sc AS (${qualityClassifierScore.oracle.get.replace("\n", "\n      ")}),
      |j AS (SELECT (sc.score_raw >= 0) AS mk, qf.keep AS gk
      |      FROM sc JOIN qf USING (doc_id)),
      |ag AS (SELECT count(*)::BIGINT AS n,
      |         count(*) FILTER (mk AND gk)::BIGINT AS ka,
      |         count(*) FILTER (mk AND NOT gk)::BIGINT AS kb,
      |         count(*) FILTER (NOT mk AND gk)::BIGINT AS kc,
      |         count(*) FILTER (NOT mk AND NOT gk)::BIGINT AS kd
      |       FROM j)
      |SELECT n AS n_docs, ka AS n_both_keep, kb AS n_model_only,
      |  kc AS n_gate_only, kd AS n_both_drop,
      |  ((1000000 * (ka + kd)) // n)::BIGINT AS po_ppm,
      |  ((1000000::HUGEINT * ((ka+kb)::HUGEINT*(ka+kc)
      |      + (kc+kd)::HUGEINT*(kb+kd))) // (n::HUGEINT * n))::BIGINT
      |    AS pe_ppm,
      |  CASE WHEN n::HUGEINT * n - ((ka+kb)::HUGEINT*(ka+kc)
      |           + (kc+kd)::HUGEINT*(kb+kd)) <> 0 THEN
      |    ((1000000::HUGEINT * (n::HUGEINT*(ka+kd)
      |        - ((ka+kb)::HUGEINT*(ka+kc) + (kc+kd)::HUGEINT*(kb+kd))))
      |     // (n::HUGEINT * n - ((ka+kb)::HUGEINT*(ka+kc)
      |         + (kc+kd)::HUGEINT*(kb+kd))))::BIGINT END AS kappa_ppm
      |FROM ag""".stripMargin) { (s, d) =>
    import s.implicits._
    val j = qualitySignals(s, d)
      .where($"has_clf_tokens")
      .select(($"score" >= 0L).as("mk"), gateKeep.as("gk"))
    val ag = j.agg(count(lit(1)).as("n"),
      count(when($"mk" && $"gk", 1)).as("ka"),
      count(when($"mk" && !$"gk", 1)).as("kb"),
      count(when(!$"mk" && $"gk", 1)).as("kc"),
      count(when(!$"mk" && !$"gk", 1)).as("kd"))
    // pe's marginal products in decimal so n² terms survive warehouse
    // row counts (the statsCohenKappa discipline, two categories)
    val src = "(cast(ka + kb as decimal(38,0)) * (ka + kc)" +
      " + cast(kc + kd as decimal(38,0)) * (kb + kd))"
    ag.select($"n".as("n_docs"), $"ka".as("n_both_keep"),
      $"kb".as("n_model_only"), $"kc".as("n_gate_only"),
      $"kd".as("n_both_drop"),
      expr("(1000000L * (ka + kd)) div n").as("po_ppm"),
      expr(s"(cast(1000000 as decimal(38,0)) * $src)" +
        " div (cast(n as decimal(38,0)) * n)")
        .cast("long").as("pe_ppm"),
      when(expr(s"cast(n as decimal(38,0)) * n - $src") =!= lit(0),
        expr(s"""(cast(1000000 as decimal(38,0))
          | * (cast(n as decimal(38,0)) * (ka + kd) - $src))
          | div (cast(n as decimal(38,0)) * n - $src)""".stripMargin))
        .cast("long").as("kappa_ppm"))
  }

  /** Per-document unigram entropy + type/token ratio — the statistical
    * quality signals that catch degenerate text (a doc stuck repeating
    * one token has entropy → 0) without any model. H = ln n − (Σ c·ln c)/n
    * over within-doc token counts. Float discipline: the only
    * transcendental term, Σ c·ln c, is quantized per-TYPE to integer
    * nanos BEFORE summation — ln of an exact integer is correctly
    * rounded per engine and the nano-sum is order-independent BIGINT
    * arithmetic, so the cross-engine hash can't flip on partial-agg
    * order (the doc_lm_score lesson). Scale shape: the token census is
    * a row-local lambda-groupBy... no — counts need a (doc,word)
    * aggregate; shuffle carries (doc_id, word-hash, c) partials, never
    * text, and collapses to |docs| rows in the second partial agg. */
  val textEntropy: CatalogEntry = CatalogEntry(
    "text_entropy",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (
      |  SELECT doc_id, w, count(*)::BIGINT AS c
      |  FROM tok WHERE w <> '' GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
      |    sum(round(c * ln(c) * 1e9)::BIGINT)::BIGINT AS s_nano
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_types,
      |  round(ln(n_tokens) - (s_nano / 1e9) / n_tokens, 6) AS entropy,
      |  round(n_types::DOUBLE / n_tokens::DOUBLE, 6) AS ttr
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("w"))
      .where($"w" =!= "")
      .groupBy($"doc_id", $"w")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(round($"c" * log($"c") * lit(1e9)).cast("bigint")).as("s_nano"))
      .select($"doc_id", $"n_tokens", $"n_types",
        round(log($"n_tokens") - ($"s_nano" / lit(1e9)) / $"n_tokens", 6)
          .as("entropy"),
        round($"n_types".cast("double") / $"n_tokens".cast("double"), 6)
          .as("ttr"))
      .orderBy($"doc_id")
  }

  /** Vocabulary-encode documents — the final tokenize-for-training
    * step: build a top-16 frequency-ranked vocab (id = rank, total
    * order by count desc then token), then re-encode every document's
    * token stream as vocab ids with 0 = OOV. Output per doc: token
    * count, OOV count, and the first 8 positions' ids joined as a
    * string (the sanity window a practitioner eyeballs). Scale shape: the
    * vocab is TakeOrdered-then-rank on a 16-row table and BROADCAST
    * back; the positional head is collected per doc AFTER the
    * vocab-id projection, so the shuffle carries (doc_id, pos, id)
    * triples for 8 positions plus two counters — never text. */
  val vocabEncodeDocs: CatalogEntry = CatalogEntry(
    "vocab_encode_docs",
    """WITH toks AS (
      |  SELECT doc_id, g.i::BIGINT AS pos, string_split(text, ' ')[g.i] AS w
      |  FROM documents,
      |    unnest(generate_series(1, len(string_split(text, ' ')))) AS g(i)),
      |vocab AS (
      |  SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS vid
      |  FROM toks GROUP BY w
      |  QUALIFY vid <= 16),
      |enc AS (
      |  SELECT t.doc_id, t.pos, coalesce(v.vid, 0)::BIGINT AS vid
      |  FROM toks t LEFT JOIN vocab v ON t.w = v.w)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  (count(*) FILTER (vid = 0))::BIGINT AS n_oov,
      |  string_agg(CASE WHEN pos <= 8 THEN vid END, '-' ORDER BY pos)
      |    AS ids_head
      |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", posexplode(TextOps.tokens($"text"))
        .as(Seq("pos0", "w")))
      .select($"doc_id", ($"pos0" + 1).cast("bigint").as("pos"), $"w")
    val rankW = Window.orderBy($"n".desc, $"w".asc)
    val vocab = toks.groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w".asc).limit(16) // TakeOrderedAndProject
      .withColumn("vid", row_number().over(rankW).cast("bigint"))
      .select($"w", $"vid")
    toks.join(broadcast(vocab), Seq("w"), "left")
      .withColumn("vid", coalesce($"vid", lit(0L)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count_if($"vid" === 0L).as("n_oov"),
        array_join(transform(
          sort_array(collect_list(when($"pos" <= 8,
            struct($"pos", $"vid")))),
          x => x.getField("vid").cast("string")), "-").as("ids_head"))
      .orderBy($"doc_id")
  }

  /** BM25 retrieval scoring (Okapi, Lucene idf form, k1=1.2 b=0.75) —
    * rank the corpus against a term-set query: the scoring function
    * behind retrieval-based decontamination sweeps and
    * nearest-neighbor text search when there is no embedding. Float
    * discipline: tf / df / N / doc-length are exact BIGINTs, every
    * transcendental input is a ratio of exact integers (identical
    * IEEE doubles per engine), and each per-term partial score is
    * quantized to nano-BIGINTs BEFORE the per-doc sum — so the
    * ranking key is integer-exact and the top-20 cannot flip on
    * summation order. Scale shape: the term list and the |terms|-row
    * df table broadcast; tf is one (doc, term) partial-agg exchange
    * over ONLY term-matching tokens (the filter runs scan-side);
    * corpus length stats are a broadcast 1-row scalar; the final
    * top-20 is TakeOrderedAndProject. */
  val bm25Topk: CatalogEntry = CatalogEntry(
    "bm25_topk",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |len AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
      |corp AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS suml FROM len),
      |terms(term) AS (VALUES ('table'), ('spark'), ('key'), ('window')),
      |tf AS (
      |  SELECT doc_id, w AS term, count(*)::BIGINT AS tf
      |  FROM tok WHERE w IN (SELECT term FROM terms) GROUP BY doc_id, w),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT t.doc_id,
      |    round(ln((n - df + 0.5) / (df + 0.5) + 1)
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (1 - 0.75
      |           + 0.75 * dl::DOUBLE / (suml::DOUBLE / n::DOUBLE)))
      |      * 1e9)::BIGINT AS s_nano
      |  FROM tf t JOIN df USING (term) JOIN len USING (doc_id), corp),
      |agg AS (
      |  SELECT doc_id, sum(s_nano)::BIGINT AS score_nano
      |  FROM scored GROUP BY doc_id)
      |SELECT doc_id, score_nano, score_nano / 1e9 AS bm25
      |FROM agg ORDER BY score_nano DESC, doc_id LIMIT 20""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val queryTerms = Seq("table", "spark", "key", "window")
    val tok = Tables.documents(s, d)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("w"))
    val len = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val corp = len.agg(count(lit(1)).as("n"), sum($"dl").as("suml"))
    val tf = tok.where($"w".isin(queryTerms: _*))
      .groupBy($"doc_id", $"w".as("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(len, "doc_id")
      .crossJoin(broadcast(corp))
      .withColumn("s_nano", round(
        log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1) *
          ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(1.0) - lit(0.75) +
            lit(0.75) * $"dl".cast("double") /
              ($"suml".cast("double") / $"n".cast("double")))) *
          lit(1e9)).cast("bigint"))
      .groupBy($"doc_id")
      .agg(sum($"s_nano").as("score_nano"))
      .select($"doc_id", $"score_nano",
        ($"score_nano" / lit(1e9)).as("bm25"))
      .orderBy($"score_nano".desc, $"doc_id".asc)
      .limit(20)
  }

  /** Exact all-pairs near-dup JOIN — [[graft.ext.SetSimJoin]] prefix
    * filtering over per-doc distinct 3-token shingle sets, Jaccard ≥
    * 3/5, on a corpus augmented with planted exact and near copies (the
    * `dedup_simhash_portable` augmentation) so the pair set is
    * non-vacuous at every SF. This is the EXACT complement of the
    * MinHash/SimHash approximate paths: no banding false negatives, no
    * sketch — and the DuckDB oracle is deliberately the INDEPENDENT
    * formulation (full inverted-index overlap count with no prefix
    * filter), so hash-green also proves the prefix-filtering theorem
    * dropped no qualifying pair. All Jaccard decisions are
    * cross-multiplied exact integers. */
  val dedupSetsimJoin: CatalogEntry = CatalogEntry(
    "dedup_setsim_join",
    """WITH aug AS (
      |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents
      |  WHERE text IS NOT NULL AND doc_id % 17 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' graftdup graftdup2 graftdup3'
      |  FROM documents
      |  WHERE text IS NOT NULL AND doc_id % 23 = 0),
      |t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM aug),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] AS sh
      |  FROM t0, unnest(generate_series(1, len(t) - 2)) AS g(i)),
      |n AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
      |ov AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS overlap
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT id_a, id_b, overlap, na.n AS n_a, nb.n AS n_b
      |FROM ov JOIN n na ON ov.id_a = na.doc_id
      |  JOIN n nb ON ov.id_b = nb.doc_id
      |WHERE 8 * overlap >= 3 * (na.n + nb.n)
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val aug = docs.select($"doc_id", $"text")
      .union(docs.where($"doc_id" % 17 === 0)
        .select($"doc_id" + 100000, $"text"))
      .union(docs.where($"doc_id" % 23 === 0)
        .select($"doc_id" + 200000,
          concat($"text", lit(" graftdup graftdup2 graftdup3"))))
      .toDF("doc_id", "text")
    val shingled = aug
      .withColumn("t", split($"text", " "))
      .where(size($"t") >= 3)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(1), size($"t") - 2), i =>
          concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
            element_at($"t", i + 2)))))
      .select($"doc_id", $"shingles")
    graft.ext.SetSimJoin.selfJoin(shingled, "doc_id", "shingles", 3, 5)
      .orderBy($"id_a", $"id_b")
  }

  /** Triangle census of the shared-gram near-dup graph
    * ([[graft.ext.Graph.triangleStats]]): triangles vs wedges
    * (transitivity) is the cheap structural probe separating clique-
    * shaped duplication (template spam — every pair overlaps) from
    * chain-shaped incidental overlap. Degree-oriented counting keeps
    * every vertex's wedge fan-out at O(√|E|) regardless of degree skew
    * — the 100 TB guard — while the oracle recounts the same triangles
    * with a plain a<b<c triple self-join, an independent formulation
    * that also pins wedge and transitivity integer math. */
  val dedupGraphTriangles: CatalogEntry = CatalogEntry(
    "dedup_graph_triangles",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                          for i in range(1, greatest(len(toks) - 11, 1))])) AS gram
      |  FROM t),
      |rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 50),
      |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |      WHERE a.gram IN (SELECT gram FROM rare)),
      |tri AS (SELECT count(*)::BIGINT AS n_triangles FROM e x
      |        JOIN e y ON y.src = x.dst
      |        JOIN e z ON z.src = x.src AND z.dst = y.dst),
      |deg AS (SELECT id, count(*)::BIGINT AS d FROM
      |        (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
      |        GROUP BY id)
      |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
      |       (SELECT count(*) FROM e)::BIGINT AS n_edges,
      |       (SELECT n_triangles FROM tri) AS n_triangles,
      |       (SELECT sum(d*(d-1)//2) FROM deg)::BIGINT AS n_wedges,
      |       (SELECT CASE WHEN sum(d*(d-1)//2) = 0 THEN 0
      |               ELSE (SELECT n_triangles FROM tri) * 3000000
      |                    // sum(d*(d-1)//2) END
      |        FROM deg)::BIGINT AS transitivity_ppm""".stripMargin) { (s, d) =>
    val edges = Dedup.sharedGramPairs(
      Tables.documents(s, d), "doc_id", "text", n = 13, maxDf = 50)
    Graph.triangleStats(edges, "src", "dst")
  }

  /** Canonical-document selection — the step a curation pipeline runs
    * AFTER near-dup clustering: inside each shared-13-gram component,
    * keep exactly one representative (argmax token count, doc_id
    * tiebreak) and emit the drop list. The cluster closure is
    * `dedup_cluster_cc`'s exact pipeline (df-capped gram self-join →
    * min-label propagation); the selection adds ONE broadcast-sized
    * join back to documents (only clustered doc_ids — a tiny fraction
    * of the corpus — ever reach it) and one per-component window.
    * Singleton docs are implicitly canonical and never enter the plan:
    * at 100 TB the drop-list output is what the writer anti-joins
    * against, so emitting only clustered rows IS the product shape. */
  val dedupClusterCanonical: CatalogEntry = CatalogEntry(
    "dedup_cluster_canonical",
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                          for i in range(1, greatest(len(toks) - 11, 1))])) AS gram
      |  FROM t),
      |rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 50),
      |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      |      WHERE a.gram IN (SELECT gram FROM rare)),
      |r(id, lbl) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.lbl FROM r JOIN e ON e.src = r.id),
      |c AS (SELECT id AS doc_id, min(lbl) AS component FROM r GROUP BY id),
      |q AS (SELECT c.doc_id, c.component, len(t.toks)::BIGINT AS tok_cnt
      |      FROM c JOIN t ON c.doc_id = t.doc_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY component
      |                    ORDER BY tok_cnt DESC, doc_id) AS rk FROM q)
      |SELECT doc_id, component, tok_cnt,
      |  (rk = 1) AS is_canonical,
      |  first(doc_id) OVER (PARTITION BY component
      |    ORDER BY tok_cnt DESC, doc_id) AS canonical_id
      |FROM rk ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val edges = Dedup.sharedGramPairs(docs, "doc_id", "text",
      n = 13, maxDf = 50)
    val comp = Graph.connectedComponents(edges, "src", "dst")
      .withColumnRenamed("id", "cid")
    val quality = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("tok_cnt"))
    val w = Window.partitionBy($"component")
      .orderBy($"tok_cnt".desc, $"doc_id".asc)
    comp.join(quality, $"cid" === $"doc_id")
      .select($"doc_id", $"component", $"tok_cnt")
      .withColumn("rk", row_number().over(w))
      .select($"doc_id", $"component", $"tok_cnt",
        ($"rk" === 1).as("is_canonical"),
        first($"doc_id").over(w).as("canonical_id"))
      .orderBy($"doc_id")
  }

  /** Corpus-drift detection: symmetric KL divergence between the
    * unigram distributions of two corpus halves (doc_id parity — in
    * production, yesterday's crawl vs today's), add-one smoothed over
    * the union vocabulary. The monitoring signal a training-data
    * pipeline alarms on when a source shifts domain/language mix.
    *
    * Float discipline (the [[textEntropy]] pattern): every per-type
    * contribution p·ln(p/q) is computed from RATIOS OF EXACT BIGINTs
    * (products stay far under 2^53 → correctly-rounded doubles, ln
    * bit-stable in practice), then quantized to integer nanos BEFORE
    * the sum — the total is an integer sum, immune to partial-agg
    * ordering. One token-key shuffle builds (c1,c2) per type; totals
    * (N1,N2,V) are ONE broadcast scalar row. */
  val corpusKlDrift: CatalogEntry = CatalogEntry(
    "corpus_kl_drift",
    """WITH tok AS (
      |  SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |cnt AS (
      |  SELECT token,
      |    count(*) FILTER (WHERE half = 0)::BIGINT AS c1,
      |    count(*) FILTER (WHERE half = 1)::BIGINT AS c2
      |  FROM tok GROUP BY token),
      |tot AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
      |               count(*)::BIGINT AS v FROM cnt)
      |SELECT v, n1, n2,
      |  sum(round(1e9 * ((c1+1)::DOUBLE/(n1+v)) *
      |      ln(((c1+1)::DOUBLE*(n2+v)) / ((c2+1)::DOUBLE*(n1+v))))::BIGINT
      |     )::BIGINT AS kl_ab_nano,
      |  sum(round(1e9 * ((c2+1)::DOUBLE/(n2+v)) *
      |      ln(((c2+1)::DOUBLE*(n1+v)) / ((c1+1)::DOUBLE*(n2+v))))::BIGINT
      |     )::BIGINT AS kl_ba_nano
      |FROM cnt, tot GROUP BY v, n1, n2""".stripMargin) { (s, d) =>
    import s.implicits._
    val cnt = Tables.documents(s, d).where($"text".isNotNull)
      .select(($"doc_id" % 2).as("half"),
        explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(when($"half" === 0, 1)).as("c1"),
        count(when($"half" === 1, 1)).as("c2"))
    val tot = cnt.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
      count(lit(1)).as("v"))
    cnt.crossJoin(broadcast(tot))
      .groupBy($"v", $"n1", $"n2")
      .agg(
        sum(round(lit(1e9) * (($"c1" + 1).cast("double") / ($"n1" + $"v")) *
          log((($"c1" + 1).cast("double") * ($"n2" + $"v")) /
              (($"c2" + 1).cast("double") * ($"n1" + $"v"))))
          .cast("bigint")).as("kl_ab_nano"),
        sum(round(lit(1e9) * (($"c2" + 1).cast("double") / ($"n2" + $"v")) *
          log((($"c2" + 1).cast("double") * ($"n1" + $"v")) /
              (($"c1" + 1).cast("double") * ($"n2" + $"v"))))
          .cast("bigint")).as("kl_ba_nano"))
      .select($"v", $"n1", $"n2", $"kl_ab_nano", $"kl_ba_nano")
  }

  /** Per-document top-3 TF-IDF terms — keyword extraction, the
    * summarization/tagging primitive (corpus-level `tfidf_top_terms`'s
    * per-document sibling). Discipline: tf and df are exact integers;
    * idf = ln(N/df) is the one transcendental — a correctly-rounded
    * libm call on a ratio of exact integers (the repo's established
    * safe pattern), quantized to nano-BIGINTs BEFORE the tf multiply
    * so the ranking key is integer-exact and a cross-engine ulp can't
    * flip rank order. Plan: one token-count shuffle keyed (doc, term),
    * df reduced from tf (no second corpus scan), idf join on term, one
    * per-doc ranking window; the corpus scalar N broadcasts. */
  val tfidfPerDocTopk: CatalogEntry = CatalogEntry(
    "tfidf_per_doc_topk",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
      |       WHERE term <> '' GROUP BY 1, 2),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM tf),
      |sc AS (SELECT doc_id, tf.term,
      |         (tf * round(ln(n::DOUBLE / df::DOUBLE) * 1e9)::BIGINT)
      |           AS score_nano
      |       FROM tf JOIN df ON tf.term = df.term, n),
      |r AS (SELECT doc_id, term, score_nano,
      |        row_number() OVER (PARTITION BY doc_id
      |                           ORDER BY score_nano DESC, term) AS rk
      |      FROM sc)
      |SELECT doc_id, rk::BIGINT AS rk, term, score_nano
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    import s.implicits._
    val tf = Tables.documents(s, d).where($"text".isNotNull)
      .select($"doc_id", explode(graft.ext.TextOps.tokens($"text")).as("term"))
      .where($"term" =!= "")
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term".as("t2")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct($"doc_id").as("n"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score_nano".desc, $"term")
    tf.join(df, $"term" === $"t2")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"term",
        ($"tf" * round(log($"n".cast("double") / $"df".cast("double"))
          * 1e9).cast("long")).as("score_nano"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"score_nano")
      .orderBy($"doc_id", $"rk")
  }

  /** Exact substring-level duplication census — the character-window
    * variant of exact dedup (the "50-gram exact substring" rule of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499): fixed 40-char windows at stride 20,
    * grouped by content, keeping windows shared by ≥2 distinct docs.
    * Unlike token n-grams this catches copies that tokenization splits
    * differently (whitespace/punctuation edits between the copies).
    * Stride-20 windows overlap by half, so any shared run ≥ 59 chars
    * is guaranteed to contain at least one aligned window in both
    * copies IF the copies start at the same offset parity; the full
    * suffix-array construction of the paper removes that alignment
    * caveat at ~20x the cost — this is the bounded, shuffle-friendly
    * approximation a 100 TB pass runs first.
    *
    * Scale shape: the window explode is CPU-dense over a byte-light
    * scan (spreadScan); ONE shuffle groups (gram, doc) pairs with
    * map-side partial aggregation; the ≥2-docs filter drops the
    * overwhelmingly-unique tail before the tiny determinism sort.
    * Production hashes windows to int64 before the exchange
    * (xxhash64), shrinking shuffle bytes ~5x; gram TEXT rides the
    * shuffle here so the DuckDB oracle replays the pipeline verbatim
    * (the output column is md5 either way). */
  val decontamSubstringExact: CatalogEntry = CatalogEntry(
    "decontam_substring_exact",
    """WITH w AS (
      |  SELECT doc_id,
      |    unnest([substring(text, i, 40)
      |            for i in range(1, len(text) - 38, 20)]) AS gram
      |  FROM documents
      |  WHERE text IS NOT NULL AND len(text) >= 40)
      |SELECT md5(gram) AS gram_md5,
      |  count(DISTINCT doc_id)::BIGINT AS n_docs,
      |  count(*)::BIGINT AS n_occurrences,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM w GROUP BY gram
      |HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY gram_md5""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.spreadScan(Tables.documents(s, d)
        .where($"text".isNotNull && length($"text") >= 40))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, length(text) - 39, 20)," +
          " i -> substring(text, i, 40))")).as("gram"))
      .groupBy($"gram")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .where($"n_docs" >= 2)
      .select(md5($"gram").as("gram_md5"), $"n_docs", $"n_occurrences",
        $"first_doc", $"last_doc")
      .orderBy($"gram_md5")
  }

  /** EXACT-SUBSTRING duplicated-run extraction via suffix ordering —
    * the full construction of Lee et al. 2022 (arXiv:2107.06499 §4.1,
    * "ExactSubstr") that [[decontamSubstringExact]]'s stride-20 window
    * census approximates: every MAXIMAL run of ≥ L = 50 characters
    * that appears more than once in the corpus, with no alignment
    * caveat — stride-1 windows see every offset, so embedded/partial
    * duplication (a quoted paragraph inside an otherwise-novel doc)
    * is caught exactly where the strided census can miss or dilute it.
    * Subsumes [[dedupSegments]]' fixed-segment view the same way:
    * runs are reported at their true boundaries, not segment grid
    * boundaries.
    *
    * The suffix-ordering insight, Spark-shaped: sorting all suffixes
    * (capped at L bytes) and testing LCP ≥ L between sort-neighbors
    * flags exactly the positions whose L-byte window EQUALS another
    * position's window — with the cap at the threshold, neighbor-LCP
    * ≥ L over the sorted order is EQUIVALENT to "this window's equal-
    * prefix block has ≥ 2 members". The DuckDB oracle replays the
    * literal suffix formulation (global ORDER BY suffix + lag/lead
    * neighbor compare); the Spark plan exploits the equivalence and
    * plans the cheaper exchange: ONE count-over-window-partition hash
    * exchange on the 50-byte window instead of a global range sort —
    * same duplicated-position set, value-identical output. Duplicated
    * positions then merge into maximal runs with the islands trick
    * (pos − row_number per doc), a per-doc window.
    *
    * Scale shape: stride-1 windows are 50× the corpus bytes, so the
    * deployed plan never materializes, shuffles, or sorts the window
    * STRINGS at corpus scale: ONE row-local `win_hash_x64` kernel call
    * per doc emits every window's int64 hash, ONE narrow partial-agg
    * exchange counts the hashes, the ≥2 hash set broadcasts back as a
    * scan-local semi-join prefilter, and only the surviving candidates
    * (the duplicated fraction plus negligible 64-bit collisions)
    * re-materialize their window string — row-local substring on the
    * tiny candidate set — for an exact string-equality confirm:
    * collision-SAFE, value-identical to grouping the full strings,
    * proven by the oracle. This is simultaneously the 100 TB
    * shuffle-shrink shape (~7× fewer exchange bytes) and a measured
    * JIT-hygiene fix applied twice: the first cut's count-over-
    * Window.partitionBy(window) SORTED 1.3M window strings and
    * elevated unrelated string-heavy entries up to 10× in the same
    * sweep; the substring+xxhash64 COLUMN rewrite still left a
    * 1.4-1.7× band; the kernel isolates the dense byte work in one
    * compiled method (BASELINE.md r18 attribution; A/B skip-run
    * evidence). AQE splits skewed hash keys (pathological repeated
    * windows — boilerplate, whitespace runs). Per-doc run assembly
    * shuffles only duplicated positions partitioned BY DOC — never a
    * global sort. */
  val dedupSubstringSuffix: CatalogEntry = CatalogEntry(
    "dedup_substring_suffix",
    """WITH dd AS (SELECT doc_id, text FROM documents
      |            WHERE text IS NOT NULL AND length(text) >= 50),
      |px AS (SELECT doc_id, text,
      |         unnest(generate_series(1, length(text) - 49)) AS pos
      |       FROM dd),
      |w AS (SELECT doc_id, pos, substring(text, pos, 50) AS suf FROM px),
      |s AS (SELECT doc_id, pos, suf,
      |        lag(suf)  OVER (ORDER BY suf, doc_id, pos) AS prv,
      |        lead(suf) OVER (ORDER BY suf, doc_id, pos) AS nxt
      |      FROM w),
      |dup AS (SELECT doc_id, pos FROM s WHERE suf = prv OR suf = nxt),
      |isl AS (SELECT doc_id, pos,
      |          pos - row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY pos) AS g
      |        FROM dup)
      |SELECT doc_id, min(pos)::BIGINT AS start_pos,
      |  (max(pos) - min(pos) + 50)::BIGINT AS run_len,
      |  count(*)::BIGINT AS n_windows
      |FROM isl GROUP BY doc_id, g
      |ORDER BY doc_id, start_pos""".stripMargin) { (s, d) =>
    import s.implicits._
    substringSuffixRuns(Tables.documents(s, d)
      .select($"doc_id", $"text"), L = 50)
  }

  /** [[dedupSubstringSuffix]]'s operator over any (doc_id, text)
    * frame — extracted so the spec can plant embedded-duplicate
    * fixtures. Output: one row per MAXIMAL duplicated run ≥ L chars,
    * (doc_id, start_pos 1-based, run_len, n_windows), ordered. */
  private[queries] def substringSuffixRuns(docs: DataFrame,
      L: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val dd = docs.where(col("text").isNotNull && length(col("text")) >= L)
      .select(col("doc_id"), col("text"))
    // ALL window hashes from ONE row-local kernel call per doc — no
    // substring/xxhash64 column code ever runs over the 50×-corpus
    // window relation (the r18 JIT-hygiene lesson, twice over: the
    // first cut's Window-sort polluted at 10×, the substring+xxhash64
    // column rewrite still at 1.4-1.7×; the kernel isolates the dense
    // byte work in one compiled method)
    val wh = Tables.spreadScan(dd)
      .select(col("doc_id"), posexplode(
        call_function("win_hash_x64", col("text"), lit(L)))
        .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    // narrow hash-count exchange + broadcast semi-join prefilter; only
    // the candidates re-materialize their window STRING (row-local
    // substring after a doc_id join on the tiny candidate set) for the
    // exact-equality confirm (collision-safe — a 64-bit collision adds
    // a candidate here and is removed below)
    val dupH = wh.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h"))
    val cand = wh.join(broadcast(dupH), Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val candS = cand.join(dd, Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos, $L)").as("suf"))
    val dupSuf = candS.groupBy(col("suf")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("suf"))
    val dup = candS.join(broadcast(dupSuf), Seq("suf"), "left_semi")
      .select(col("doc_id"), col("pos"))
    dup
      .withColumn("g", col("pos") -
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        (max(col("pos")) - min(col("pos")) + L).cast("long").as("run_len"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("start_pos"), col("run_len"),
        col("n_windows"))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** Cross-document duplicated-span STRIP — the transform half of
    * [[dedupSubstringSuffix]] (Lee et al. 2022, arXiv:2107.06499
    * §4.1 actually REMOVES the duplicated spans; the census entry only
    * reports them) fused with [[docStripRepeatedSpans]]' surgery layer
    * generalized to CROSS-doc runs. Semantics, exactly: a position p
    * in doc d is DUPLICATED when its L = 50-char window content occurs
    * ≥ 2 times corpus-wide; among all occurrences of one window
    * content the canonical copy is the (min doc_id, min pos) one
    * (keep-first-occurrence); every character covered by a
    * NON-canonical duplicated position's window is removed. Removed
    * windows merge into maximal char intervals (same-length windows
    * sorted by start merge iff gap ≤ L — lag-based, no interval tree),
    * and the doc re-assembles from the surviving segments. Emitted per
    * doc: char count, interval count, chars removed, and the stripped
    * text itself — the Lee et al. output corpus plus its
    * bytes-removed census in one pass.
    *
    * Scale shape: inherits [[substringSuffixRuns]]' exchange diet —
    * ONE `win_hash_x64` kernel call per doc, a narrow hash-count
    * exchange, broadcast semi-join prefilter, string confirm on the
    * candidate set only (collision-safe; canonicality is decided on
    * the CONFIRMED string groups, so a 64-bit collision can neither
    * remove nor keep the wrong copy). Interval merge + segment
    * re-assembly are per-doc window + ONE row-local `aggregate` fold
    * over the (tiny) merged-interval array — the full text shuffles
    * exactly zero times: the interval table (duplicated-doc-sized)
    * broadcasts back onto the scan. Canonicality is a genuine
    * lexicographic struct-min on (doc_id, pos) — unbounded, unlike
    * an arithmetic key encoding (ADVICE r19). The oracle replays the
    * literal formulation: all windows grouped by content, keep-first
    * by (min doc_id, then min pos within it), char-level coverage
    * join, string_agg surgery. */
  val dedupStripSpans: CatalogEntry = CatalogEntry(
    "dedup_strip_spans",
    """WITH docs0 AS (SELECT doc_id, text FROM documents
      |               WHERE text IS NOT NULL AND length(text) > 0),
      |dd AS (SELECT doc_id, text FROM docs0 WHERE length(text) >= 50),
      |px AS (SELECT doc_id, text,
      |         unnest(generate_series(1, length(text) - 49)) AS pos
      |       FROM dd),
      |w AS (SELECT doc_id, pos, substring(text, pos, 50) AS suf FROM px),
      |f AS (SELECT suf, count(*) AS c, min(doc_id) AS fd
      |      FROM w GROUP BY suf),
      |fp AS (SELECT w.suf, min(w.pos) AS fpos
      |       FROM w JOIN f ON w.suf = f.suf AND w.doc_id = f.fd
      |       GROUP BY w.suf),
      |rm AS (SELECT w.doc_id, w.pos
      |       FROM w JOIN f USING (suf) JOIN fp USING (suf)
      |       WHERE f.c >= 2 AND (w.doc_id > f.fd
      |         OR (w.doc_id = f.fd AND w.pos > fp.fpos))),
      |b AS (SELECT doc_id, pos,
      |        CASE WHEN pos > coalesce(lag(pos) OVER (
      |            PARTITION BY doc_id ORDER BY pos), -100) + 50
      |        THEN 1 ELSE 0 END AS brk
      |      FROM rm),
      |g AS (SELECT doc_id, pos,
      |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |      FROM b),
      |runs AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 49 AS e
      |         FROM g GROUP BY doc_id, grp),
      |ch AS (SELECT doc_id, text,
      |         unnest(generate_series(1, length(text))) AS i
      |       FROM docs0),
      |cv AS (SELECT ch.doc_id, ch.i, substring(ch.text, ch.i, 1) AS c,
      |         CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS cov
      |       FROM ch LEFT JOIN runs r
      |         ON r.doc_id = ch.doc_id AND ch.i BETWEEN r.s AND r.e),
      |agg AS (SELECT doc_id,
      |          coalesce(string_agg(c, '' ORDER BY i) FILTER (cov = 0),
      |                   '') AS clean_text,
      |          sum(cov)::BIGINT AS n_removed
      |        FROM cv GROUP BY doc_id),
      |rn AS (SELECT doc_id, count(*)::BIGINT AS n_runs
      |       FROM runs GROUP BY doc_id)
      |SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
      |  coalesce(rn.n_runs, 0)::BIGINT AS n_runs,
      |  coalesce(a.n_removed, 0)::BIGINT AS n_removed,
      |  a.clean_text
      |FROM docs0 d JOIN agg a USING (doc_id)
      |LEFT JOIN rn USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    stripCrossDocSpans(Tables.documents(s, d)
      .select($"doc_id", $"text"), L = 50)
  }

  /** [[dedupStripSpans]]' operator over any (doc_id, text) frame —
    * extracted so the spec can plant cross-doc duplicate fixtures.
    * Output per doc (text non-null, non-empty): (doc_id, n_chars,
    * n_runs, n_removed, clean_text), ordered by doc_id. */
  private[queries] def stripCrossDocSpans(docs: DataFrame,
      L: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val docs0 = docs
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", $"text")
    val dd = docs0.where(length($"text") >= L)
    // ONE kernel call per doc emits every window hash; the window
    // strings never shuffle (the r18 JIT + exchange-diet shape).
    // localCheckpoint (r21): wh feeds TWO consumers (the duplicate-
    // hash census and the candidate prefilter) — without it each
    // consumer re-ran the win_hash_x64 kernel over the whole corpus;
    // the checkpointed rows are 24-byte (doc, pos, hash) triples.
    val wh = Tables.spreadScan(dd)
      .select($"doc_id", posexplode(
        call_function("win_hash_x64", $"text", lit(L)))
        .as(Seq("p0", "h")))
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"h")
      .localCheckpoint()
    val dupH = wh.groupBy($"h").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"h")
    val cand = wh.join(broadcast(dupH), Seq("h"), "left_semi")
      .select($"doc_id", $"pos")
    // exact confirm: only candidates re-materialize their window
    // string; canonicality (keep-first) decided on the string groups.
    // localCheckpoint: candS feeds TWO consumers (the group census and
    // the non-canonical filter) — without it each consumer re-runs the
    // kernel explode + prefilter chain (the multi-consumer recompute
    // trap); the checkpoint is candidate-sized, never corpus-sized
    val candS = cand.join(dd, Seq("doc_id"))
      .select($"doc_id", $"pos",
        expr(s"substring(text, cast(pos as int), $L)").as("suf"))
      .localCheckpoint()
    // genuine lexicographic (min doc_id, min pos) canonical copy via
    // struct-min (ADVICE r19: the old doc_id*1e8+pos encoding silently
    // changed canonicality for docs ≥ 1e8 chars and overflowed Long at
    // doc_id ≳ 9.2e10 — struct ordering has no such bounds)
    val sufInfo = candS.groupBy($"suf").agg(count(lit(1)).as("c"),
      min(struct($"doc_id", $"pos")).as("fk"))
      .where($"c" >= 2)
    val rm = candS.join(broadcast(sufInfo), Seq("suf"))
      .where(struct($"doc_id", $"pos") > $"fk")
      .select($"doc_id", $"pos")
    stripSurgery(docs0, rm, L)
  }

  /** Interval-merge + surgery layer shared by [[dedupStripSpans]] and
    * [[dedupStripIncremental]]: given the output doc set `docs0`
    * (doc_id, text) and the removed-position set `rm` (doc_id, pos —
    * each covering chars [pos, pos+L−1]), merge same-length windows
    * into maximal intervals (gap ≤ L, the lag rule IS the interval
    * merge), re-assemble each doc from the surviving segments via ONE
    * row-local `aggregate` fold, and emit per doc (doc_id, n_chars,
    * n_runs, n_removed, clean_text) ordered by doc_id. The interval
    * table is duplicated-doc-sized and broadcasts back onto the scan —
    * the full text shuffles zero times (at 100 TB, a bucketed-by-
    * doc_id layout keeps the join shuffle-free if it outgrows
    * broadcast). */
  private def stripSurgery(docs0: DataFrame, rm: DataFrame,
      L: Int): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val wdoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val runs = rm
      .withColumn("brk",
        when($"pos" > coalesce(lag($"pos", 1).over(wdoc), lit(-100L)) + L,
          1L).otherwise(0L))
      .withColumn("grp", sum($"brk").over(
        wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").cast("int").as("s"),
        (max($"pos") + L - 1).cast("int").as("e"))
    val runArr = runs.groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"s", $"e"))).as("runs"),
        count(lit(1)).as("n_runs"),
        sum($"e" - $"s" + 1).cast("long").as("n_removed"))
    docs0.join(broadcast(runArr), Seq("doc_id"), "left")
      .select($"doc_id",
        length($"text").cast("long").as("n_chars"),
        coalesce($"n_runs", lit(0L)).as("n_runs"),
        coalesce($"n_removed", lit(0L)).as("n_removed"),
        expr(
          """aggregate(coalesce(runs, array()),
            |  named_struct('p', 1, 'acc', ''),
            |  (st, r) -> named_struct('p', r.e + 1,
            |    'acc', concat(st.acc, substring(text, st.p, r.s - st.p))),
            |  st -> concat(st.acc,
            |    substring(text, st.p, length(text) - st.p + 1)))"""
            .stripMargin).as("clean_text"))
      .orderBy($"doc_id")
  }

  /** INCREMENTAL cross-doc span STRIP — [[dedupStripSpans]] composed
    * with the `dedup_incremental_ref` batch pattern (r19 verdict item
    * 6): the streaming face of Lee et al. 2022 (arXiv:2107.06499)
    * dedup, which is how a 100 TB pipeline actually runs — a NEW
    * batch (doc_id % 3 = 0, the established incremental split) is
    * stripped against the persisted window store of the already-
    * curated corpus (doc_id % 3 != 0) plus its own within-batch
    * duplicates; the old corpus is never re-surgered. Semantics,
    * exactly: position p of new doc d is REMOVED when its L = 50-char
    * window content (a) occurs ANYWHERE in the reference corpus (the
    * reference copy is already canonical — every new occurrence is a
    * duplicate), or (b) occurs ≥ 2 times within the new batch and
    * (d, p) is not the batch's lexicographic struct-min occurrence
    * (keep-first within batch, [[dedupStripSpans]]' rule). Removed
    * windows merge and each new doc re-assembles via [[stripSurgery]].
    * Output: every NEW-batch doc (char count, interval count, chars
    * removed, stripped text), ordered by doc_id.
    *
    * Scale shape: the reference store is what a production run
    * PERSISTS — distinct window hashes plus a string confirm key;
    * here it is built inline with ONE `win_hash_x64` kernel pass over
    * the reference corpus. Decision flow is hash-first: the new
    * batch's hashes semi-join the store (narrow hash rows, the only
    * corpus-wide exchange), within-batch duplicate hashes broadcast,
    * and ONLY hash-matched candidates ever materialize their window
    * string (collision-safe string confirm on both sides — a 64-bit
    * collision can neither strip nor keep the wrong span). The full
    * text of either corpus never shuffles; only the new batch —
    * typically orders of magnitude smaller than the corpus — pays
    * surgery. */
  val dedupStripIncremental: CatalogEntry = CatalogEntry(
    "dedup_strip_incremental",
    """WITH d AS (SELECT doc_id, text FROM documents
      |           WHERE text IS NOT NULL AND length(text) > 0),
      |nd0 AS (SELECT doc_id, text FROM d WHERE doc_id % 3 = 0),
      |rd AS (SELECT doc_id, text FROM d
      |       WHERE doc_id % 3 != 0 AND length(text) >= 50),
      |npx AS (SELECT doc_id, text,
      |          unnest(generate_series(1, length(text) - 49)) AS pos
      |        FROM nd0 WHERE length(text) >= 50),
      |nw AS (SELECT doc_id, pos, substring(text, pos, 50) AS suf
      |       FROM npx),
      |rpx AS (SELECT doc_id, text,
      |          unnest(generate_series(1, length(text) - 49)) AS pos
      |        FROM rd),
      |rs AS (SELECT DISTINCT substring(text, pos, 50) AS suf FROM rpx),
      |rmref AS (SELECT doc_id, pos FROM nw
      |          WHERE suf IN (SELECT suf FROM rs)),
      |nf AS (SELECT suf, count(*) AS c, min(doc_id) AS fd
      |       FROM nw GROUP BY suf),
      |nfp AS (SELECT nw.suf, min(nw.pos) AS fpos
      |        FROM nw JOIN nf ON nw.suf = nf.suf AND nw.doc_id = nf.fd
      |        GROUP BY nw.suf),
      |rmnew AS (SELECT nw.doc_id, nw.pos
      |          FROM nw JOIN nf USING (suf) JOIN nfp USING (suf)
      |          WHERE nf.c >= 2 AND (nw.doc_id > nf.fd
      |            OR (nw.doc_id = nf.fd AND nw.pos > nfp.fpos))),
      |rm AS (SELECT doc_id, pos FROM rmref
      |       UNION SELECT doc_id, pos FROM rmnew),
      |b AS (SELECT doc_id, pos,
      |        CASE WHEN pos > coalesce(lag(pos) OVER (
      |            PARTITION BY doc_id ORDER BY pos), -100) + 50
      |        THEN 1 ELSE 0 END AS brk
      |      FROM rm),
      |g AS (SELECT doc_id, pos,
      |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |      FROM b),
      |runs AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 49 AS e
      |         FROM g GROUP BY doc_id, grp),
      |ch AS (SELECT doc_id, text,
      |         unnest(generate_series(1, length(text))) AS i
      |       FROM nd0),
      |cv AS (SELECT ch.doc_id, ch.i, substring(ch.text, ch.i, 1) AS c,
      |         CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS cov
      |       FROM ch LEFT JOIN runs r
      |         ON r.doc_id = ch.doc_id AND ch.i BETWEEN r.s AND r.e),
      |agg AS (SELECT doc_id,
      |          coalesce(string_agg(c, '' ORDER BY i) FILTER (cov = 0),
      |                   '') AS clean_text,
      |          sum(cov)::BIGINT AS n_removed
      |        FROM cv GROUP BY doc_id),
      |rn AS (SELECT doc_id, count(*)::BIGINT AS n_runs
      |       FROM runs GROUP BY doc_id)
      |SELECT nd0.doc_id, length(nd0.text)::BIGINT AS n_chars,
      |  coalesce(rn.n_runs, 0)::BIGINT AS n_runs,
      |  coalesce(a.n_removed, 0)::BIGINT AS n_removed,
      |  a.clean_text
      |FROM nd0 JOIN agg a USING (doc_id)
      |LEFT JOIN rn USING (doc_id)
      |ORDER BY nd0.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    stripIncremental(Tables.documents(s, d)
      .select($"doc_id", $"text"), L = 50)
  }

  /** [[dedupStripIncremental]]' operator over any (doc_id, text)
    * frame — extracted so the spec can plant cross-batch duplicate
    * fixtures. New batch = doc_id % 3 = 0; reference = the rest. */
  private[queries] def stripIncremental(docs: DataFrame,
      L: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val docs0 = docs
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", $"text")
    val newDocs = docs0.where($"doc_id" % 3 === 0)
    val refDocs = docs0.where($"doc_id" % 3 =!= 0 &&
      length($"text") >= L)
    val newDd = newDocs.where(length($"text") >= L)
    // ONE kernel pass for BOTH sides (r22, r21 verdict item 4; guide
    // §5 multi-consumer): new batch and reference partition the
    // length >= L corpus by doc_id % 3, so the two r21 per-side
    // kernel passes were two full scans of the same parquet (the % 3
    // predicate cannot prune row groups) each paying its own job.
    // One tagged pass runs the win_hash_x64 kernel once over the
    // union and checkpoints 25-byte (doc, is_new, pos, hash) rows;
    // the side streams are row-local filters of the checkpoint. The
    // r21 rationale is otherwise unchanged: nw has THREE consumers
    // (within-batch dup census, store probe, keep-first confirm) and
    // rw TWO (store build, ref confirm) — window strings never
    // shuffle or checkpoint.
    val wh = Tables.spreadScan(docs0.where(length($"text") >= L))
      .select($"doc_id", ($"doc_id" % 3 === 0).as("is_new"),
        posexplode(call_function("win_hash_x64", $"text", lit(L)))
          .as(Seq("p0", "h")))
      .select($"doc_id", $"is_new",
        ($"p0" + 1).cast("long").as("pos"), $"h")
      .localCheckpoint()
    val nw = wh.where($"is_new").select($"doc_id", $"pos", $"h")
    val rw = wh.where(!$"is_new").select($"doc_id", $"pos", $"h")
    // the persisted store: distinct reference window hashes
    val refHset = rw.select($"h").distinct()
    // within-batch duplicate hashes: small by construction → broadcast
    val newDupH = nw.groupBy($"h").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"h")
    // new-batch positions whose hash hit the store: the one
    // corpus-wide exchange, over 24-byte hash rows
    val nwRefHit = nw.join(refHset, Seq("h"), "left_semi")
      .localCheckpoint() // feeds the confirm-hash set AND the confirm
    // string confirm, candidates only — ref side re-materializes just
    // the windows whose hash the new batch asked about
    val refNeedH = nwRefHit.select($"h").distinct()
    val refS = rw.join(refNeedH, Seq("h"), "left_semi")
      .join(refDocs, Seq("doc_id"))
      .select(expr(s"substring(text, cast(pos as int), $L)").as("suf"))
      .distinct()
    val rmRef = nwRefHit.join(newDd, Seq("doc_id"))
      .select($"doc_id", $"pos",
        expr(s"substring(text, cast(pos as int), $L)").as("suf"))
      .join(refS, Seq("suf"), "left_semi")
      .select($"doc_id", $"pos")
    // within-batch keep-first (the dedupStripSpans struct-min rule)
    val candNewS = nw.join(broadcast(newDupH), Seq("h"), "left_semi")
      .join(newDd, Seq("doc_id"))
      .select($"doc_id", $"pos",
        expr(s"substring(text, cast(pos as int), $L)").as("suf"))
      .localCheckpoint() // two consumers, candidate-sized
    val nfInfo = candNewS.groupBy($"suf").agg(count(lit(1)).as("c"),
      min(struct($"doc_id", $"pos")).as("fk"))
      .where($"c" >= 2)
    val rmNew = candNewS.join(broadcast(nfInfo), Seq("suf"))
      .where(struct($"doc_id", $"pos") > $"fk")
      .select($"doc_id", $"pos")
    stripSurgery(newDocs, rmRef.union(rmNew).distinct(), L)
  }

  /** Per-(source, log2-token-count) histogram — the sequence-length
    * profile a packing/batching stage reads before choosing context
    * lengths. The bucket is the BIT LENGTH of the token count
    * (`length(bin(n)) − 1` = ⌊log₂ n⌋ computed on the binary string
    * representation — no float log to straddle a power-of-two boundary
    * differently per engine). One partial-aggregated shuffle to a few
    * dozen groups; token counts come from `size(split(...))`, never a
    * second scan. */
  val tokenLengthHistogram: CatalogEntry = CatalogEntry(
    "token_length_histogram",
    """WITH t AS (
      |  SELECT source, len(string_split(text, ' '))::BIGINT AS ntok
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0)
      |SELECT source, (length(bin(ntok)) - 1)::BIGINT AS log2_bucket,
      |  count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS sum_tokens,
      |  min(ntok) AS min_tokens, max(ntok) AS max_tokens
      |FROM t GROUP BY 1, 2
      |ORDER BY source, log2_bucket""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"source",
        size(TextOps.tokens($"text")).cast("bigint").as("ntok"))
      .groupBy($"source",
        (length(bin($"ntok")) - 1).cast("bigint").as("log2_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("sum_tokens"),
        min($"ntok").as("min_tokens"), max($"ntok").as("max_tokens"))
      .orderBy($"source", $"log2_bucket")
  }

  /** Priority-keep dedup — the production refinement of
    * `dedup_exact`'s min-id winner: among duplicate copies, keep the
    * copy from the HIGHEST-PRIORITY source (curated beats crawled),
    * not the arbitrary min-id one. The duplicate class here is the
    * 64-char-prefix digest — the "templated boilerplate head" rule
    * that groups share-a-header docs (byte-identical copies are a
    * subset; the same code runs on md5 of the full text or any
    * cluster id). Priority is the source's numeric suffix
    * (src0 ≻ src1 ≻ …); a real pipeline broadcasts a source→rank
    * dim. The winner is row_number = 1 under the total order
    * (priority, doc_id) — deterministic for the oracle, and the same
    * window carries the copy count, so one shuffle serves both.
    *
    * Scale shape: the window partitions on the 16-byte DIGEST, not
    * the document, so the exchange carries fixed-width keys plus row
    * metadata, never text payloads; group cardinality ≈ corpus size,
    * so partitions distribute evenly (no single-task risk). */
  val dedupPriorityKeep: CatalogEntry = CatalogEntry(
    "dedup_priority_keep",
    """WITH p AS (
      |  SELECT doc_id, source, md5(substring(text, 1, 64)) AS gkey,
      |    substring(source, 4)::BIGINT AS prio
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, gkey, prio,
      |    row_number() OVER (PARTITION BY gkey ORDER BY prio, doc_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY gkey) AS n_copies
      |  FROM p)
      |SELECT doc_id, source, n_copies::BIGINT AS n_copies
      |FROM r WHERE rn = 1 AND n_copies >= 2
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"gkey")
    val p = Tables.documents(s, d)
      .select($"doc_id", $"source",
        md5(substring($"text", 1, 64)).as("gkey"),
        substring($"source", 4, 16).cast("bigint").as("prio"))
    p.withColumn("rn",
        row_number().over(w.orderBy($"prio", $"doc_id")))
      .withColumn("n_copies", count(lit(1)).over(w))
      .where($"rn" === 1 && $"n_copies" >= 2)
      .select($"doc_id", $"source",
        $"n_copies".cast("bigint").as("n_copies"))
      .orderBy($"doc_id")
  }

  /** Candidate-generator QUALITY census — the measurement a pipeline
    * owner reads before trusting near-dup removal at 100 TB: every
    * candidate pair the rare-gram blocker emits, verified with its
    * EXACT 13-gram Jaccard and bucketed into a precision histogram
    * (bucket = ⌊10·J⌋; bucket 10 = byte-identical gram sets). A
    * blocker that floods buckets 0-2 wastes verify compute; one whose
    * mass sits in 8-10 is safe to act on — this entry makes that
    * judgment a query instead of folklore.
    *
    * Scale shape: candidates come from the production blocker
    * ([[Dedup.sharedGramPairs]] — bounded postings, never all-pairs);
    * the verify stage joins pairs back to per-doc gram sets on each
    * endpoint (two hash joins keyed on doc id) and the Jaccard is one
    * row-local `array_intersect` per pair — computed ONCE into a
    * column before the arithmetic (projecting it k times re-inlines
    * the intersection k times under CollapseProject). All-integer
    * ppm: `(1e6·|∩|) div (|A|+|B|−|∩|)`, denominator ≥ 1 since a
    * candidate shares ≥ 1 gram. At 100 TB the histogram runs on a
    * hash-sampled slice of the pairs; the plan is unchanged. */
  val dedupCandidateQuality: CatalogEntry = CatalogEntry(
    "dedup_candidate_quality",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |gl AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(list_slice(toks, i, i + 12), ' ')
      |                   for i in range(1, greatest(len(toks) - 11, 1))])
      |      AS gs
      |  FROM t),
      |g AS (SELECT doc_id, unnest(gs) AS gram FROM gl),
      |rare AS (SELECT gram FROM g GROUP BY gram
      |         HAVING count(*) BETWEEN 2 AND 50),
      |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |      WHERE a.gram IN (SELECT gram FROM rare)),
      |j AS (
      |  SELECT src, dst, len(x.gs) AS na, len(y.gs) AS nb,
      |    len(list_intersect(x.gs, y.gs)) AS ni
      |  FROM e JOIN gl x ON x.doc_id = src JOIN gl y ON y.doc_id = dst),
      |p AS (SELECT (1000000 * ni) // (na + nb - ni) AS jac_ppm FROM j)
      |SELECT (jac_ppm * 10 // 1000000)::BIGINT AS bucket,
      |  count(*)::BIGINT AS n_pairs,
      |  min(jac_ppm)::BIGINT AS min_ppm, max(jac_ppm)::BIGINT AS max_ppm
      |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val pairs0 = Dedup.sharedGramPairs(docs, "doc_id", "text",
      n = 13, maxDf = 50)
    val gl0 = Tables.spreadScan(docs.where($"text".isNotNull))
      .select($"doc_id", Dedup.tokenNgrams($"text", 13).as("gs"))
    // candidate-endpoint slice (r21, guide §3.2/§8): the 13-gram
    // arrays are computed and shuffled for candidate endpoints only —
    // the r20 plan joined the FULL per-doc array table onto the pairs
    // twice
    val (pairs, gl) = Dedup.pairEndpointSlice(pairs0, gl0, "doc_id")
    pairs
      .join(gl.select($"doc_id".as("src"), $"gs".as("ga")), "src")
      .join(gl.select($"doc_id".as("dst"), $"gs".as("gb")), "dst")
      .select(size($"ga").as("na"), size($"gb").as("nb"),
        size(array_intersect($"ga", $"gb")).as("ni"))
      // size() yields IntegerType: 1000000*ni would wrap 32-bit for
      // docs with >= 2148 distinct 13-grams (~2160 tokens) — silent at
      // the test SFs (docs cap at 100 tokens) but live at corpus
      // scale, and the DuckDB oracle's len() is already BIGINT.
      // Promote before multiplying.
      .select(expr("(1000000L * cast(ni as bigint)) div " +
        "(cast(na as bigint) + nb - ni)").as("jac_ppm"))
      .groupBy(expr("(jac_ppm * 10) div 1000000").cast("bigint")
        .as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min($"jac_ppm").cast("bigint").as("min_ppm"),
        max($"jac_ppm").cast("bigint").as("max_ppm"))
      .orderBy($"bucket")
  }


  /** LSH recall S-curve census — the RECALL half of the measurement
    * pair whose PRECISION half is `dedup_candidate_quality`: for a
    * df-capped universe of ground-truth-ish pairs (docs sharing a
    * rare 5-token gram), bucket each pair by its EXACT character-
    * 3-shingle Jaccard and report what fraction the production
    * MinHash band scheme (k=8 → 4 bands × 2 rows) actually catches,
    * beside the textbook collision probability 1−(1−s²)⁴ (Broder '97
    * / Leskovec-Rajaraman-Ullman ch. 3) — the empirical-vs-theory
    * S-curve that justifies (bands, rows) before anyone trusts the
    * dedup's recall. The banding replays the PORTABLE md5 kernel
    * (`minhash_bands_md5`, the twin DuckDB already hash-verifies), so
    * the oracle recomputes both curves end to end.
    *
    * Exactness discipline: Jaccard in integer ppm; the theory curve
    * cleared of floats entirely AND of magnitude hazards — it is
    * computed from the MILLI-quantized similarity m = jac_ppm div
    * 10³ (s ≈ m/10³): 1−(1−s²)⁴ = (10²⁴−(10⁶−m²)⁴)/10²⁴ in
    * DECIMAL(38,0) / HUGEINT, whose magnitudes (≤ 10³⁰ with the ppm
    * scaling) are INDEPENDENT of document length — a formula on the
    * raw set sizes (u⁸·10⁶) silently overflows 38 digits once a doc
    * pair exceeds ~10⁴ distinct shingles, the same silent-at-test-SF
    * overflow class the candidate census had. The ≤ 10⁻³ similarity
    * quantization moves the four-band curve by < 0.5 % of a ppm
    * point — identical floor rounding in both engines, so no
    * boundary can flip.
    *
    * Scale shape: the pair universe is the same bounded-df posting
    * expansion as the candidate census (rare-gram equi-join, never
    * all-pairs; postings structurally capped at maxDf ids); per-doc
    * shingle sets and band arrays are computed once in a spread scan
    * and equi-joined to the pairs; everything after is row-local
    * integer algebra plus an 11-bucket aggregate. At 100 TB the
    * census runs on a hash-sampled slice of the corpus — recall
    * curves are estimates by nature — with the plan unchanged. */
  val dedupLshScurve: CatalogEntry = {
    val k = 8
    val mins = (0 until k).map(i =>
      s"""    min(('0x' || substring(md5(sh || '#$i'), 1, 15))::BIGINT) AS mh$i""")
      .mkString(",\n")
    val bandList = (0 until k / 2).map(j =>
      s"substring(sha256(mh${2 * j}::VARCHAR || '_' || " +
        s"mh${2 * j + 1}::VARCHAR), 1, 16)").mkString("[", ",\n     ", "]")
    CatalogEntry(
      "dedup_lsh_scurve",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents WHERE text IS NOT NULL),
         |gl AS (
         |  SELECT doc_id,
         |    list_distinct([array_to_string(list_slice(toks, i, i + 4), ' ')
         |                   for i in range(1, greatest(len(toks) - 3, 1))])
         |      AS gs
         |  FROM t),
         |g AS (SELECT doc_id, unnest(gs) AS gram FROM gl),
         |rare AS (SELECT gram FROM g GROUP BY gram
         |         HAVING count(*) BETWEEN 2 AND 25),
         |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |      WHERE a.gram IN (SELECT gram FROM rare)),
         |shl AS (
         |  SELECT doc_id,
         |    list_distinct([substring(text, i, 3)
         |                   for i in range(1, length(text) - 1)]) AS shg
         |  FROM documents WHERE text IS NOT NULL),
         |sh AS (SELECT doc_id, unnest(shg) AS sh FROM shl),
         |h AS (
         |  SELECT doc_id,
         |$mins
         |  FROM sh GROUP BY doc_id),
         |bl AS (
         |  SELECT doc_id,
         |    $bandList AS bands
         |  FROM h),
         |p AS (
         |  SELECT len(x.shg)::BIGINT AS na, len(y.shg)::BIGINT AS nb,
         |    len(list_intersect(x.shg, y.shg))::BIGINT AS ni,
         |    bx.bands AS ba, bb.bands AS bb
         |  FROM e
         |  JOIN shl x ON x.doc_id = src JOIN shl y ON y.doc_id = dst
         |  JOIN bl bx ON bx.doc_id = src JOIN bl bb ON bb.doc_id = dst),
         |q AS (
         |  SELECT (1000000 * ni) // (na + nb - ni) AS jac_ppm,
         |    (CASE WHEN ba[1] = bb[1] OR ba[2] = bb[2] OR ba[3] = bb[3]
         |               OR ba[4] = bb[4] THEN 1 ELSE 0 END) AS caught
         |  FROM p),
         |r AS (
         |  SELECT (jac_ppm * 10 // 1000000)::BIGINT AS bucket, caught,
         |    ((1000000::HUGEINT *
         |      (1000000000000000000000000::HUGEINT
         |       - (1000000 - (jac_ppm // 1000) * (jac_ppm // 1000))::HUGEINT
         |         * (1000000 - (jac_ppm // 1000) * (jac_ppm // 1000))
         |         * (1000000 - (jac_ppm // 1000) * (jac_ppm // 1000))
         |         * (1000000 - (jac_ppm // 1000) * (jac_ppm // 1000))))
         |     // 1000000000000000000000000::HUGEINT)::BIGINT AS theory_ppm
         |  FROM q)
         |SELECT bucket, count(*)::BIGINT AS n_pairs,
         |  sum(caught)::BIGINT AS n_caught,
         |  ((1000000 * sum(caught)) // count(*))::BIGINT AS recall_ppm,
         |  (sum(theory_ppm) // count(*))::BIGINT AS theory_avg_ppm
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val pairs0 = Dedup.sharedGramPairs(docs, "doc_id", "text",
        n = 5, maxDf = 25)
      graft.functions.GraftFunctions.register(s)
      val base0 = Tables.spreadScan(docs.where($"text".isNotNull))
        .select($"doc_id", TextOps.shingles($"text", 3).as("shg"),
          call_function("minhash_bands_md5", $"text", lit(k), lit(3))
            .as("bands"))
      // candidate-endpoint slice (r21, guide §3.2/§8): shingle sets
      // and band arrays are computed and shuffled for candidate
      // endpoints only
      val (pairs, base) = Dedup.pairEndpointSlice(pairs0, base0, "doc_id")
      pairs
        .join(base.select($"doc_id".as("src"), $"shg".as("sa"),
          $"bands".as("ba")), "src")
        .join(base.select($"doc_id".as("dst"), $"shg".as("sb"),
          $"bands".as("bb")), "dst")
        .select(size($"sa").cast("bigint").as("na"),
          size($"sb").cast("bigint").as("nb"),
          size(array_intersect($"sa", $"sb")).cast("bigint").as("ni"),
          expr("exists(zip_with(ba, bb, (x, y) -> x = y), p -> p)")
            .as("caught"))
        .select(expr("(1000000L * ni) div (na + nb - ni)").as("jac_ppm"),
          $"caught".cast("int").as("caught"))
        .select(expr("(jac_ppm * 10) div 1000000").cast("bigint")
          .as("bucket"), $"caught",
          expr("1000000L - (jac_ppm div 1000) * (jac_ppm div 1000)")
            .as("q2"))
        .select($"bucket", $"caught",
          expr("(1000000L * (cast(1000000000000000000000000 as decimal(38,0))" +
            " - cast(q2 as decimal(38,0)) * q2 * q2 * q2))" +
            " div cast(1000000000000000000000000 as decimal(38,0))")
            .as("theory_ppm"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"caught").cast("bigint").as("n_caught"),
          sum($"theory_ppm").as("sum_theory"))
        .select($"bucket", $"n_pairs",
          $"n_caught",
          expr("(1000000L * n_caught) div n_pairs").as("recall_ppm"),
          expr("sum_theory div n_pairs").as("theory_avg_ppm"))
        .orderBy($"bucket")
    }
  }

  /** BPE merge learning — the first 6 merge rounds of byte-pair
    * encoding learned from the corpus, the vocabulary-induction step
    * every tokenizer pipeline runs before `vocab_encode_docs` can
    * exist. Each round counts frequency-weighted adjacent symbol
    * pairs, picks the argmax under the total order (count DESC, pair
    * ASC — deterministic for the oracle), and applies the merge as a
    * boundary-safe left-to-right replace: the symbol string's
    * separators are doubled (each symbol gets its OWN flanking
    * spaces) before replacing ' a  b ' with ' ab ', so the pattern
    * only matches whole symbols — a naive replace of 'a b' also
    * fires where a symbol merely ends with 'a' ('xa b' -> 'xab'),
    * merging pairs the census never counted — while adjacent
    * occurrences still chain ('a a a' + (a,a) -> 'aa a', exactly the
    * greedy non-overlapping scan of BPE application), with the SAME
    * formula in both engines. Round 6 already learns a multi-character merge on
    * this corpus ("m er" -> "mer") — the real BPE dynamic, not a
    * bigram census.
    *
    * Scale shape: THE textbook reason BPE scales — learning runs on
    * the WORD-FREQUENCY table, not the corpus. The corpus-sized
    * shuffle happens exactly once (the word count); all 6 rounds are
    * vocab-sized: a tiny pair aggregate, a 1-row broadcast argmax,
    * and a row-local merge apply, with lineage truncated per round.
    * At 100 TB only the word count grows. */
  val vocabBpeMerges: CatalogEntry = CatalogEntry(
    "vocab_bpe_merges",
    bpeOracleChain(6) +
      """
        |SELECT * FROM (SELECT 1::BIGINT AS round, pr AS pair, cnt FROM m1
        |UNION ALL SELECT 2::BIGINT AS round, pr AS pair, cnt FROM m2
        |UNION ALL SELECT 3::BIGINT AS round, pr AS pair, cnt FROM m3
        |UNION ALL SELECT 4::BIGINT AS round, pr AS pair, cnt FROM m4
        |UNION ALL SELECT 5::BIGINT AS round, pr AS pair, cnt FROM m5
        |UNION ALL SELECT 6::BIGINT AS round, pr AS pair, cnt FROM m6)
        |ORDER BY round""".stripMargin) { (s, d) =>
    import s.implicits._
    val (rounds, _) = bpeLearn(s, d, nRounds = 6)
    rounds.reduce(_ unionByName _)
      .select($"round", $"pr".as("pair"), $"cnt")
      .orderBy($"round")
  }

  /** Shared BPE learning pipeline (see [[vocabBpeMerges]] for the full
    * semantics + scale rationale): returns the per-round argmax winner
    * tables AND the final word → symbol-sequence table after all
    * merges — the learned tokenizer state [[vocabBpeApply]] encodes
    * with. Extracted so the apply entry can never drift from the
    * learner the oracle verifies. */
  private def bpeLearn(s: org.apache.spark.sql.SparkSession, d: String,
      nRounds: Int)
      : (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select(explode(TextOps.tokens($"text")).as("word"))
      .where($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    var sym = words
      .withColumn("sym", trim(regexp_replace($"word", "(.)", "$1 ")))
      .localCheckpoint()
    val rounds = (1 to nRounds).map { r =>
      val winner = sym
        .select($"freq", split($"sym", " ").as("sy"))
        .select($"freq", explode(when(size($"sy") >= 2, expr(
          "transform(sequence(1, size(sy) - 1)," +
            " i -> concat(element_at(sy, i), ' ', element_at(sy, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("pr"))
        .groupBy($"pr").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"pr").limit(1)
        .withColumn("round", lit(r.toLong))
        .localCheckpoint() // argmax pinned; reused by output AND apply
      sym = sym
        .crossJoin(broadcast(winner.select($"pr".as("mpr"))))
        // Boundary-safe merge apply (see docstring): doubling the
        // separators gives every symbol its own flanking spaces, so
        // the padded pattern ' a  b ' can only match WHOLE symbols
        // (a plain replace of 'a b' also fires where a symbol merely
        // ENDS with 'a', e.g. 'xa b' -> 'xab' — a pair the census
        // never counted) and adjacent occurrences still chain
        // because each match consumes only its own padding.
        .withColumn("sym", expr(
          "trim(replace(replace(concat(' ', replace(sym, ' ', '  '), ' '), " +
            "concat(' ', replace(mpr, ' ', '  '), ' '), " +
            "concat(' ', replace(mpr, ' ', ''), ' ')), '  ', ' '))"))
        .drop("mpr")
        .localCheckpoint() // vocab-sized; truncates the 6-round lineage
      winner
    }
    (rounds, sym)
  }

  /** The s0→s6 merge-application CTE chain shared by the
    * [[vocabBpeMerges]] and [[vocabBpeApply]] oracles — built by the
    * same loop for both so the two statements cannot drift. */
  private def bpeOracleChain(nRounds: Int): String = {
    val head =
      """WITH w AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |        WHERE text IS NOT NULL)
        |  WHERE word <> '' GROUP BY word),
        |s0 AS (SELECT word, freq,
        |        trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM w)""".stripMargin
    head + (1 to nRounds).map { r =>
      s""",
         |p$r AS (
         |  SELECT pr, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest([sy[i] || ' ' || sy[i+1]
         |                         for i in range(1, len(sy))]) AS pr
         |    FROM (SELECT freq, string_split(sym, ' ') AS sy FROM s${r - 1}))
         |  GROUP BY pr),
         |m$r AS (SELECT pr, cnt FROM p$r ORDER BY cnt DESC, pr LIMIT 1),
         |s$r AS (SELECT word, freq, trim(replace(replace(
         |           ' ' || replace(sym, ' ', '  ') || ' ',
         |           ' ' || replace((SELECT pr FROM m$r), ' ', '  ') || ' ',
         |           ' ' || replace((SELECT pr FROM m$r), ' ', '') || ' '),
         |           '  ', ' ')) AS sym FROM s${r - 1})""".stripMargin
    }.mkString
  }

  /** BPE ENCODE — apply the [[vocabBpeMerges]]-learned merge table to
    * the corpus, the tokenize-for-training step that consumes what
    * the learner produces: per document, word count, post-merge BPE
    * token count, character mass, and fertility (tokens per char, in
    * exact-integer ppm) — the number that prices a corpus in context-
    * window budget and decides whether the learned vocabulary is
    * paying for itself.
    *
    * Scale shape: encoding NEVER re-runs merge scans over the corpus —
    * the learner's final word → symbol table (vocab-sized) carries
    * `n_tokens` per word, and encoding is one equi-join of the
    * exploded corpus word stream against it, then a per-doc partial
    * aggregate. At 100 TB the vocab side is millions of rows against
    * a corpus of trillions of words — Spark picks broadcast vs
    * shuffle join by its statistics; the corpus side shuffles only
    * (doc_id, counts). Every word is in-vocab by construction (the
    * vocab was learned from this corpus), so the inner join is
    * lossless — a production encoder over NEW text adds an OOV
    * fallback row. */
  val vocabBpeApply: CatalogEntry = CatalogEntry(
    "vocab_bpe_apply",
    bpeOracleChain(6) +
      """,
        |enc AS (SELECT word, len(string_split(sym, ' '))::BIGINT AS ntok
        |        FROM s6),
        |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |       FROM documents WHERE text IS NOT NULL),
        |j AS (SELECT doc_id, dw.word, ntok, length(dw.word)::BIGINT AS nch
        |      FROM dw JOIN enc USING (word) WHERE word <> '')
        |SELECT doc_id, count(*)::BIGINT AS n_words,
        |  sum(ntok)::BIGINT AS n_tokens, sum(nch)::BIGINT AS n_chars,
        |  ((1000000 * sum(ntok)) // sum(nch))::BIGINT AS tokens_per_char_ppm
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val (_, sym6) = bpeLearn(s, d, nRounds = 6)
    val enc = sym6.select($"word",
      size(split($"sym", " ")).cast("long").as("ntok"))
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("word"))
      .where($"word" =!= "")
      .join(enc, "word")
      .select($"doc_id", $"ntok", length($"word").cast("long").as("nch"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"ntok").as("n_tokens"),
        sum($"nch").as("n_chars"))
      .select($"doc_id", $"n_words", $"n_tokens", $"n_chars",
        expr("(1000000L * n_tokens) div n_chars").as("tokens_per_char_ppm"))
      .orderBy($"doc_id")
  }

  /** BPE FERTILITY BY LANGUAGE — tokens-per-word under the learned
    * merge table, per language: the tokenizer-equity census (Petrov et
    * al., "Language Model Tokenizers Introduce Unfairness Between
    * Languages", NeurIPS'23 — a language whose fertility runs 2× pays
    * 2× context budget and 2× compute per sentence). Consumes
    * [[bpeLearn]]'s final word → symbol table exactly like
    * [[vocabBpeApply]] (same chain, same oracle prefix — the two
    * cannot drift), then rolls the per-word token counts up by
    * language instead of by document; all ratios exact-integer ppm.
    *
    * Scale shape: identical to the apply entry — vocab-sized encode
    * table joined once against the exploded word stream, per-lang
    * rollup of a langs-sized table; the lang column rides the
    * document row, no second corpus scan. */
  val vocabFertilityByLang: CatalogEntry = CatalogEntry(
    "vocab_fertility_by_lang",
    bpeOracleChain(6) +
      """,
        |enc AS (SELECT word, len(string_split(sym, ' '))::BIGINT AS ntok
        |        FROM s6),
        |dw AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |       FROM documents WHERE text IS NOT NULL),
        |j AS (SELECT dw.lang, ntok, length(dw.word)::BIGINT AS nch
        |      FROM dw JOIN enc USING (word) WHERE word <> '')
        |SELECT lang, count(*)::BIGINT AS n_words,
        |  sum(ntok)::BIGINT AS n_tokens, sum(nch)::BIGINT AS n_chars,
        |  ((1000000 * sum(ntok)) // count(*))::BIGINT AS tokens_per_word_ppm,
        |  ((1000000 * sum(nch)) // sum(ntok))::BIGINT AS chars_per_token_ppm
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val (_, sym6) = bpeLearn(s, d, nRounds = 6)
    val enc = sym6.select($"word",
      size(split($"sym", " ")).cast("long").as("ntok"))
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"lang", explode(TextOps.tokens($"text")).as("word"))
      .where($"word" =!= "")
      .join(enc, "word")
      .select($"lang", $"ntok", length($"word").cast("long").as("nch"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"), sum($"ntok").as("n_tokens"),
        sum($"nch").as("n_chars"))
      .select($"lang", $"n_words", $"n_tokens", $"n_chars",
        expr("(1000000L * n_tokens) div n_words").as("tokens_per_word_ppm"),
        expr("(1000000L * n_chars) div n_tokens").as("chars_per_token_ppm"))
      .orderBy($"lang")
  }

  /** INVERSE-SIMPSON effective gram types per source — the
    * concentration-robust companion to [[corpusNgramDiversity]]: the
    * distinct/total ratio treats a million singletons plus one
    * million-count gram the same as a uniform census, while
    * N_eff = (Σn)²/Σn² (Hill number of order 2) collapses exactly
    * when probability mass concentrates — the statistic that catches
    * a source whose long tail LOOKS diverse while 90% of its text is
    * one template. Pure integer algebra end to end: Σn and Σn² are
    * exact sums (n² in DECIMAL(38,0)/HUGEINT — a 10¹² -occurrence
    * gram squares past int64), N_eff and the concentration ppm are
    * single integer divisions.
    *
    * Scale shape: same two-level aggregate as the diversity census —
    * map-side-combined (source, gram) cells are the only corpus-sized
    * exchange; the Simpson rollup runs on the per-source table. */
  val corpusSimpsonDiversity: CatalogEntry = CatalogEntry(
    "corpus_simpson_diversity",
    """WITH t AS (SELECT source, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT source,
      |        unnest([array_to_string(toks[i:i+2], ' ')
      |                for i in range(1, len(toks) - 1)]) AS gram
      |      FROM t WHERE len(toks) >= 3),
      |c AS (SELECT source, gram, count(*)::BIGINT AS n
      |      FROM g GROUP BY source, gram),
      |s AS (SELECT source, sum(n)::BIGINT AS nt, count(*)::BIGINT AS nd,
      |        sum(n::HUGEINT * n)::HUGEINT AS n2 FROM c GROUP BY source)
      |SELECT source, nt AS n_grams, nd AS n_distinct,
      |  ((nt::HUGEINT * nt) // n2)::BIGINT AS eff_types,
      |  ((1000000::HUGEINT * n2) // (nt::HUGEINT * nt))::BIGINT AS conc_ppm
      |FROM s ORDER BY source""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"source", TextOps.tokens($"text").as("toks"))
      .select($"source", explode(when(size($"toks") >= 3,
        transform(sequence(lit(1), size($"toks") - 2),
          i => array_join(slice($"toks", i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .groupBy($"source", $"gram")
      .agg(count(lit(1)).as("n"))
      .groupBy($"source")
      .agg(sum($"n").as("nt"), count(lit(1)).as("nd"),
        sum(($"n".cast("decimal(19,0)") * $"n".cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("n2"))
      .select($"source", $"nt".as("n_grams"), $"nd".as("n_distinct"),
        expr("cast((cast(nt as decimal(38,0)) * cast(nt as decimal(38,0)))" +
          " div n2 as bigint)").as("eff_types"),
        expr("cast((cast(1000000 as decimal(38,0)) * n2) div" +
          " (cast(nt as decimal(38,0)) * cast(nt as decimal(38,0)))" +
          " as bigint)").as("conc_ppm"))
      .orderBy($"source")
  }

  /** Corpus n-gram diversity census — distinct-trigram fraction per
    * source, the standard self-repetition / template-content signal
    * (the corpus-level face of `doc_repetition_stats`: a source whose
    * diversity_ppm collapses is boilerplate-stamping the same
    * trigrams, and mixture weights should know). Counts are
    * NON-distinct per document (unlike the dedup gram machinery): the
    * denominator is total trigram occurrences, so a source repeating
    * one page 1000× scores low even though its distinct set is tiny.
    *
    * Scale shape: two-level aggregate — (source, gram) census with
    * map-side partial aggregation (the gram stream never reaches the
    * driver), then a per-source rollup of a few-dozen-row table. The
    * only corpus-sized exchange carries partially-combined (source,
    * gram) cells; diversity is exact-integer ppm. */
  val corpusNgramDiversity: CatalogEntry = CatalogEntry(
    "corpus_ngram_diversity",
    """WITH t AS (SELECT source, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT source,
      |        unnest([array_to_string(toks[i:i+2], ' ')
      |                for i in range(1, len(toks) - 1)]) AS gram
      |      FROM t WHERE len(toks) >= 3),
      |c AS (SELECT source, gram, count(*)::BIGINT AS cnt
      |      FROM g GROUP BY source, gram)
      |SELECT source, sum(cnt)::BIGINT AS n_grams,
      |  count(*)::BIGINT AS n_distinct,
      |  ((1000000 * count(*)) // sum(cnt))::BIGINT AS diversity_ppm,
      |  max(cnt)::BIGINT AS top_gram_n
      |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"source", TextOps.tokens($"text").as("toks"))
      .select($"source", explode(when(size($"toks") >= 3,
        transform(sequence(lit(1), size($"toks") - 2),
          i => array_join(slice($"toks", i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .groupBy($"source", $"gram")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"source")
      .agg(sum($"cnt").as("n_grams"), count(lit(1)).as("n_distinct"),
        max($"cnt").as("top_gram_n"))
      .select($"source", $"n_grams", $"n_distinct",
        expr("(1000000L * n_distinct) div n_grams").as("diversity_ppm"),
        $"top_gram_n")
      .orderBy($"source")
  }

  /** Asymmetric CONTAINMENT census over the rare-gram candidate
    * stream — Broder's second resemblance measure: `|A∩B| / min(|A|,
    * |B|)` scores a document quoted or embedded inside a larger one
    * near 1.0 where symmetric Jaccard (divided by the UNION) dilutes
    * it toward |A|/|B| and the near-dup threshold misses it. Emits
    * every candidate pair at containment ≥ 0.5 with both measures, so
    * the gap column IS the quote/subset signal. Candidates come from
    * the production blocker ([[Dedup.sharedGramPairs]], df-capped,
    * never all-pairs); the verify stage is the `dedup_candidate_
    * quality` shape — two id-keyed hash joins, one row-local
    * `array_intersect` per pair computed once into a column,
    * all-BIGINT ppm arithmetic (sizes promoted before multiplying —
    * the 32-bit-wrap class the candidate census hit). */
  val dedupContainment: CatalogEntry = CatalogEntry(
    "dedup_containment",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |gl AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(list_slice(toks, i, i + 4), ' ')
      |                   for i in range(1, greatest(len(toks) - 3, 1))])
      |      AS gs
      |  FROM t),
      |g AS (SELECT doc_id, unnest(gs) AS gram FROM gl),
      |rare AS (SELECT gram FROM g GROUP BY gram
      |         HAVING count(*) BETWEEN 2 AND 25),
      |e AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |      WHERE a.gram IN (SELECT gram FROM rare)),
      |j AS (
      |  SELECT src, dst, len(x.gs)::BIGINT AS na, len(y.gs)::BIGINT AS nb,
      |    len(list_intersect(x.gs, y.gs))::BIGINT AS ni
      |  FROM e JOIN gl x ON x.doc_id = src JOIN gl y ON y.doc_id = dst)
      |SELECT src, dst, na, nb, ni,
      |  ((1000000 * ni) // least(na, nb))::BIGINT AS cont_ppm,
      |  ((1000000 * ni) // (na + nb - ni))::BIGINT AS jac_ppm
      |FROM j WHERE (1000000 * ni) // least(na, nb) >= 500000
      |ORDER BY src, dst""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val pairs0 = Dedup.sharedGramPairs(docs, "doc_id", "text",
      n = 5, maxDf = 25)
    val gl0 = Tables.spreadScan(docs.where($"text".isNotNull))
      .select($"doc_id", Dedup.tokenNgrams($"text", 5).as("gs"))
    // candidate-endpoint slice (r21, guide §3.2/§8): gram arrays are
    // computed and shuffled for candidate endpoints only
    val (pairs, gl) = Dedup.pairEndpointSlice(pairs0, gl0, "doc_id")
    pairs
      .join(gl.select($"doc_id".as("src"), $"gs".as("ga")), "src")
      .join(gl.select($"doc_id".as("dst"), $"gs".as("gb")), "dst")
      .select($"src", $"dst",
        size($"ga").cast("bigint").as("na"),
        size($"gb").cast("bigint").as("nb"),
        size(array_intersect($"ga", $"gb")).cast("bigint").as("ni"))
      .where(expr("(1000000L * ni) div least(na, nb)") >= 500000L)
      .select($"src", $"dst", $"na", $"nb", $"ni",
        expr("(1000000L * ni) div least(na, nb)").as("cont_ppm"),
        expr("(1000000L * ni) div (na + nb - ni)").as("jac_ppm"))
      .orderBy($"src", $"dst")
  }

  /** Incremental ingest dedup — dedup a NEW batch against the
    * EXISTING corpus, the shape every production pipeline actually
    * runs (a fresh crawl lands against petabytes already curated; a
    * corpus-wide re-dedup is the thing you cannot afford). Two
    * layers, verdict per new document: exact (content digest seen in
    * the reference corpus) then near-dup (rare-gram-blocked candidate
    * pairs vs the reference side only, confirmed by exact 5-gram
    * Jaccard ≥ 0.3). The split here is a deterministic id fixture
    * (`doc_id % 3`) standing in for yesterday's-corpus vs today's-
    * batch; production passes two real tables.
    *
    * Scale shape: the exact layer joins fixed-width digests, never
    * text, LEFT SEMI against the reference digest set. The near
    * layer's gram df-cap is computed over the UNION corpus (a gram
    * hot in the reference must block pairs for the new side too), the
    * rare set broadcast-semi-joins the gram stream, and candidate
    * fanout per gram is bounded by the df cap exactly as in
    * [[Dedup.sharedGramPairs]] — the new×ref join never sees an
    * uncapped hot key. Output is new-batch-sized (one verdict row per
    * new doc). */
  val dedupIncrementalRef: CatalogEntry = CatalogEntry(
    "dedup_incremental_ref",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |nd AS (SELECT * FROM d WHERE doc_id % 3 = 0),
      |rd AS (SELECT * FROM d WHERE doc_id % 3 != 0),
      |ex AS (SELECT DISTINCT nd.doc_id FROM nd
      |       JOIN rd ON md5(nd.text) = md5(rd.text)),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
      |gl AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(list_slice(toks, i, i + 4), ' ')
      |                   for i in range(1, greatest(len(toks) - 3, 1))])
      |      AS gs
      |  FROM t),
      |g AS (SELECT doc_id, unnest(gs) AS gram FROM gl),
      |rare AS (SELECT gram FROM g GROUP BY gram
      |         HAVING count(*) BETWEEN 2 AND 25),
      |e AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS rid
      |      FROM g a JOIN g b ON a.gram = b.gram
      |      WHERE a.gram IN (SELECT gram FROM rare)
      |        AND a.doc_id % 3 = 0 AND b.doc_id % 3 != 0),
      |j AS (
      |  SELECT nid, len(x.gs)::BIGINT AS na, len(y.gs)::BIGINT AS nb,
      |    len(list_intersect(x.gs, y.gs))::BIGINT AS ni
      |  FROM e JOIN gl x ON x.doc_id = nid JOIN gl y ON y.doc_id = rid),
      |c AS (SELECT nid,
      |        max((1000000 * ni) // (na + nb - ni))::BIGINT AS best_jac_ppm,
      |        count(*)::BIGINT AS n_candidates
      |      FROM j GROUP BY nid)
      |SELECT nd.doc_id,
      |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
      |       WHEN c.best_jac_ppm >= 300000 THEN 'near_dup'
      |       ELSE 'kept' END AS verdict,
      |  coalesce(c.best_jac_ppm, 0)::BIGINT AS best_jac_ppm,
      |  coalesce(c.n_candidates, 0)::BIGINT AS n_candidates
      |FROM nd LEFT JOIN ex ON nd.doc_id = ex.doc_id
      |LEFT JOIN c ON nd.doc_id = c.nid
      |ORDER BY nd.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).where($"text".isNotNull)
    val newIds = docs.where($"doc_id" % 3 === 0)
    val refIds = docs.where($"doc_id" % 3 =!= 0)
    // exact layer: fixed-width digests only — text never shuffles
    val exact = newIds.select($"doc_id", md5($"text").as("dg"))
      .join(refIds.select(md5($"text").as("dg")).distinct(),
        Seq("dg"), "left_semi")
      .select($"doc_id", lit(true).as("is_exact"))
    // near layer: the production blocker over the UNION corpus (its
    // df cap, bounded postings, and explicit partitioning are the
    // maintained-once machinery), kept only where the pair crosses
    // the new/ref boundary and oriented (new, ref)
    val pairs0 = Dedup.sharedGramPairs(docs, "doc_id", "text",
      n = 5, maxDf = 25)
      .where(($"src" % 3 === 0) =!= ($"dst" % 3 === 0))
      .select(
        when($"src" % 3 === 0, $"src").otherwise($"dst").as("nid"),
        when($"src" % 3 === 0, $"dst").otherwise($"src").as("rid"))
    val gl0 = Tables.spreadScan(docs)
      .select($"doc_id", Dedup.tokenNgrams($"text", 5).as("gs"))
    // candidate-endpoint slice (r21, guide §3.2/§8), taken AFTER the
    // new/ref boundary filter so the endpoint universe is the oriented
    // cross-boundary one: gram arrays are computed and shuffled for
    // candidate endpoints only
    val (pairs, gl) = Dedup.pairEndpointSlice(pairs0, gl0, "doc_id",
      srcCol = "nid", dstCol = "rid")
    val cand = pairs
      .join(gl.select($"doc_id".as("nid"), $"gs".as("ga")), "nid")
      .join(gl.select($"doc_id".as("rid"), $"gs".as("gb")), "rid")
      .select($"nid",
        size($"ga").cast("bigint").as("na"),
        size($"gb").cast("bigint").as("nb"),
        size(array_intersect($"ga", $"gb")).cast("bigint").as("ni"))
      .select($"nid", expr("(1000000L * ni) div (na + nb - ni)").as("jac"))
      .groupBy($"nid")
      .agg(max($"jac").as("best_jac_ppm"),
        count(lit(1)).as("n_candidates"))
    newIds.select($"doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(cand.withColumnRenamed("nid", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id",
        when($"is_exact", "exact_dup")
          .when($"best_jac_ppm" >= 300000L, "near_dup")
          .otherwise("kept").as("verdict"),
        coalesce($"best_jac_ppm", lit(0L)).as("best_jac_ppm"),
        coalesce($"n_candidates", lit(0L)).as("n_candidates"))
      .orderBy($"doc_id")
  }

  /** Per-source duplication census — the source-trust dashboard row:
    * for every source, how many of its documents are byte-duplicates
    * (within the source: `n_docs − n_unique`; in exact ppm) and how
    * many carry content that ALSO appears under another source (the
    * cross-source syndication/scraper signal that drives mixture
    * down-weighting before any dedup even runs). Digests only:
    * md5(text) is computed scan-local, so both aggregates shuffle
    * 16-byte keys, never documents; the per-digest source-spread table
    * is digest-keyed (bounded by corpus cardinality) and joins back to
    * the digest stream on its own key. */
  val dedupRateBySource: CatalogEntry = CatalogEntry(
    "dedup_rate_by_source",
    """WITH g AS (SELECT source, md5(text) AS dg FROM documents
      |           WHERE text IS NOT NULL),
      |d AS (SELECT dg, count(DISTINCT source)::BIGINT AS ns
      |      FROM g GROUP BY dg)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |  count(DISTINCT g.dg)::BIGINT AS n_unique,
      |  (count(*) - count(DISTINCT g.dg))::BIGINT AS n_dup_docs,
      |  ((1000000 * (count(*) - count(DISTINCT g.dg)))
      |   // count(*))::BIGINT AS dup_ppm,
      |  sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_cross_source
      |FROM g JOIN d USING (dg)
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import s.implicits._
    val g = Tables.documents(s, d)
      .where($"text".isNotNull)
      .select($"source", md5($"text").as("dg"))
    val spread = g.groupBy($"dg")
      .agg(count_distinct($"source").as("ns"))
    g.join(spread, "dg")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct($"dg").as("n_unique"),
        sum(when($"ns" >= 2, 1L).otherwise(0L)).as("n_cross_source"))
      .select($"source", $"n_docs", $"n_unique",
        ($"n_docs" - $"n_unique").as("n_dup_docs"),
        expr("(1000000L * (n_docs - n_unique)) div n_docs").as("dup_ppm"),
        $"n_cross_source")
      .orderBy($"source")
  }

  /** CCNet-STYLE PERPLEXITY BUCKETS (Wenzek et al., "CCNet: Extracting
    * high-quality monolingual datasets from web crawl data", LREC'20):
    * per language, split the corpus into head / middle / tail terciles
    * by LM perplexity — the quality stratification that downstream
    * mixture builders sample from (head-heavy for quality, tail kept
    * for diversity). The LM is [[docLmScore]]'s self-trained unigram
    * with the same exactness discipline (nano-quantized log-probs,
    * order-free BIGINT doc sums, `ln` of exact-integer ratios).
    *
    * The tercile cutpoints come from a fixed-width HISTOGRAM (milli-nat
    * bins of avg NLL), not a corpus-wide sort — CCNet's own approach,
    * and the only shape that survives 100 TB: the histogram is
    * (langs × ~few-thousand bins) small, its per-lang cumulative
    * window is metadata-scale, and the cutpoints broadcast back so
    * bucket assignment is scan-local. A per-lang `ntile` over raw
    * docs would sort each language's entire corpus on one task chain.
    * Cutpoint rule is integral (3·cum ≥ k·n on BIGINT counts), so
    * bucket membership is bit-stable across engines. */
  val qualityPplBuckets: CatalogEntry = CatalogEntry(
    "quality_ppl_buckets",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |vocab AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
      |tot AS (SELECT sum(n)::BIGINT AS t FROM vocab),
      |lp AS (SELECT token,
      |         round(ln(n::DOUBLE / t::DOUBLE) * 1e9, 0)::BIGINT AS lp_q
      |       FROM vocab, tot),
      |scored AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |    round(-(sum(lp_q)::DOUBLE / 1e9) / count(*), 6) AS avg_nll
      |  FROM (SELECT tok.doc_id, lp.lp_q FROM tok JOIN lp USING (token))
      |  GROUP BY doc_id),
      |binned AS (
      |  SELECT s.doc_id, d.lang, s.n_tokens,
      |    round(s.avg_nll * 1e3, 0)::BIGINT AS nll_u
      |  FROM scored s JOIN documents d USING (doc_id)),
      |hist AS (SELECT lang, nll_u, count(*)::BIGINT AS c
      |         FROM binned GROUP BY lang, nll_u),
      |cum AS (
      |  SELECT lang, nll_u, c,
      |    sum(c) OVER (PARTITION BY lang ORDER BY nll_u
      |                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cc,
      |    sum(c) OVER (PARTITION BY lang)::BIGINT AS nl
      |  FROM hist),
      |cuts AS (
      |  SELECT lang,
      |    min(CASE WHEN cc * 3 >= nl THEN nll_u END)::BIGINT AS cut1,
      |    min(CASE WHEN cc * 3 >= 2 * nl THEN nll_u END)::BIGINT AS cut2
      |  FROM cum GROUP BY lang),
      |bucketed AS (
      |  SELECT b.lang,
      |    CASE WHEN b.nll_u <= c.cut1 THEN 'head'
      |         WHEN b.nll_u <= c.cut2 THEN 'middle'
      |         ELSE 'tail' END AS bucket,
      |    b.n_tokens, b.nll_u
      |  FROM binned b JOIN cuts c USING (lang))
      |SELECT lang, bucket, count(*)::BIGINT AS n_docs,
      |  sum(n_tokens)::BIGINT AS total_tokens,
      |  min(nll_u)::BIGINT AS min_nll_u, max(nll_u)::BIGINT AS max_nll_u
      |FROM bucketed GROUP BY lang, bucket
      |ORDER BY lang, bucket""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tok = docs
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("token"))
    val vocab = tok.groupBy($"token").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum($"n").as("t"))
    val lp = vocab.crossJoin(broadcast(total))
      .select($"token",
        round(log($"n".cast("double") / $"t".cast("double")) * lit(1e9), 0)
          .cast("long").as("lp_q"))
    val avgNll =
      round(-(sum($"lp_q").cast("double") / lit(1e9)) / count(lit(1)), 6)
    val scored = tok.join(lp, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), avgNll.as("avg_nll"))
    val binned = scored
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"doc_id", $"lang", $"n_tokens",
        round($"avg_nll" * lit(1e3), 0).cast("long").as("nll_u"))
    val hist = binned.groupBy($"lang", $"nll_u").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy($"lang").orderBy($"nll_u")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"lang")
    val cuts = hist
      .withColumn("cc", sum($"c").over(wCum))
      .withColumn("nl", sum($"c").over(wAll))
      .groupBy($"lang")
      .agg(min(when($"cc" * 3 >= $"nl", $"nll_u")).as("cut1"),
        min(when($"cc" * 3 >= $"nl" * 2, $"nll_u")).as("cut2"))
    binned.join(broadcast(cuts), Seq("lang"))
      .select($"lang",
        when($"nll_u" <= $"cut1", "head")
          .when($"nll_u" <= $"cut2", "middle")
          .otherwise("tail").as("bucket"),
        $"n_tokens", $"nll_u")
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"),
        min($"nll_u").as("min_nll_u"), max($"nll_u").as("max_nll_u"))
      .orderBy($"lang", $"bucket")
  }

  /** ZIPF-LAW FIT over the token frequency census — the corpus-health
    * diagnostic (a natural-language corpus fits slope ≈ −1 in
    * log-rank/log-frequency space; boilerplate flattens the head,
    * template spam fattens specific ranks). Fit is ordinary least
    * squares over the TOP-1000 tokens only — the standard truncation,
    * and the scale decision: the top-k census is `TakeOrdered` (never
    * a global sort), the 1000-row ranking window and the regression
    * run on a driver-negligible table while the corpus-sized work is
    * exactly one vocab census exchange.
    *
    * Cross-engine exactness: x = round(ln(rank)·1e9), y =
    * round(ln(count)·1e9) are BIGINTs (`ln` of exact integers);
    * Σx, Σy, Σxy, Σx² accumulate in DECIMAL(38,0)/HUGEINT (Σxy tops
    * 10²³ — int64 dies); slope and intercept are INTEGER divisions of
    * exact moments arranged positive-over-positive (slope negated
    * into the numerator) so `div`/`//` truncation semantics agree —
    * zero float arithmetic touches the output. */
  val corpusZipfFit: CatalogEntry = CatalogEntry(
    "corpus_zipf_fit",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |vocab AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
      |top AS (SELECT token, n FROM vocab ORDER BY n DESC, token LIMIT 1000),
      |ranked AS (
      |  SELECT n, row_number() OVER (ORDER BY n DESC, token)::BIGINT AS rk
      |  FROM top),
      |pts AS (
      |  SELECT round(ln(rk::DOUBLE) * 1e9, 0)::BIGINT AS x,
      |         round(ln(n::DOUBLE) * 1e9, 0)::BIGINT AS y
      |  FROM ranked),
      |s AS (SELECT count(*)::HUGEINT AS m, sum(x)::HUGEINT AS sx,
      |             sum(y)::HUGEINT AS sy,
      |             sum(x::HUGEINT * y)::HUGEINT AS sxy,
      |             sum(x::HUGEINT * x)::HUGEINT AS sxx FROM pts)
      |SELECT m::BIGINT AS n_tokens_fit,
      |  (-((1000000::HUGEINT * (sx * sy - m * sxy))
      |     // (m * sxx - sx * sx)))::BIGINT AS slope_ppm,
      |  (((sy * sxx - sx * sxy) // (m * sxx - sx * sx)) // 1000)::BIGINT
      |    AS intercept_micro
      |FROM s""".stripMargin) { (s, d) =>
    import s.implicits._
    val tok = Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select(explode(TextOps.tokens($"text")).as("token"))
    val top = tok.groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token").limit(1000)
    val ranked = top.withColumn("rk",
      row_number().over(Window.orderBy($"n".desc, $"token")).cast("long"))
    val pts = ranked.select(
      round(log($"rk".cast("double")) * lit(1e9), 0).cast("long").as("x"),
      round(log($"n".cast("double")) * lit(1e9), 0).cast("long").as("y"))
    pts.agg(
      count(lit(1)).cast("decimal(38,0)").as("m"),
      sum($"x".cast("decimal(38,0)")).as("sx"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"x".cast("decimal(19,0)") * $"y".cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("sxy"),
      sum(($"x".cast("decimal(19,0)") * $"x".cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("sxx"))
      .select(
        $"m".cast("long").as("n_tokens_fit"),
        (-expr("(cast(1000000 as decimal(38,0)) * (sx * sy - m * sxy))" +
          " div (m * sxx - sx * sx)")).cast("long").as("slope_ppm"),
        expr("((sy * sxx - sx * sxy) div (m * sxx - sx * sx)) div 1000")
          .cast("long").as("intercept_micro"))
  }

  /** HEAPS'-LAW FIT — the companion corpus-health diagnostic to
    * [[corpusZipfFit]]: vocabulary growth V(N) ≈ k·N^β as the corpus
    * is consumed in doc-id order (natural text: β ≈ 0.5-0.8; a
    * template-stamped corpus saturates early and β collapses — the
    * "new data stopped adding new content" alarm for crawl curation).
    * Measured over the word 3-GRAM vocabulary (the unigram vocab of
    * any bounded-topic corpus saturates in pages, proving nothing).
    *
    * The growth curve costs ONE corpus pass: V(N) = |{grams with
    * min(doc_id) < N}|, so the gram census with its min-first-doc IS
    * the curve — no per-prefix rescan (the naive formulation scans
    * the corpus once per checkpoint). Checkpoints are the 8 octile
    * prefixes N_k = n·k div 8 (data-derived, integer-exact); the
    * conditional census is the vocab table against 8 broadcast rows;
    * the OLS fit reuses the [[corpusZipfFit]] integer-moment
    * discipline (DECIMAL(38,0)/HUGEINT moments, positive integer
    * divisions — zero float in the output). */
  val corpusHeapsFit: CatalogEntry = CatalogEntry(
    "corpus_heaps_fit",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id,
      |        unnest([array_to_string(toks[i:i+2], ' ')
      |                for i in range(1, len(toks) - 1)]) AS gram
      |      FROM t WHERE len(toks) >= 3),
      |fs AS (SELECT gram, min(doc_id)::BIGINT AS fd FROM g GROUP BY gram),
      |nd AS (SELECT (max(doc_id) + 1)::BIGINT AS n FROM documents),
      |cps AS (SELECT ((n * k.gs) // 8)::BIGINT AS cp
      |        FROM nd, unnest(generate_series(1, 8)) AS k(gs)),
      |growth AS (
      |  SELECT cp, count(*) FILTER (WHERE fd < cp)::BIGINT AS v
      |  FROM fs, cps GROUP BY cp),
      |pts AS (SELECT round(ln(cp::DOUBLE) * 1e9, 0)::BIGINT AS x,
      |               round(ln(v::DOUBLE) * 1e9, 0)::BIGINT AS y
      |        FROM growth WHERE v > 0),
      |s AS (SELECT count(*)::HUGEINT AS m, sum(x)::HUGEINT AS sx,
      |             sum(y)::HUGEINT AS sy,
      |             sum(x::HUGEINT * y)::HUGEINT AS sxy,
      |             sum(x::HUGEINT * x)::HUGEINT AS sxx FROM pts)
      |SELECT m::BIGINT AS n_points,
      |  ((1000000::HUGEINT * (m * sxy - sx * sy))
      |   // (m * sxx - sx * sx))::BIGINT AS beta_ppm,
      |  (((sy * sxx - sx * sxy) // (m * sxx - sx * sx)) // 1000)::BIGINT
      |    AS lnk_micro
      |FROM s""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val fs = docs.where($"text".isNotNull)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", explode(when(size($"toks") >= 3,
        transform(sequence(lit(1), size($"toks") - 2),
          i => array_join(slice($"toks", i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .groupBy($"gram").agg(min($"doc_id").as("fd"))
    val cps = docs.agg((max($"doc_id") + 1).as("n"))
      .select(explode(sequence(lit(1), lit(8))).as("k"), $"n")
      .select(expr("(n * k) div 8").cast("long").as("cp"))
    val pts = fs.crossJoin(broadcast(cps))
      .groupBy($"cp")
      .agg(sum(when($"fd" < $"cp", 1L).otherwise(0L)).as("v"))
      .where($"v" > 0)
      .select(
        round(log($"cp".cast("double")) * lit(1e9), 0).cast("long").as("x"),
        round(log($"v".cast("double")) * lit(1e9), 0).cast("long").as("y"))
    pts.agg(
      count(lit(1)).cast("decimal(38,0)").as("m"),
      sum($"x".cast("decimal(38,0)")).as("sx"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"x".cast("decimal(19,0)") * $"y".cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("sxy"),
      sum(($"x".cast("decimal(19,0)") * $"x".cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("sxx"))
      .select(
        $"m".cast("long").as("n_points"),
        expr("(cast(1000000 as decimal(38,0)) * (m * sxy - sx * sy))" +
          " div (m * sxx - sx * sx)").cast("long").as("beta_ppm"),
        expr("((sy * sxx - sx * sxy) div (m * sxx - sx * sx)) div 1000")
          .cast("long").as("lnk_micro"))
  }

  /** LANGUAGE-ID CONFUSION MATRIX — the classifier-quality census over
    * [[langIdHeuristic]]'s per-doc predictions (same plan, same oracle
    * nested verbatim, so the measurement can never drift from the
    * classifier it measures): per (true lang, predicted lang) cell
    * count plus the row share in exact ppm — the per-language recall
    * diagonal and, off it, WHICH languages leak into which (the es/fr
    * stopword collisions a scalar accuracy hides). The number that
    * decides whether the cheap heuristic suffices per language or a
    * real model is needed before mixture weighting trusts `lang`.
    *
    * Scale shape: prediction is scan-local ([[langIdHeuristic]]); the
    * confusion census is one (lang, predicted) partial agg — ≤|langs|²
    * cells; the row-share window runs on those cells. */
  val langConfusionMatrix: CatalogEntry = CatalogEntry(
    "lang_confusion_matrix",
    s"""WITH pred AS (${langIdHeuristic.oracle.get.replace("\n", "\n      ")}),
      |cm AS (SELECT lang, predicted_lang, count(*)::BIGINT AS n
      |       FROM pred GROUP BY lang, predicted_lang),
      |tot AS (SELECT lang, sum(n)::BIGINT AS nl FROM cm GROUP BY lang)
      |SELECT cm.lang, cm.predicted_lang, cm.n,
      |  ((1000000 * cm.n) // t.nl)::BIGINT AS row_share_ppm
      |FROM cm JOIN tot t ON cm.lang = t.lang
      |ORDER BY cm.lang, predicted_lang""".stripMargin) { (s, d) =>
    import s.implicits._
    val cm = langIdHeuristic.query(s, d)
      .groupBy($"lang", $"predicted_lang")
      .agg(count(lit(1)).as("n"))
    cm.withColumn("nl", sum($"n").over(Window.partitionBy($"lang")))
      .select($"lang", $"predicted_lang", $"n",
        expr("(1000000L * n) div nl").as("row_share_ppm"))
      .orderBy($"lang", $"predicted_lang")
  }

  /** COHEN'S KAPPA of the language-ID heuristic against the reference
    * `lang` labels — the chance-corrected scalar the confusion matrix
    * ([[langConfusionMatrix]]) rolls up to: κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement and p_e the marginal-product
    * chance agreement. Raw accuracy flatters a classifier that just
    * echoes the majority class; κ ≈ 0 says "no better than guessing
    * from the marginals" — on this corpus the heuristic's 40% accuracy
    * is EXACTLY its chance rate (κ slightly negative), the number that
    * stops a mixture-weighting pipeline from trusting `predicted_lang`
    * where the confusion matrix's off-diagonal mass already hinted.
    *
    * All exact integers: p_o, p_e and κ as one truncating division
    * each, the marginal products summed in DECIMAL(38,0)/HUGEINT so
    * N² terms can't overflow at warehouse row counts. The prediction
    * CTE is [[langIdHeuristic]]'s oracle nested verbatim — the
    * measured classifier IS the shipped one. Scale shape: prediction
    * scan-local; everything after lives on the ≤|langs|² cell table;
    * the two 1-row aggregates meet by broadcast cross join, never a
    * collect. */
  val statsCohenKappa: CatalogEntry = CatalogEntry(
    "stats_cohen_kappa",
    s"""WITH pred AS (${langIdHeuristic.oracle.get.replace("\n", "\n      ")}),
      |cm AS (SELECT lang, predicted_lang, count(*)::BIGINT AS n
      |       FROM pred GROUP BY 1, 2),
      |tot AS (SELECT sum(n)::BIGINT AS nn,
      |          coalesce(sum(CASE WHEN lang = predicted_lang THEN n END),
      |                   0)::BIGINT AS diag
      |        FROM cm),
      |rc AS (SELECT coalesce(sum(r.rn::HUGEINT * c.cn::HUGEINT),
      |                       0)::HUGEINT AS src
      |       FROM (SELECT lang, sum(n)::BIGINT AS rn FROM cm
      |             GROUP BY lang) r
      |       JOIN (SELECT predicted_lang, sum(n)::BIGINT AS cn
      |             FROM cm GROUP BY predicted_lang) c
      |         ON r.lang = c.predicted_lang)
      |SELECT t.nn AS n_docs, t.diag AS n_agree,
      |  ((1000000 * t.diag) // t.nn)::BIGINT AS po_ppm,
      |  ((1000000::HUGEINT * r.src) // (t.nn::HUGEINT * t.nn))::BIGINT
      |    AS pe_ppm,
      |  CASE WHEN t.nn::HUGEINT * t.nn - r.src <> 0 THEN
      |    ((1000000::HUGEINT * (t.nn::HUGEINT * t.diag - r.src))
      |     // (t.nn::HUGEINT * t.nn - r.src))::BIGINT END AS kappa_ppm
      |FROM tot t, rc r""".stripMargin) { (s, d) =>
    import s.implicits._
    val cm = langIdHeuristic.query(s, d)
      .groupBy($"lang", $"predicted_lang")
      .agg(count(lit(1)).as("n"))
    val tot = cm.agg(sum($"n").as("nn"),
      coalesce(sum(when($"lang" === $"predicted_lang", $"n")), lit(0L))
        .as("diag"))
    val rows = cm.groupBy($"lang").agg(sum($"n").as("rn"))
    val cols = cm.groupBy($"predicted_lang").agg(sum($"n").as("cn"))
    val rc = rows.join(cols, $"lang" === $"predicted_lang")
      .agg(coalesce(sum($"rn".cast("decimal(38,0)") * $"cn"), lit(0L)
        .cast("decimal(38,0)")).as("src"))
    tot.crossJoin(broadcast(rc))
      .select($"nn".as("n_docs"), $"diag".as("n_agree"),
        expr("(1000000L * diag) div nn").as("po_ppm"),
        expr("""(cast(1000000 as decimal(38,0)) * src)
          | div (cast(nn as decimal(38,0)) * nn)""".stripMargin)
          .cast("long").as("pe_ppm"),
        when(expr("cast(nn as decimal(38,0)) * nn - src") =!= lit(0),
          expr("""(cast(1000000 as decimal(38,0))
            | * (cast(nn as decimal(38,0)) * diag - src))
            | div (cast(nn as decimal(38,0)) * nn - src)""".stripMargin))
          .cast("long").as("kappa_ppm"))
  }

  /** PACKING-EFFICIENCY CENSUS comparing BOTH packers' bin assignments
    * ([[packSequencesGreedy]] doc-order next-fit vs
    * [[packSequencesFfd]] first-fit-decreasing; the oracle nests both
    * packing chains verbatim — measurement and operators cannot
    * drift): per source, each packer's bins used and fill fraction in
    * exact ppm against the shared ceil(Σtokens/budget) lower bound —
    * the side-by-side waste number that decides whether the
    * length-sort is worth its cost before committing context-window
    * budget at scale (here: FFD saves bins on every source —
    * `ffd_extra_bins` ≤ `greedy_extra_bins` row by row). Sources
    * whose docs overflow the 60-token budget can exceed 10⁶ fill by
    * owning overflowed bins — visible, not hidden. */
  val packEfficiencyCensus: CatalogEntry = CatalogEntry(
    "pack_efficiency_census",
    s"""WITH g AS (
      |  SELECT source, count(*)::BIGINT AS n_docs,
      |    (max(bin) + 1)::BIGINT AS n_bins, sum(n_tokens)::BIGINT AS tot
      |  FROM (${packSequencesGreedy.oracle.get.replace("\n", "\n      ")})
      |  GROUP BY source),
      |f AS (
      |  SELECT source, (max(bin) + 1)::BIGINT AS n_bins
      |  FROM (${packSequencesFfd.oracle.get.replace("\n", "\n      ")})
      |  GROUP BY source)
      |SELECT g.source, g.n_docs, g.tot AS total_tokens,
      |  ((g.tot + 59) // 60)::BIGINT AS lb_bins,
      |  g.n_bins AS greedy_bins,
      |  (g.n_bins - (g.tot + 59) // 60)::BIGINT AS greedy_extra_bins,
      |  ((1000000 * g.tot) // (g.n_bins * 60))::BIGINT AS greedy_fill_ppm,
      |  f.n_bins AS ffd_bins,
      |  (f.n_bins - (g.tot + 59) // 60)::BIGINT AS ffd_extra_bins,
      |  ((1000000 * g.tot) // (f.n_bins * 60))::BIGINT AS ffd_fill_ppm
      |FROM g JOIN f USING (source) ORDER BY source""".stripMargin) { (s, d) =>
    import s.implicits._
    val g = packSequencesGreedy.query(s, d)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        (max($"bin") + 1).as("greedy_bins"),
        sum($"n_tokens").as("total_tokens"))
    val f = packSequencesFfd.query(s, d)
      .groupBy($"source")
      .agg((max($"bin") + 1).as("ffd_bins"))
    g.join(f, Seq("source"))
      .select($"source", $"n_docs", $"total_tokens",
        expr("(total_tokens + 59) div 60").as("lb_bins"),
        $"greedy_bins",
        expr("greedy_bins - (total_tokens + 59) div 60")
          .as("greedy_extra_bins"),
        expr("(1000000L * total_tokens) div (greedy_bins * 60)")
          .as("greedy_fill_ppm"),
        $"ffd_bins",
        expr("ffd_bins - (total_tokens + 59) div 60").as("ffd_extra_bins"),
        expr("(1000000L * total_tokens) div (ffd_bins * 60)")
          .as("ffd_fill_ppm"))
      .orderBy($"source")
  }

  /** MARGINAL-NOVELTY CURVE — per corpus octile (doc-id order), the
    * fraction of 3-gram OCCURRENCES that are first-ever-seen: the
    * diminishing-returns measurement behind every "is more of this
    * source still worth ingesting" call, and the occurrence-level
    * derivative of [[corpusHeapsFit]]'s fitted exponent (the fit says
    * HOW growth scales; this says what each marginal slice actually
    * delivered — on this corpus novelty decays ~91% → ~37% across
    * octiles). Baevski-free, purely counting: novelty and cumulative
    * distinct are exact integer ratios.
    *
    * Scale shape: ONE gram-census pass (gram, min-first-doc + octile
    * occurrence counts reduce from the same exploded stream — two
    * partial-agg exchanges over it, never a rescan per checkpoint);
    * the curve itself is an 8-row window. */
  val corpusNoveltyCurve: CatalogEntry = CatalogEntry(
    "corpus_novelty_curve",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id,
      |        unnest([array_to_string(toks[i:i+2], ' ')
      |                for i in range(1, len(toks) - 1)]) AS gram
      |      FROM t WHERE len(toks) >= 3),
      |nd AS (SELECT (max(doc_id) + 1)::BIGINT AS n FROM documents),
      |f AS (SELECT gram, min(doc_id)::BIGINT AS fd FROM g GROUP BY gram),
      |occ AS (
      |  SELECT ((doc_id * 8) // (SELECT n FROM nd))::BIGINT AS octile,
      |    count(*)::BIGINT AS n_occurrences
      |  FROM g GROUP BY octile),
      |new_g AS (
      |  SELECT ((fd * 8) // (SELECT n FROM nd))::BIGINT AS octile,
      |    count(*)::BIGINT AS n_new_grams
      |  FROM f GROUP BY octile)
      |SELECT o.octile, o.n_occurrences,
      |  coalesce(ng.n_new_grams, 0)::BIGINT AS n_new_grams,
      |  ((1000000 * coalesce(ng.n_new_grams, 0)) // o.n_occurrences)
      |    ::BIGINT AS novelty_ppm,
      |  sum(coalesce(ng.n_new_grams, 0))
      |    OVER (ORDER BY o.octile ROWS UNBOUNDED PRECEDING)::BIGINT
      |    AS cum_distinct
      |FROM occ o LEFT JOIN new_g ng ON o.octile = ng.octile
      |ORDER BY o.octile""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val g = docs.where($"text".isNotNull)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", explode(when(size($"toks") >= 3,
        transform(sequence(lit(1), size($"toks") - 2),
          i => array_join(slice($"toks", i, lit(3)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val nd = docs.agg((max($"doc_id") + 1).as("n"))
    val occ = g.crossJoin(broadcast(nd))
      .groupBy(expr("(doc_id * 8) div n").as("octile"))
      .agg(count(lit(1)).as("n_occurrences"))
    val newG = g.groupBy($"gram").agg(min($"doc_id").as("fd"))
      .crossJoin(broadcast(nd))
      .groupBy(expr("(fd * 8) div n").as("octile"))
      .agg(count(lit(1)).as("n_new_grams"))
    occ.join(newG.withColumnRenamed("octile", "noct"),
        $"octile" === $"noct", "left")
      .select($"octile", $"n_occurrences",
        coalesce($"n_new_grams", lit(0L)).as("n_new_grams"))
      .withColumn("novelty_ppm",
        expr("(1000000L * n_new_grams) div n_occurrences"))
      .withColumn("cum_distinct", sum($"n_new_grams").over(
        Window.orderBy($"octile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy($"octile")
  }

  /** Intra-document repeated-span removal (k = 3 token spans) — the
    * curation transform the inter-document dedup family cannot do:
    * `doc_repetition_stats` MEASURES self-repetition (Rae et al. 2021
    * §A1.1); this REMOVES it. Exact, deterministic semantics: a
    * 3-gram occurrence is a duplicate iff the same 3-token gram starts
    * earlier in the same document; every token covered by a duplicate
    * occurrence's window is dropped (first occurrence kept whole,
    * later occurrences removed whole; overlapping windows merge, so a
    * page repeated n times keeps exactly one copy). Output per doc:
    * token count, removed count, and the cleaned text itself.
    *
    * Scale shape: ONE row-local kernel call per document
    * ([[graft.functions.StripSpansAlgo]] — sorted-gram-run duplicate
    * detection over byte slices, O(m log m), no gram strings
    * materialized), zero shuffles beyond the determinism sort. The
    * oracle replays the semantics as the naive explode + two-window
    * formulation (first-position window over (doc_id, gram), rolling
    * coverage window over positions) — which at 100 TB would shuffle
    * the tokenized corpus twice; the kernel shuffles nothing. */
  val docStripRepeatedSpans: CatalogEntry = CatalogEntry(
    "doc_strip_repeated_spans",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS s
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |p AS (
      |  SELECT doc_id, u.pos AS pos, u.tok AS tok, u.gram AS gram FROM (
      |    SELECT doc_id,
      |      unnest([{'pos': i - 1, 'tok': s[i],
      |               'gram': CASE WHEN i + 2 <= len(s)
      |                       THEN array_to_string(s[i:i+2], ' ') END}
      |              for i in range(1, len(s) + 1)]) AS u
      |    FROM t)),
      |d AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN gram IS NOT NULL AND
      |      min(pos) OVER (PARTITION BY doc_id, gram) < pos
      |    THEN 1 ELSE 0 END AS dup
      |  FROM p),
      |c AS (
      |  SELECT doc_id, pos, tok,
      |    max(dup) OVER (PARTITION BY doc_id ORDER BY pos
      |                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cov
      |  FROM d)
      |SELECT doc_id,
      |  count(*)::BIGINT AS n_tokens,
      |  sum(cov)::BIGINT AS n_removed,
      |  coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (cov = 0), '')
      |    AS clean_text
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .where($"text".isNotNull && length($"text") > 0)
      .select($"doc_id",
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"),
        call_function("strip_repeated_spans", $"text", lit(3)).as("kept"))
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - size($"kept")).cast("long").as("n_removed"),
        array_join($"kept", " ").as("clean_text"))
      .orderBy($"doc_id")
  }

  /** Pairwise AGREEMENT census over the four near-dup layers
    * (MinHash-LSH, SimHash, containment, semantic) — the measurement
    * that says whether the layers are redundant or complementary: for
    * every layer pair, how many documents both drop, each drops alone,
    * and neither drops, plus the exact-integer Jaccard of the two
    * dropped sets (the `lang_confusion_matrix` shape, 10 rows for 4
    * layers incl. diagonal). Layer definitions are the deployed ones:
    * MinHash = word-3-gram shingles → k=8 portable md5 minhashes → 4
    * band × 2 row collisions (word grams, not char shingles — this
    * corpus' ~31-word vocabulary saturates the char-3 shingle space
    * and every doc pair collides); SimHash = `simhash63_md5` → 4
    * 16-bit bands → Hamming ≤ 3 (the `dedup_simhash_portable` pair
    * machinery, un-augmented); containment = rare-5-gram blocked
    * pairs at cont ≥ 0.5 (`dedup_containment`); semantic =
    * within-cluster cos > 0.4 SemDeDup prune (`dedup_semantic_embed`;
    * vec_id ≡ doc_id in the fixture corpus). A pair (a, b), a < b,
    * drops doc b — the keep-lowest-id rule every layer shares.
    *
    * Scale shape: each layer is its own already-scale-safe banded /
    * blocked / clustered plan (never all-pairs); the census adds four
    * small drop-set LEFT JOINs onto the id universe (drop sets are
    * duplicate-sized, broadcastable), a row-local explode of the 10
    * layer-pair structs, and ONE partial-agg exchange over 10 keys.
    *
    * Where the time goes (r17 warmed full run): 2.09 s vs 2.41 s for
    * the r15 explode+8-min-agg MinHash formulation — the r16 kernel
    * rewiring bought ~13%; the MinHash layer was never the hotspot,
    * the other three layers (SimHash banding, rare-gram containment
    * blocks, semantic cluster pairs) plus the determinism sorts
    * dominate. */
  val dedupLayerAgreement: CatalogEntry = {
    val k = 8
    val mins = (0 until k).map(i =>
      s"""    min(('0x' || substring(md5(sh || '#$i'), 1, 15))::BIGINT) AS mh$i""")
      .mkString(",\n")
    val mbands = (0 until k / 2).map(j =>
      s"""  SELECT doc_id, $j AS band,
         |    mh${2 * j}::VARCHAR || '_' || mh${2 * j + 1}::VARCHAR AS sig
         |  FROM mh""".stripMargin).mkString("\n  UNION ALL\n")
    val bits = TextOps.SimhashBits
    val sums = (0 until bits).map(i =>
      s"""    sum(CASE WHEN (h & (1::BIGINT << $i)) != 0
         |        THEN 1 ELSE -1 END) AS s$i""".stripMargin).mkString(",\n")
    val assemble = (0 until bits).map(i =>
      s"(CASE WHEN s$i >= 0 THEN (1::BIGINT << $i) ELSE 0 END)")
      .mkString(" +\n  ")
    CatalogEntry(
      "dedup_layer_agreement",
      s"""WITH dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
         |msh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in range(1, len(toks) - 1)])) AS sh
         |  FROM tt WHERE len(toks) >= 3),
         |mh AS (
         |  SELECT doc_id,
         |$mins
         |  FROM msh GROUP BY doc_id),
         |mb AS (
         |$mbands),
         |dmh AS (
         |  SELECT DISTINCT b2.doc_id AS did
         |  FROM mb a JOIN mb b2 ON a.band = b2.band AND a.sig = b2.sig
         |    AND a.doc_id < b2.doc_id),
         |stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM dd),
         |sh2 AS (SELECT doc_id,
         |          ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
         |        FROM stok),
         |sv AS (
         |  SELECT doc_id,
         |$sums
         |  FROM sh2 GROUP BY doc_id),
         |sfp AS (SELECT doc_id,
         |  $assemble AS fp
         |  FROM sv),
         |sb AS (
         |  SELECT doc_id, fp, band, ((fp >> (16 * band)) & 65535) AS bval
         |  FROM sfp, (SELECT unnest([0, 1, 2, 3]) AS band)),
         |dsh AS (
         |  SELECT DISTINCT c.doc_id AS did
         |  FROM sb a JOIN sb c ON a.band = c.band AND a.bval = c.bval
         |    AND a.doc_id < c.doc_id
         |  WHERE bit_count(xor(a.fp, c.fp)) <= 3),
         |cgl AS (
         |  SELECT doc_id,
         |    list_distinct([array_to_string(list_slice(toks, i, i + 4), ' ')
         |                   for i in range(1, greatest(len(toks) - 3, 1))])
         |      AS gs
         |  FROM tt),
         |cg AS (SELECT doc_id, unnest(gs) AS gram FROM cgl),
         |crare AS (SELECT gram FROM cg GROUP BY gram
         |          HAVING count(*) BETWEEN 2 AND 25),
         |ce AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         |       FROM cg a JOIN cg b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |       WHERE a.gram IN (SELECT gram FROM crare)),
         |cj AS (
         |  SELECT src, dst, len(x.gs)::BIGINT AS na, len(y.gs)::BIGINT AS nb,
         |    len(list_intersect(x.gs, y.gs))::BIGINT AS ni
         |  FROM ce JOIN cgl x ON x.doc_id = src JOIN cgl y ON y.doc_id = dst),
         |dct AS (
         |  SELECT DISTINCT dst AS did FROM cj
         |  WHERE (1000000 * ni) // least(na, nb) >= 500000),
         |cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |         WHERE vec_id < 8),
         |d2 AS (
         |  SELECT e.vec_id, c.cid, e.embedding AS v,
         |    list_sum([round(((e.embedding[i]::DOUBLE) - (c.cvec[i]::DOUBLE))
         |                    * ((e.embedding[i]::DOUBLE) - (c.cvec[i]::DOUBLE))
         |                    * 1e9, 0)::BIGINT
         |              for i in range(1, len(e.embedding) + 1)])::BIGINT AS d2q
         |  FROM embeddings e, cent c),
         |asg AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT vec_id, v, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) AS rn
         |    FROM d2) WHERE rn = 1),
         |nn AS (
         |  SELECT vec_id, cid, v,
         |    list_sum([roundbankers((v[i]::DOUBLE) * (v[i]::DOUBLE) * 1e9,
         |                           0)::BIGINT
         |              for i in range(1, len(v) + 1)])::BIGINT AS nq
         |  FROM asg),
         |sp AS (
         |  SELECT y.vec_id AS did,
         |    list_sum([roundbankers((x.v[i]::DOUBLE) * (y.v[i]::DOUBLE) * 1e9,
         |                           0)::BIGINT
         |              for i in range(1, len(x.v) + 1)])::BIGINT AS dotq,
         |    x.nq AS naq, y.nq AS nbq
         |  FROM nn x JOIN nn y ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |dse AS (
         |  SELECT DISTINCT did FROM sp
         |  WHERE dotq > 0 AND
         |    100::HUGEINT * dotq::HUGEINT * dotq::HUGEINT >
         |    16::HUGEINT * naq::HUGEINT * nbq::HUGEINT),
         |fl AS (
         |  SELECT d.doc_id,
         |    CASE WHEN m.did IS NOT NULL THEN 1 ELSE 0 END AS f_minhash,
         |    CASE WHEN s.did IS NOT NULL THEN 1 ELSE 0 END AS f_simhash,
         |    CASE WHEN c.did IS NOT NULL THEN 1 ELSE 0 END AS f_containment,
         |    CASE WHEN e.did IS NOT NULL THEN 1 ELSE 0 END AS f_semantic
         |  FROM documents d
         |  LEFT JOIN dmh m ON d.doc_id = m.did
         |  LEFT JOIN dsh s ON d.doc_id = s.did
         |  LEFT JOIN dct c ON d.doc_id = c.did
         |  LEFT JOIN dse e ON d.doc_id = e.did),
         |lv AS (
         |  SELECT doc_id, l.layer,
         |    CASE l.layer WHEN 'minhash' THEN f_minhash
         |      WHEN 'simhash' THEN f_simhash
         |      WHEN 'containment' THEN f_containment
         |      ELSE f_semantic END AS f
         |  FROM fl, (SELECT unnest(
         |    ['containment','minhash','semantic','simhash']) AS layer) l)
         |SELECT a.layer AS layer_a, b.layer AS layer_b,
         |  sum(a.f * b.f)::BIGINT AS n_both,
         |  sum(a.f * (1 - b.f))::BIGINT AS n_only_a,
         |  sum((1 - a.f) * b.f)::BIGINT AS n_only_b,
         |  sum((1 - a.f) * (1 - b.f))::BIGINT AS n_neither,
         |  CASE WHEN sum(greatest(a.f, b.f)) > 0
         |    THEN ((1000000 * sum(a.f * b.f)) //
         |          sum(greatest(a.f, b.f)))::BIGINT
         |  END AS jaccard_ppm
         |FROM lv a JOIN lv b ON a.doc_id = b.doc_id AND a.layer <= b.layer
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val dd = docs.where($"text".isNotNull)

      // MinHash layer: word-3-gram shingles -> 8 portable md5
      // minhashes via the single-pass `minhash_words_md5` kernel (one
      // row-local call per doc — no gram explode, no 8-min-agg
      // exchange; bit-exactness with the explode+md5 column
      // formulation is pinned by SketchExprSpec) -> 4 bands x 2 rows,
      // band equi-join (never all-pairs). Kernel returns the EMPTY
      // array for docs with < 3 tokens — the same docs the SQL
      // replay's `len(toks) >= 3` guard drops. r22: the guard is the
      // TOKEN COUNT (size(split) = 1 + spaces = exactly the kernel's
      // nTok, so the row set is identical), not size(mhs) — a filter
      // on the kernel's own output pushes to the scan WITH THE KERNEL
      // INLINED, so every doc paid the k=8 salted-md5 pass twice
      // (pushed filter + projection; the before-plan's scan Condition
      // shows `size(minhash_words_md5(..)) > 0`).
      val mh = dd.where(size(split($"text", " ")) >= 3)
        .select($"doc_id",
          call_function("minhash_words_md5", $"text", lit(k), lit(3))
            .as("mhs"))
      val bands = mh.select($"doc_id", posexplode(array(
        (0 until k / 2).map(j => concat_ws("_",
          element_at($"mhs", 2 * j + 1).cast("string"),
          element_at($"mhs", 2 * j + 2).cast("string"))): _*))
        .as(Seq("band", "sig")))
      val dropMinhash = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("did")).distinct()

      // SimHash layer: the dedup_simhash_portable pair machinery on
      // the un-augmented corpus
      val dropSimhash = graft.ext.Dedup.simhashNearDupPairs(
          dd.select($"doc_id", $"text"), "doc_id", "text",
          maxHamming = 3, kernel = "simhash63_md5")
        .select($"id_b".as("did")).distinct()

      // Containment layer: the dedup_containment pipeline, drop = dst
      // (candidate-endpoint slice r21, guide §3.2/§8: gram arrays
      // computed/shuffled for candidate endpoints only)
      val ctCand0 = graft.ext.Dedup.sharedGramPairs(
        docs, "doc_id", "text", n = 5, maxDf = 25)
      val gl0 = Tables.spreadScan(dd)
        .select($"doc_id", graft.ext.Dedup.tokenNgrams($"text", 5).as("gs"))
      val (ctCand, gl) = graft.ext.Dedup.pairEndpointSlice(
        ctCand0, gl0, "doc_id")
      val dropContainment = ctCand
        .join(gl.select($"doc_id".as("src"), $"gs".as("ga")), "src")
        .join(gl.select($"doc_id".as("dst"), $"gs".as("gb")), "dst")
        .select($"dst",
          size($"ga").cast("bigint").as("na"),
          size($"gb").cast("bigint").as("nb"),
          size(array_intersect($"ga", $"gb")).cast("bigint").as("ni"))
        .where(expr("(1000000L * ni) div least(na, nb)") >= 500000L)
        .select($"dst".as("did")).distinct()

      // Semantic layer: the SemDeDup prune set (vec_id == doc_id)
      val dropSemantic = SimilarityQueries.dedupSemanticEmbed.query(s, d)
        .select($"vec_id".as("did")).distinct()

      def flag(dropped: org.apache.spark.sql.DataFrame, name: String) =
        dropped.select($"did".as("doc_id")).withColumn(name, lit(1))
      val flags = docs.select($"doc_id")
        .join(flag(dropMinhash, "f_minhash"), Seq("doc_id"), "left")
        .join(flag(dropSimhash, "f_simhash"), Seq("doc_id"), "left")
        .join(flag(dropContainment, "f_containment"), Seq("doc_id"), "left")
        .join(flag(dropSemantic, "f_semantic"), Seq("doc_id"), "left")
        .na.fill(0,
          Seq("f_minhash", "f_simhash", "f_containment", "f_semantic"))

      val layers = Seq("containment" -> "f_containment",
        "minhash" -> "f_minhash", "semantic" -> "f_semantic",
        "simhash" -> "f_simhash")
      val pairStructs = for {
        (la, ca) <- layers; (lb, cb) <- layers if la <= lb
      } yield struct(lit(la).as("layer_a"), lit(lb).as("layer_b"),
        col(ca).as("fa"), col(cb).as("fb"))
      flags.select(explode(array(pairStructs: _*)).as("p"))
        .select($"p.layer_a".as("layer_a"), $"p.layer_b".as("layer_b"),
          $"p.fa".as("fa"), $"p.fb".as("fb"))
        .groupBy($"layer_a", $"layer_b")
        .agg(sum($"fa" * $"fb").as("n_both"),
          sum($"fa" * (lit(1) - $"fb")).as("n_only_a"),
          sum((lit(1) - $"fa") * $"fb").as("n_only_b"),
          sum((lit(1) - $"fa") * (lit(1) - $"fb")).as("n_neither"),
          sum(greatest($"fa", $"fb")).as("n_union"))
        .select($"layer_a", $"layer_b",
          $"n_both".cast("long").as("n_both"),
          $"n_only_a".cast("long").as("n_only_a"),
          $"n_only_b".cast("long").as("n_only_b"),
          $"n_neither".cast("long").as("n_neither"),
          when($"n_union" > 0,
            expr("(1000000L * n_both) div n_union")).as("jaccard_ppm"))
        .orderBy($"layer_a", $"layer_b")
    }
  }

  /** THRESHOLD-SENSITIVITY SWEEP over the four near-dup layers — the
    * curve behind [[dedupLayerAgreement]]'s point estimate (its r16
    * verdict follow-up): each layer's drop set re-derived at 3
    * parameter settings, so a mixture decision cites how the drop
    * rate MOVES, not one operating point. Settings per layer:
    * MinHash = band layout 8×1 / 4×2 (deployed) / 2×4 over the SAME
    * k=8 `minhash_words_md5` signature (the LSH S-curve knee — the
    * layouts nest: a 2×4 collision implies 4×2 implies 8×1, and the
    * census shows it: 70% drop at 8×1 vs 5.6% at 4×2 on this corpus);
    * SimHash = Hamming ≤ 1/2/3 (deployed 3; all within the 4-band
    * pigeonhole guarantee); containment ≥ 0.5 (deployed) /0.7/0.9;
    * semantic cos > 0.3/0.4 (deployed)/0.5. Output per (layer,
    * setting): drop count, drop rate vs the full id universe in exact
    * ppm, and the exact-integer Jaccard of the setting's drop set vs
    * the layer's DEPLOYED setting — 12 rows.
    *
    * Scale shape — the reason this is one entry and not 12 re-runs:
    * each layer's EXPENSIVE stage (band index build, candidate-pair
    * generation, within-cluster pair dots) runs ONCE, and the
    * thresholds are row-local post-filters over a per-doc strength
    * aggregate (max containment, min Hamming, per-layout collision
    * flags, per-threshold cos bits) — at 100 TB the sweep costs one
    * candidate pass per layer plus a ≤|dropped|-row flag aggregate,
    * never a per-threshold rescan. The only setting that widens a
    * candidate set (8×1 banding) reuses the already-computed
    * signature. The DuckDB oracle replays all four layers as CTEs
    * (the [[dedupLayerAgreement]] pattern) with the same
    * once-then-filter structure. */
  val dedupThresholdSensitivity: CatalogEntry = {
    val k = 8
    val mins = (0 until k).map(i =>
      s"""    min(('0x' || substring(md5(sh || '#$i'), 1, 15))::BIGINT) AS mh$i""")
      .mkString(",\n")
    def mbands(rows: Int): String = (0 until k / rows).map { j =>
      val sig = (0 until rows).map(r => s"mh${rows * j + r}::VARCHAR")
        .mkString(" || '_' || ")
      s"""  SELECT doc_id, $j AS band, $sig AS sig FROM mh"""
    }.mkString("\n  UNION ALL\n")
    val bits = TextOps.SimhashBits
    val sums = (0 until bits).map(i =>
      s"""    sum(CASE WHEN (h & (1::BIGINT << $i)) != 0
         |        THEN 1 ELSE -1 END) AS s$i""".stripMargin).mkString(",\n")
    val assemble = (0 until bits).map(i =>
      s"(CASE WHEN s$i >= 0 THEN (1::BIGINT << $i) ELSE 0 END)")
      .mkString(" +\n  ")
    def cosFlag(coef: Int, name: String): String =
      s"""    max(CASE WHEN dotq > 0 AND
         |      100::HUGEINT * dotq::HUGEINT * dotq::HUGEINT >
         |      $coef::HUGEINT * naq::HUGEINT * nbq::HUGEINT
         |      THEN 1 ELSE 0 END) AS $name""".stripMargin
    CatalogEntry(
      "dedup_threshold_sensitivity",
      s"""WITH dd AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM dd),
         |msh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(toks[i:i+2], ' ')
         |     for i in range(1, len(toks) - 1)])) AS sh
         |  FROM tt WHERE len(toks) >= 3),
         |mh AS (
         |  SELECT doc_id,
         |$mins
         |  FROM msh GROUP BY doc_id),
         |mb1 AS (
         |${mbands(1)}),
         |mb2 AS (
         |${mbands(2)}),
         |mb4 AS (
         |${mbands(4)}),
         |md1 AS (SELECT DISTINCT b2.doc_id AS did FROM mb1 a JOIN mb1 b2
         |        ON a.band = b2.band AND a.sig = b2.sig
         |        AND a.doc_id < b2.doc_id),
         |md2 AS (SELECT DISTINCT b2.doc_id AS did FROM mb2 a JOIN mb2 b2
         |        ON a.band = b2.band AND a.sig = b2.sig
         |        AND a.doc_id < b2.doc_id),
         |md4 AS (SELECT DISTINCT b2.doc_id AS did FROM mb4 a JOIN mb4 b2
         |        ON a.band = b2.band AND a.sig = b2.sig
         |        AND a.doc_id < b2.doc_id),
         |mfl AS (
         |  SELECT did, max(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS f_b8x1,
         |    max(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS f_b4x2,
         |    max(CASE WHEN s = 4 THEN 1 ELSE 0 END) AS f_b2x4
         |  FROM (SELECT did, 1 AS s FROM md1
         |        UNION ALL SELECT did, 2 FROM md2
         |        UNION ALL SELECT did, 4 FROM md4)
         |  GROUP BY did),
         |stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |         FROM dd),
         |sh2 AS (SELECT doc_id,
         |          ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
         |        FROM stok),
         |sv AS (
         |  SELECT doc_id,
         |$sums
         |  FROM sh2 GROUP BY doc_id),
         |sfp AS (SELECT doc_id,
         |  $assemble AS fp
         |  FROM sv),
         |sb AS (
         |  SELECT doc_id, fp, band, ((fp >> (16 * band)) & 65535) AS bval
         |  FROM sfp, (SELECT unnest([0, 1, 2, 3]) AS band)),
         |shm AS (
         |  SELECT c.doc_id AS did, min(bit_count(xor(a.fp, c.fp))) AS hmin
         |  FROM sb a JOIN sb c ON a.band = c.band AND a.bval = c.bval
         |    AND a.doc_id < c.doc_id
         |  WHERE bit_count(xor(a.fp, c.fp)) <= 3 GROUP BY c.doc_id),
         |sflag AS (SELECT did,
         |  CASE WHEN hmin <= 1 THEN 1 ELSE 0 END AS f_h1,
         |  CASE WHEN hmin <= 2 THEN 1 ELSE 0 END AS f_h2,
         |  1 AS f_h3 FROM shm),
         |cgl AS (
         |  SELECT doc_id,
         |    list_distinct([array_to_string(list_slice(toks, i, i + 4), ' ')
         |                   for i in range(1, greatest(len(toks) - 3, 1))])
         |      AS gs
         |  FROM tt),
         |cg AS (SELECT doc_id, unnest(gs) AS gram FROM cgl),
         |crare AS (SELECT gram FROM cg GROUP BY gram
         |          HAVING count(*) BETWEEN 2 AND 25),
         |ce AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         |       FROM cg a JOIN cg b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |       WHERE a.gram IN (SELECT gram FROM crare)),
         |cj AS (
         |  SELECT src, dst, len(x.gs)::BIGINT AS na, len(y.gs)::BIGINT AS nb,
         |    len(list_intersect(x.gs, y.gs))::BIGINT AS ni
         |  FROM ce JOIN cgl x ON x.doc_id = src JOIN cgl y ON y.doc_id = dst),
         |cmax AS (SELECT dst AS did,
         |           max((1000000 * ni) // least(na, nb)) AS cm
         |         FROM cj GROUP BY dst),
         |cflag AS (SELECT did,
         |  CASE WHEN cm >= 500000 THEN 1 ELSE 0 END AS f_c50,
         |  CASE WHEN cm >= 700000 THEN 1 ELSE 0 END AS f_c70,
         |  CASE WHEN cm >= 900000 THEN 1 ELSE 0 END AS f_c90 FROM cmax),
         |cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |         WHERE vec_id < 8),
         |d2 AS (
         |  SELECT e.vec_id, c.cid, e.embedding AS v,
         |    list_sum([round(((e.embedding[i]::DOUBLE) - (c.cvec[i]::DOUBLE))
         |                    * ((e.embedding[i]::DOUBLE) - (c.cvec[i]::DOUBLE))
         |                    * 1e9, 0)::BIGINT
         |              for i in range(1, len(e.embedding) + 1)])::BIGINT AS d2q
         |  FROM embeddings e, cent c),
         |asg AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT vec_id, v, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cid) AS rn
         |    FROM d2) WHERE rn = 1),
         |nn AS (
         |  SELECT vec_id, cid, v,
         |    list_sum([roundbankers((v[i]::DOUBLE) * (v[i]::DOUBLE) * 1e9,
         |                           0)::BIGINT
         |              for i in range(1, len(v) + 1)])::BIGINT AS nq
         |  FROM asg),
         |sp AS (
         |  SELECT y.vec_id AS did,
         |    list_sum([roundbankers((x.v[i]::DOUBLE) * (y.v[i]::DOUBLE) * 1e9,
         |                           0)::BIGINT
         |              for i in range(1, len(x.v) + 1)])::BIGINT AS dotq,
         |    x.nq AS naq, y.nq AS nbq
         |  FROM nn x JOIN nn y ON x.cid = y.cid AND x.vec_id < y.vec_id),
         |eflag AS (
         |  SELECT did,
         |${cosFlag(9, "f_cos30")},
         |${cosFlag(16, "f_cos40")},
         |${cosFlag(25, "f_cos50")}
         |  FROM sp GROUP BY did),
         |nd AS (SELECT count(*)::BIGINT AS n FROM documents),
         |rows_ AS (
         |  SELECT 'containment' AS layer, 'c50' AS setting, f_c50 AS f,
         |    f_c50 AS fb FROM cflag
         |  UNION ALL SELECT 'containment', 'c70', f_c70, f_c50 FROM cflag
         |  UNION ALL SELECT 'containment', 'c90', f_c90, f_c50 FROM cflag
         |  UNION ALL SELECT 'minhash', 'b2x4', f_b2x4, f_b4x2 FROM mfl
         |  UNION ALL SELECT 'minhash', 'b4x2', f_b4x2, f_b4x2 FROM mfl
         |  UNION ALL SELECT 'minhash', 'b8x1', f_b8x1, f_b4x2 FROM mfl
         |  UNION ALL SELECT 'semantic', 'cos30', f_cos30, f_cos40 FROM eflag
         |  UNION ALL SELECT 'semantic', 'cos40', f_cos40, f_cos40 FROM eflag
         |  UNION ALL SELECT 'semantic', 'cos50', f_cos50, f_cos40 FROM eflag
         |  UNION ALL SELECT 'simhash', 'h1', f_h1, f_h3 FROM sflag
         |  UNION ALL SELECT 'simhash', 'h2', f_h2, f_h3 FROM sflag
         |  UNION ALL SELECT 'simhash', 'h3', f_h3, f_h3 FROM sflag),
         |base AS (SELECT layer, setting FROM (VALUES
         |  ('containment','c50'),('containment','c70'),('containment','c90'),
         |  ('minhash','b2x4'),('minhash','b4x2'),('minhash','b8x1'),
         |  ('semantic','cos30'),('semantic','cos40'),('semantic','cos50'),
         |  ('simhash','h1'),('simhash','h2'),('simhash','h3'))
         |  v(layer, setting))
         |SELECT b.layer, b.setting,
         |  coalesce(sum(r.f), 0)::BIGINT AS n_dropped,
         |  ((1000000 * coalesce(sum(r.f), 0)) // (SELECT n FROM nd))::BIGINT
         |    AS drop_ppm,
         |  CASE WHEN coalesce(sum(greatest(r.f, r.fb)), 0) > 0
         |    THEN ((1000000 * sum(r.f * r.fb)) //
         |          sum(greatest(r.f, r.fb)))::BIGINT
         |  END AS jaccard_vs_base_ppm
         |FROM base b LEFT JOIN rows_ r
         |  ON b.layer = r.layer AND b.setting = r.setting
         |GROUP BY b.layer, b.setting ORDER BY b.layer, b.setting""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val dd = docs.where($"text".isNotNull)

      // MinHash: one k=8 signature EXPRESSION, three band layouts over
      // it; drop = larger id of a band collision. r22 (the round's
      // measured CPU hog — the formatted plan held TWELVE
      // `minhash_words_md5` evaluations): the three layouts used to be
      // three separate band self-joins, each planned broadcast (no
      // exchange to reuse), so BOTH sides of EACH join re-evaluated
      // the k=8 salted-md5 kernel over the corpus. All three layouts
      // now explode into ONE (layout, band, sig) table and ONE
      // self-join keyed (layout, band, sig) — identical collision
      // pairs per layout (band equality within a layout is exactly
      // the tagged three-key equality), same flags, and the kernel
      // evaluates twice total instead of six+. The r21 trade note
      // stands: re-evaluation beat a localCheckpoint (3.0 s vs 3.6 s
      // at sf0.1); this keeps re-evaluation and shrinks its
      // multiplier. At production scale the signature table would be
      // persisted once and all layouts read it.
      // token-count guard, not size(mhs) — a filter on the kernel's
      // output pushes to the scan with the kernel inlined and doubles
      // the md5 pass (same fix as dedup_layer_agreement; identical
      // row set: size(split) = 1 + spaces = the kernel's own nTok)
      val mh = dd.where(size(split($"text", " ")) >= 3)
        .select($"doc_id",
          call_function("minhash_words_md5", $"text", lit(k), lit(3))
            .as("mhs"))
      val bandStructs = Seq(1, 2, 4).flatMap { rows =>
        (0 until k / rows).map(j =>
          struct(lit(rows).as("s"), lit(j).as("band"),
            concat_ws("_", (0 until rows).map(r =>
              element_at($"mhs", rows * j + r + 1).cast("string")): _*)
              .as("sig")))
      }
      val bandsAll = mh.select($"doc_id",
          explode(array(bandStructs: _*)).as("b"))
        .select($"doc_id", $"b.s".as("s"), $"b.band".as("band"),
          $"b.sig".as("sig"))
      val mfl = bandsAll.as("a").join(bandsAll.as("b"),
          col("a.s") === col("b.s") && col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("did"), col("a.s").as("s"))
        .distinct()
        .groupBy($"did")
        .agg(max(when($"s" === 1, 1).otherwise(0)).as("f_b8x1"),
          max(when($"s" === 2, 1).otherwise(0)).as("f_b4x2"),
          max(when($"s" === 4, 1).otherwise(0)).as("f_b2x4"))

      // SimHash: pair machinery ONCE at the widest guaranteed radius
      // (3); tighter radii are filters over the kept per-pair Hamming
      val sflag = graft.ext.Dedup.simhashNearDupPairs(
          dd.select($"doc_id", $"text"), "doc_id", "text",
          maxHamming = 3, kernel = "simhash63_md5")
        .groupBy($"id_b".as("did")).agg(min($"hamming").as("hmin"))
        .select($"did",
          when($"hmin" <= 1, 1).otherwise(0).as("f_h1"),
          when($"hmin" <= 2, 1).otherwise(0).as("f_h2"),
          lit(1).as("f_h3"))

      // Containment: rare-gram candidate pairs ONCE; per-doc MAX
      // containment, thresholds as flag bits (candidate-endpoint
      // slice r21, guide §3.2/§8: gram arrays computed/shuffled for
      // candidate endpoints only)
      val ctCand0 = graft.ext.Dedup.sharedGramPairs(
        docs, "doc_id", "text", n = 5, maxDf = 25)
      val gl0 = Tables.spreadScan(dd)
        .select($"doc_id", graft.ext.Dedup.tokenNgrams($"text", 5).as("gs"))
      val (ctCand, gl) = graft.ext.Dedup.pairEndpointSlice(
        ctCand0, gl0, "doc_id")
      val cflag = ctCand
        .join(gl.select($"doc_id".as("src"), $"gs".as("ga")), "src")
        .join(gl.select($"doc_id".as("dst"), $"gs".as("gb")), "dst")
        .select($"dst".as("did"),
          expr("(1000000L * cast(size(array_intersect(ga, gb)) AS BIGINT))" +
            " div least(cast(size(ga) AS BIGINT), cast(size(gb) AS BIGINT))")
            .as("cont_ppm"))
        .groupBy($"did").agg(max($"cont_ppm").as("cm"))
        .select($"did",
          when($"cm" >= 500000L, 1).otherwise(0).as("f_c50"),
          when($"cm" >= 700000L, 1).otherwise(0).as("f_c70"),
          when($"cm" >= 900000L, 1).otherwise(0).as("f_c90"))

      // Semantic: within-cluster pair dots ONCE (the SemDeDup assign +
      // vec_dot_q9 machinery of dedup_semantic_embed), three cos
      // thresholds as exact-integer bits over the same quantized dots
      // r22 row-local assign (the dedup_semantic_embed change, same
      // rationale): centroids fold into one broadcast array and the
      // argmin is a row-local array_min over (d2q, cid) structs —
      // the corpus-wide struct-min exchange (AQE-coalescible onto one
      // core; SortAggregate) disappears; identical winner per vector.
      val emb = Tables.embeddings(s, d)
      val centArr = emb.where($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
        .agg(sort_array(collect_list(struct($"cid", $"cvec"))).as("cs"))
      val asg = emb.crossJoin(broadcast(centArr))
        .select($"vec_id", $"embedding".as("v"),
          array_min(transform($"cs", c =>
            struct(
              aggregate(
                zip_with($"embedding", c.getField("cvec"), (a, cc) => {
                  val diff = a.cast("double") - cc.cast("double")
                  round(diff * diff * lit(1e9), 0).cast("long")
                }),
                lit(0L), (acc, t) => acc + t).as("d2q"),
              c.getField("cid").as("cid")))).as("b"))
        .select($"vec_id", $"b.cid".as("cid"), $"v")
      val nrm = asg.withColumn("nq", expr("vec_dot_q9(v, v)"))
      // broadcast the build side (r22, the dedup_semantic_embed fix):
      // 8 distinct cluster keys cap a shuffled pair join at 8-way
      // parallelism and AQE coalescing then serializes the dots
      val pairs = broadcast(nrm.select($"vec_id".as("ida"), $"cid",
          $"v".as("xv"), $"nq".as("naq")))
        .join(nrm.select($"vec_id".as("did"), $"cid".as("ycid"),
          $"v".as("yv"), $"nq".as("nbq")),
          $"cid" === $"ycid" && $"ida" < $"did")
        .select($"did", expr("vec_dot_q9(xv, yv)").as("dotq"),
          $"naq", $"nbq")
      def cosBit(coef: Int) = max(when($"dotq" > 0 &&
        lit(100).cast("decimal(38,0)") * $"dotq" * $"dotq" >
          lit(coef).cast("decimal(38,0)") * $"naq" * $"nbq", 1)
        .otherwise(0))
      val eflag = pairs.groupBy($"did")
        .agg(cosBit(9).as("f_cos30"), cosBit(16).as("f_cos40"),
          cosBit(25).as("f_cos50"))

      // (layer, setting, f, fb) rows; fb = the layer's DEPLOYED setting
      def rows3(fl: DataFrame, layer: String,
          cols: Seq[(String, String)], baseCol: String): DataFrame =
        fl.select(explode(array(cols.map { case (st, c) =>
            struct(lit(layer).as("layer"), lit(st).as("setting"),
              col(c).as("f"), col(baseCol).as("fb"))
          }: _*)).as("r"))
          .select($"r.layer", $"r.setting", $"r.f", $"r.fb")
      val all = rows3(cflag, "containment",
          Seq("c50" -> "f_c50", "c70" -> "f_c70", "c90" -> "f_c90"), "f_c50")
        .union(rows3(mfl, "minhash",
          Seq("b2x4" -> "f_b2x4", "b4x2" -> "f_b4x2", "b8x1" -> "f_b8x1"),
          "f_b4x2"))
        .union(rows3(eflag, "semantic",
          Seq("cos30" -> "f_cos30", "cos40" -> "f_cos40",
            "cos50" -> "f_cos50"), "f_cos40"))
        .union(rows3(sflag, "simhash",
          Seq("h1" -> "f_h1", "h2" -> "f_h2", "h3" -> "f_h3"), "f_h3"))
      val agg = all.groupBy($"layer", $"setting")
        .agg(sum($"f").as("nf"), sum($"f" * $"fb").as("nboth"),
          sum(greatest($"f", $"fb")).as("nunion"))
      val baseRows = Seq(
        ("containment", "c50"), ("containment", "c70"),
        ("containment", "c90"), ("minhash", "b2x4"), ("minhash", "b4x2"),
        ("minhash", "b8x1"), ("semantic", "cos30"), ("semantic", "cos40"),
        ("semantic", "cos50"), ("simhash", "h1"), ("simhash", "h2"),
        ("simhash", "h3")).toDF("layer", "setting")
      val nd = docs.agg(count(lit(1)).as("n"))
      baseRows.join(agg, Seq("layer", "setting"), "left")
        .crossJoin(broadcast(nd))
        .select($"layer", $"setting",
          coalesce($"nf", lit(0L)).cast("long").as("n_dropped"),
          expr("(1000000L * coalesce(nf, 0L)) div n").as("drop_ppm"),
          when(coalesce($"nunion", lit(0L)) > 0,
            expr("(1000000L * nboth) div nunion")).as("jaccard_vs_base_ppm"))
        .orderBy($"layer", $"setting")
    }
  }

  def entries: Seq[CatalogEntry] = Seq(
    qualityClassifierAuc, qualityCalibrationBins, statsCohenKappa,
    qualityGateAblation, qualityFilterAgreement,
    docStripRepeatedSpans, dedupLayerAgreement, dedupThresholdSensitivity,
    packSequencesFfd, dedupBbitMinhash, dedupMinhashOph,
    dedupOphVsKhash, docLmExcessRank,
    qualityPplBuckets, corpusZipfFit, corpusHeapsFit,
    langConfusionMatrix, packEfficiencyCensus, corpusNoveltyCurve,
    decontamSubstringExact, dedupSubstringSuffix, dedupStripSpans,
    dedupStripIncremental,
    tokenLengthHistogram, dedupPriorityKeep,
    dedupCandidateQuality, dedupLshScurve, vocabBpeMerges,
    tfidfPerDocTopk,
    textWordcount, textStats, langAgg, dedupExact, dedupNgramJaccard,
    textSimhash, dedupMinhashLsh, docWinnowFingerprint, langIdHeuristic,
    tfidfTopTerms, docQualityFilter, textBigrams, heavyHittersMg,
    textNormalize, dedupMinhashPortable, textSimhashPortable,
    docWinnowPortable, dedupSimhashPortable, heavyHittersMgPortable,
    dedupSimhashHamming, decontamNgramOverlap, piiScrub,
    docRepetitionStats, docChunkTokens, dedupClusterCc,
    decontamBloomPrefilter, dedupSegments, vocabCoverage, docLmScore,
    heavyHittersExact, dedupClusterCcStar, packSequencesGreedy,
    qualityClassifierScore, textEntropy, vocabEncodeDocs, bm25Topk,
    dedupSetsimJoin, dedupGraphTriangles, dedupClusterCanonical,
    corpusKlDrift, corpusNgramDiversity, dedupContainment,
    dedupIncrementalRef, vocabBpeApply, docLmBigramScore,
    dedupRateBySource, vocabFertilityByLang, corpusSimpsonDiversity)
}
