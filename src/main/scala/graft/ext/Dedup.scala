package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication for document corpora at training-data scale.
  *
  * Exact: group on a content hash (32-byte digest, not the full text —
  * the shuffle carries hashes + ids, never documents), survivor = the
  * smallest id, deterministically.
  *
  * Near-dup: MinHash + LSH banding. Per doc: distinct shingles →
  * k minhashes (xxhash64 with k salts) → b bands of r rows; docs
  * sharing any band hash become candidate pairs via an equi-join on
  * (band, bandHash) — never an all-pairs cross join. Candidates are
  * confirmed with exact shingle Jaccard. All hashing is xxhash64 column
  * expressions: deterministic, codegen'd, no UDFs.
  *
  * 100 TB: the band join shuffles (band, hash, id) triples only; a
  * degenerate band (all docs identical) is an AQE-skew case, and the
  * candidate explosion is bounded by band width r — tune (k, b, r)
  * for the corpus' duplicate rate.
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct `textCol` content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash signature columns mh0..mh{k-1}: explode shingles, then k
    * `min` aggregates over the salted xxhash64. The explode+agg shape
    * computes the shingle array once per document (k projected copies
    * of the array expression get re-inlined by CollapseProject and blow
    * up codegen — measured 30× slower) and partial-aggregates map-side,
    * so the shuffle carries k longs per document. Duplicate shingles
    * don't need dedup: min over a bag equals min over its set. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      k: Int, shingleLen: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(TextOps.shingles(col(textCol), shingleLen)).as("__sh"))
    val aggs = (0 until k).map { i =>
      min(xxhash64(concat(col("__sh"), lit(s"#$i")))).as(s"mh$i")
    }
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Band hashes over a signature frame: bands × (band, band_hash, id)
    * rows, ready for the candidate equi-join. */
  def bandHashes(sig: DataFrame, idCol: String, bands: Int, rows: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("band_hash"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bh"))
      .select(col(idCol), col("bh.band"), col("bh.band_hash"))
  }

  /** Winnowing fingerprints (the MOSS scheme): hash every k-gram, then
    * keep the minimum hash of each sliding window of `w` consecutive
    * k-grams; the distinct minima are the document's fingerprint set.
    * Guarantee: any shared substring of length >= k + w - 1 contributes
    * at least one shared fingerprint — the basis for plagiarism-style
    * overlap detection.
    *
    * Shaped as posexplode → per-key window min → distinct: the window
    * frame reads each hash once (an O(n·w) per-partition pass; the
    * alternative — array lambdas re-evaluating the hash array per
    * window — is O(n²) per row and blows up codegen like the minhash
    * case documented on [[minhashSignature]]). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val hashes = transform(
      sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
      i => hashFn(col(textCol).substr(i, lit(k))))
    val exploded = df.select(col(idCol), posexplode(hashes).as(Seq("pos", "h")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos")).rowsBetween(0, w - 1)
    exploded
      .select(col(idCol), min(col("h")).over(win).as("fp"),
        count(lit(1)).over(win).as("wn"))
      .filter(col("wn") === w) // only full windows fingerprint
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** SimHash multi-index (Manku/Jain/Sarma, WWW'07): the 63-bit
    * fingerprint from the native single-pass `simhash63` expression,
    * split into 4 contiguous 16-bit bands (band 3 carries 15 bits). Two
    * fingerprints within Hamming distance 3 differ in at most 3 bands,
    * so by pigeonhole they agree EXACTLY on at least one — candidate
    * retrieval is an equi-join on (band, band_value), never an
    * all-pairs scan. At 100 TB the index is 4 (band, int, id) rows per
    * doc; the fingerprint stage itself plans zero shuffles. */
  def simhashBandIndex(df: DataFrame, idCol: String, textCol: String,
      kernel: String = "simhash63"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val fp = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        call_function(kernel, TextOps.tokens(col(textCol))).as("fp"))
    fp.select(col(idCol), col("fp"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bval"))): _*))
        .as("bs"))
      .select(col(idCol), col("fp"), col("bs.band"), col("bs.bval"))
  }

  /** Near-dup pairs (idA < idB) at Hamming distance <= `maxHamming`
    * over the banded SimHash index: band equi-join for candidates,
    * `bit_count(xor)` to confirm. `maxHamming` must stay below the
    * band count for the pigeonhole recall guarantee. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, kernel: String = "simhash63"): DataFrame = {
    require(maxHamming < 4,
      s"maxHamming=$maxHamming breaks the 4-band pigeonhole guarantee")
    val idx = simhashBandIndex(df, idCol, textCol, kernel)
    idx.as("a").join(idx.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct() // a pair may co-bucket in more than one band
  }

  /** Candidate near-dup pairs (idA < idB) from LSH banding, confirmed
    * with exact shingle Jaccard >= `threshold`. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleLen: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val sig = minhashSignature(df, idCol, textCol, k, shingleLen)
    val bh = bandHashes(sig, idCol, bands, k / bands)
    val candidates = bh.as("a")
      .join(bh.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val shingled = df.select(col(idCol),
      TextOps.shingles(col(textCol), shingleLen).as("sh"))
    candidates
      .join(shingled.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", TextOps.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-dup candidate pairs (src < dst) linking documents that share
    * any distinct token `n`-gram, with the standard HOT-GRAM GUARD:
    * grams whose document frequency exceeds `maxDf` are dropped before
    * any pair is emitted. Without the cap a raw `grams ⋈ grams ON gram`
    * self-join emits O(f²) pairs per gram — one boilerplate sentence
    * ("all rights reserved …") present in 10⁶ documents of a 100 TB
    * corpus is 10¹² pairs from a single gram. With it, pair output is
    * bounded at df·(df−1)/2 ≤ maxDf²/2 per gram, i.e. O(maxDf · f)
    * total instead of O(f²); this is the same guard the suffix-array
    * and CC-dedup literature applies, and it loses nothing in real dup
    * clusters — near-copies share many RARE grams, so a capped hot gram
    * links nothing that rarer shared grams weren't already linking.
    *
    * Plan shape (100 TB): two shuffles of the gram stream, both with
    * map-side partial aggregation — (1) `groupBy(gram).count()` for df,
    * (2) an explicit gram-keyed repartition feeding the `collect_set`
    * groupBy (the semi-join broadcasts the rare set, so this is the
    * posting build's only exchange). Because the df filter runs BEFORE
    * the collect, every
    * aggregation buffer is structurally bounded at `maxDf` ids — a hot
    * gram can never balloon an executor — and pair expansion is
    * row-local (`transform` over the sorted posting, no join). */
  def sharedGramPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Int): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf cannot link any pair")
    // Explicit partition count on the posting-build and pair exchanges:
    // the rare-gram set is small, so the semi-join broadcasts and the
    // posting aggregate's exchange carries only partially-aggregated
    // postings — tiny in BYTES, so AQE's byte-based coalescing folds
    // the final collect_set + pair explode (the CPU-heavy part) onto
    // ONE core (round-10 bench: a 368 s single-task stage inside
    // dedup_cluster_cc). repartition(n, key) is REPARTITION_BY_NUM,
    // exempt from coalescing, and the groupBy/distinct reuse it.
    val shufN = docs.sparkSession.sessionState.conf.numShufflePartitions
    // spreadScan: the tokenize+explode CPU must not inherit the scan's
    // byte-sized (possibly single-task) parallelism
    val grams = Tables.spreadScan(docs.where(col(textCol).isNotNull))
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokenNgrams(col(textCol), n)).as("gram"))
    // per-doc grams are already distinct (tokenNgrams array_distinct),
    // so count(*) per gram IS document frequency
    val rare = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .where(col("df").between(2, maxDf))
      .select(col("gram"))
    val postings = grams.join(rare, Seq("gram"), "left_semi")
      .repartition(shufN, col("gram"))
      .groupBy(col("gram"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
    // all (i < j) pairs within one posting, row-local: for each element
    // x at 0-based index i, pair it with every later element
    val pairs = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        y => struct(x.as("src"), y.as("dst")))))
    postings.select(explode(pairs).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(shufN, col("src"), col("dst"))
      .distinct()
  }

  /** Candidate-endpoint slice of a heavy per-doc table — the
    * decide-with-small-rows / move-heavy-bytes-once discipline (guide
    * §3.2 semi-join prefilter + §8) for the verify stage that follows
    * every pair blocker: confirming candidate pairs needs each
    * endpoint's per-doc payload (gram/shingle arrays, band
    * signatures), but joining the FULL per-doc table onto the pairs —
    * the r20 shape in six catalog entries — shuffles (and, because the
    * payload projection is referenced once per endpoint side,
    * COMPUTES) every document's payload twice, when only candidate
    * endpoints' payloads are ever read. Candidate sets are a tiny
    * fraction of the corpus by construction (df-capped blockers).
    *
    * Returns (pairsC, slice): `pairsC` is the pairs plan
    * localCheckpointed — it now has three consumers (the endpoint-id
    * set and the caller's two attach joins), and without the
    * checkpoint the expensive blocker plan would re-execute per
    * consumer; `slice` is `perDoc` LEFT SEMI-joined to the distinct
    * endpoint ids — the semi-join pushes below the payload projection
    * (its condition needs only `idCol`), so non-candidates are never
    * tokenized at all. The slice is deliberately NOT checkpointed:
    * each attach side re-runs scan + semi + candidate-only payload
    * build, which measured CHEAPER at the bench SF than a third
    * materialization barrier (two extra eager jobs cost ~0.3-0.7 s of
    * boundary latency per entry against ~0.1 s of duplicated
    * candidate tokenization); at 100 TB, where the second scan pass
    * would dominate instead, a caller inserts one `localCheckpoint()`
    * on the slice — the shape (candidate-only compute and shuffle) is
    * unchanged either way. The checkpointed pairs side carries exact
    * size statistics, so AQE picks broadcast attaches at test scale
    * and falls back to filtered-table shuffles when the candidate
    * universe outgrows the threshold — scale-adaptive, no tuned
    * constant. */
  def pairEndpointSlice(pairs: DataFrame, perDoc: DataFrame,
      idCol: String, srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, DataFrame) = {
    val pairsC = pairs.localCheckpoint()
    val cand = pairsC.select(col(srcCol).as(idCol))
      .union(pairsC.select(col(dstCol).as(idCol)))
      .distinct()
    val slice = perDoc.join(cand, Seq(idCol), "left_semi")
    (pairsC, slice)
  }

  /** Distinct token n-grams per row as a column expression; short rows
    * (< n tokens) yield an empty array — `sequence()` flips to a
    * DESCENDING range on a negative span, so the short side must be
    * guarded, not clamped. */
  def tokenNgrams(textCol: Column, n: Int): Column = {
    val toks = TextOps.tokens(textCol)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Train/eval contamination counts — the decontamination primitive of
    * an LLM training-data pipeline: for every corpus document sharing at
    * least one token `n`-gram with `evalDocs` (a benchmark/eval suite),
    * the count of its distinct n-grams that appear anywhere in the eval
    * set. Standard overlap rule (n=13 in the GPT-3/PaLM data cards):
    * any hit marks the document for exclusion; the count grades
    * severity (verbatim copy vs one shared boilerplate sentence).
    *
    * 100 TB shape: eval suites are MBs, so their distinct-gram set is
    * BROADCAST and the corpus is scanned exactly once with no
    * corpus-wide shuffle — per-doc grams explode, survive the broadcast
    * inner join only on a hit (rare in a clean corpus), and only hits
    * reach the per-doc dedup + count exchanges. Production would hash
    * grams to int64 (xxhash64) to shrink the broadcast ~10x; gram TEXT
    * is kept so a SQL oracle can replay the pipeline verbatim.
    *
    * Gram construction is INDEX-exploded (explode the cheap start-index
    * range, then `array_join(slice(toks, i, n))` per output row) rather
    * than exploding a `tokenNgrams` array column: the optimizer's
    * InferFiltersFromGenerate guard (`size(gs) > 0`) pushes through the
    * spread repartition into the SCAN-side filter with the gram
    * expression substituted, re-inlining the full n-gram array build —
    * twice — into the single-task scan stage (measured: a 2.4-6.1 s
    * one-task CPU stage at sf0.1 inside the broadcast build, caught by
    * the bench's single_task detector in r12). With index explosion
    * the inferred guard is integer arithmetic on `size(split(text))`,
    * and the string-building CPU runs post-exchange on the session's
    * full parallelism. Per-doc gram dedup moves AFTER the broadcast
    * join, where it touches only the (rare) hits instead of the
    * corpus. */
  def ngramOverlapCounts(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    // spreadScan on both legs: the gram-build CPU must not inherit the
    // scan's byte-sized (possibly single-task) parallelism — the eval
    // leg is small in BYTES but its gram explode is the same CPU shape
    def gramRows(df: DataFrame): DataFrame =
      Tables.spreadScan(df.where(col(textCol).isNotNull))
        .select(col(idCol), split(col(textCol), " ").as("toks"))
        .select(col(idCol), col("toks"),
          explode(when(size(col("toks")) >= n,
            sequence(lit(1), size(col("toks")) - (n - 1)))
            .otherwise(array().cast("array<integer>"))).as("i"))
        .select(col(idCol),
          array_join(slice(col("toks"), col("i"), lit(n)), " ").as("gram"))
    val evalGrams = gramRows(evalDocs).select(col("gram")).distinct()
    gramRows(docs) // per-doc duplicate grams still present — see below
      .join(broadcast(evalGrams), Seq("gram"))
      // per-doc distinct AFTER the join: only hit rows pay the dedup
      // exchange, and distinct-after-filter ≡ distinct-before-filter
      .select(col(idCol), col("gram")).distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"))
  }
}
