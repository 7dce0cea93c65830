package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.MultiModal

/** Multimodal-column plumbing entries (builder brief): binary payload
  * transport + decode/metadata/frame-sample shapes. Image decode is a
  * REAL codec (JDK javax.imageio PNG, `multimodal_png_roundtrip`);
  * audio/video-shaped decode remains a clearly-marked deterministic
  * stub (see MultiModal's CODEC STATUS); the schema, binary columns,
  * partition batching and slicing are identical for both.
  */
object MediaQueries {

  /** Spread the CHEAP metadata side across the cluster by range BEFORE
    * the codec stages, so (a) the expensive per-row codec work runs on
    * every core — a 600 KB parquet file is one input split, which would
    * otherwise serialize the whole codec chain onto a single task — and
    * (b) the final total order comes from `sortWithinPartitions` over
    * already-range-partitioned data instead of a trailing `orderBy`,
    * whose RangePartitioner sampling pass would RE-EXECUTE the entire
    * codec chain a second time just to pick boundaries. The explicit
    * partition count makes the shuffle REPARTITION_BY_NUM, which AQE
    * will not coalesce back down for being small — small metadata is
    * exactly the point. At 100 TB this is the same plan: range-shuffle
    * the ids/specs (tiny), run the codec once per row, never resample
    * through it. */
  private def spreadByRange(df: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.SparkSession,
      keyCol: String): org.apache.spark.sql.DataFrame =
    df.repartitionByRange(s.sparkContext.defaultParallelism, col(keyCol))

  /** Column-expression path: blob → typed metadata struct + frame
    * count. FULLY ORACLED since r18: the stub's pseudo-metadata hash
    * is the portable md5-prefix-60 ([[MultiModal.decodeMeta]]), so
    * DuckDB replays every width/height/fingerprint by pure arithmetic
    * on the text bytes — the decode is still an honestly-labeled fake,
    * but the Spark-side plumbing (binary transport, struct schema,
    * frame-sample shape) is now hash-gated end to end. */
  val multimodalDecode: CatalogEntry = CatalogEntry(
    "multimodal_decode",
    """WITH b AS (
      |  SELECT doc_id, strlen(text)::INT AS n_bytes,
      |    ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, n_bytes, 'stub/raw' AS format,
      |  (fp % 1920 + 1)::INT AS width,
      |  ((fp // 65536) % 1080 + 1)::INT AS height,
      |  fp AS fingerprint, 4 AS n_frames
      |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).where($"text".isNotNull)
      .select($"doc_id", MultiModal.textAsBlob($"text").as("blob"))
      .select($"doc_id",
        MultiModal.decodeMeta($"blob").as("meta"),
        size(MultiModal.frameSample($"blob", n = 4, frameBytes = 16))
          .as("n_frames"))
      .select($"doc_id", $"meta.n_bytes", $"meta.format", $"meta.width",
        $"meta.height", $"meta.fingerprint", $"n_frames")
      .orderBy($"doc_id")
  }

  /** Partition-batched imperative path (mapInPandas analogue):
    * mapPartitions with a per-partition decoder instance. FULLY
    * ORACLED since r18 via the same portable stub arithmetic as
    * [[multimodalDecode]] — the two paths emit identical values, so
    * this entry also pins column-path == imperative-path equality. */
  val multimodalDecodePartitions: CatalogEntry = CatalogEntry(
    "multimodal_decode_partitions",
    """WITH b AS (
      |  SELECT doc_id, strlen(text)::INT AS n_bytes,
      |    ('0x' || substring(md5(text), 1, 15))::BIGINT AS fp
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, n_bytes, 'stub/raw' AS format,
      |  (fp % 1920 + 1)::INT AS width,
      |  ((fp // 65536) % 1080 + 1)::INT AS height,
      |  fp AS fingerprint
      |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    MultiModal.decodePartitions(
      Tables.documents(s, d).where($"text".isNotNull)
        .select($"doc_id", MultiModal.textAsBlob($"text").as("blob")),
      "doc_id", "blob")
      .toDF()
      .select($"id".as("doc_id"), $"nBytes".as("n_bytes"), $"format",
        $"width", $"height", $"fingerprint")
      .orderBy($"doc_id")
  }

  /** REAL codec round-trip, ORACLED on the decode-derived metadata:
    * per-document specs → actual PNG bytes (javax.imageio encode, one
    * codec per partition) → actual PNG decode. Format and dimensions
    * come from the DECODED raster — never echoed from the input spec —
    * while the DuckDB oracle recomputes what a correct round-trip MUST
    * report by pure arithmetic on doc_id. Hash-green therefore proves
    * real PNG bytes moved through the binary column and decoded back to
    * every document's exact dimensions. Encoded byte count is
    * JVM-encoder-specific, so `n_bytes` stays OUT of the oracle columns
    * — it gates rows instead (a PNG can't fit under its 8-byte
    * signature + IHDR/IDAT/IEND chunk floor), and the byte-exact raster
    * fingerprint is asserted in MultiModalSpec. */
  val multimodalPngRoundtrip: CatalogEntry = CatalogEntry(
    "multimodal_png_roundtrip",
    """SELECT doc_id,
      |  'image/png' AS format,
      |  (doc_id % 48 + 16)::INT AS width,
      |  ((doc_id * 7) % 48 + 16)::INT AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 48 + 16).as("w"), (($"doc_id" * 7) % 48 + 16).as("h")),
      s, "doc_id")
    val blobs = MultiModal.encodeImagePartitions(meta, "doc_id", "w", "h")
    MultiModal.decodeImagePartitions(blobs, "id", "blob")
      .toDF()
      .where($"nBytes" > 57) // 8-byte sig + IHDR(25) + IDAT(>=13) + IEND(12)
      .select($"id".as("doc_id"), $"format", $"width", $"height")
      .sortWithinPartitions($"doc_id")
  }

  /** REAL resize pipeline, ORACLED on the re-decoded dimensions: synth
    * PNGs at mixed resolutions → bilinear resize to a fixed 32x32 (the
    * multimodal training-prep normalization) → full re-decode. Every
    * row must report the TARGET dimensions from the actual resized
    * raster — the oracle is the constant-dims table over every doc_id,
    * so hash-green proves the resize ran on every document and the
    * result re-decoded (a skipped resize reports source dims, a broken
    * blob throws). Resized pixel bytes are resampler-implementation-
    * specific → the raster fingerprint stays out of the oracle (its
    * invariants — distinct sources stay distinct, every raster
    * normalized — are MultiModalSpec's). */
  val multimodalResize: CatalogEntry = CatalogEntry(
    "multimodal_resize",
    """SELECT doc_id, 32::INT AS width, 32::INT AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 48 + 16).as("w"), (($"doc_id" * 7) % 48 + 16).as("h")),
      s, "doc_id")
    val blobs = MultiModal.encodeImagePartitions(meta, "doc_id", "w", "h")
    val resized = MultiModal.resizeImagePartitions(blobs, "id", "blob",
      width = 32, height = 32)
    MultiModal.decodeImagePartitions(resized, "id", "blob")
      .toDF()
      .where($"fingerprint".isNotNull) // force the raster read
      .select($"id".as("doc_id"), $"width", $"height")
      .sortWithinPartitions($"doc_id")
  }

  /** REAL audio codec round-trip, FULLY ORACLED: per-document synthetic
    * specs (rate/channels/frames derived from doc_id) → actual
    * RIFF/WAVE containers (javax.sound.sampled encode, one codec per
    * partition) → actual WAV parse. Every reported column comes from the
    * PARSED container — rate/channels from the format chunk, frame count
    * from the data chunk length, byte count from the real file — while
    * the DuckDB oracle computes what a correct codec MUST report by pure
    * arithmetic on doc_id (canonical PCM WAV = 44-byte header +
    * frames x channels x 2 data bytes; duration = floor-division ms). A
    * hash-green run therefore proves real WAV bytes moved through the
    * binary column and parsed back losslessly — unlike the PNG entry,
    * where codec output bytes are JVM-specific, WAV's container layout
    * is fixed by the RIFF spec, so the metadata is cross-engine
    * checkable. PCM payload fingerprint is additionally asserted in
    * MultiModalSpec (not SQL-expressible). */
  val multimodalWavRoundtrip: CatalogEntry = CatalogEntry(
    "multimodal_wav_roundtrip",
    """SELECT doc_id,
      |  'audio/wave' AS format,
      |  ((doc_id % 3) * 11025 + 11025)::INT AS sample_rate_hz,
      |  (doc_id % 2 + 1)::INT AS channels,
      |  (doc_id % 500 + 100)::BIGINT AS n_frames,
      |  ((doc_id % 500 + 100) * 1000
      |     // ((doc_id % 3) * 11025 + 11025))::BIGINT AS duration_ms,
      |  (44 + (doc_id % 500 + 100) * (doc_id % 2 + 1) * 2)::INT AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        (($"doc_id" % 3) * 11025 + 11025).as("rate"),
        ($"doc_id" % 2 + 1).as("channels"),
        ($"doc_id" % 500 + 100).as("frames")),
      s, "doc_id")
    val blobs = MultiModal.encodeAudioPartitions(
      meta, "doc_id", "rate", "channels", "frames")
    MultiModal.decodeAudioPartitions(blobs, "id", "blob")
      .toDF()
      .select($"id".as("doc_id"), $"format",
        $"sampleRateHz".as("sample_rate_hz"), $"channels",
        $"nFrames".as("n_frames"), $"durationMs".as("duration_ms"),
        $"nBytes".as("n_bytes"))
      .sortWithinPartitions($"doc_id")
  }

  /** REAL multi-frame container round-trip with SELECTIVE frame
    * sampling, oracled: per-document specs (dims/frame-count derived
    * from doc_id) → actual GIF89a animation streams (javax.imageio
    * sequence writer) → parse + decode ONLY 4 evenly-spaced frames.
    * Frame count comes from the parsed container's image sequence and
    * `sample_idx_sum` is the sum of the frame indices the sampler
    * actually decoded — the DuckDB oracle recomputes both by pure
    * arithmetic on doc_id (floor-division index formula), so a
    * hash-green run proves real multi-frame containers moved through
    * the binary column AND the sampler picked exactly the evenly-spaced
    * frames. Container byte size is palette-encoding-specific (unlike
    * WAV's fixed layout) so n_bytes stays out of the oracle; raster
    * fingerprints are asserted in MultiModalSpec. */
  val multimodalGifFrames: CatalogEntry = CatalogEntry(
    "multimodal_gif_frames",
    """SELECT doc_id,
      |  'image/gif' AS format,
      |  (doc_id % 24 + 8)::INT AS width,
      |  ((doc_id * 5) % 24 + 8)::INT AS height,
      |  (doc_id % 6 + 4)::INT AS n_frames,
      |  4::INT AS n_sampled,
      |  (((doc_id % 6 + 3) // 3)
      |     + ((2 * (doc_id % 6 + 3)) // 3)
      |     + (doc_id % 6 + 3))::BIGINT AS sample_idx_sum
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 24 + 8).as("w"),
        (($"doc_id" * 5) % 24 + 8).as("h"),
        ($"doc_id" % 6 + 4).as("nf")),
      s, "doc_id")
    val blobs = MultiModal.encodeGifPartitions(meta, "doc_id", "w", "h", "nf")
    MultiModal.sampleGifFramesPartitions(blobs, "id", "blob", nSample = 4)
      .toDF()
      .select($"id".as("doc_id"), $"format", $"width", $"height",
        $"nFrames".as("n_frames"), $"nSampled".as("n_sampled"),
        $"sampleIdxSum".as("sample_idx_sum"))
      .sortWithinPartitions($"doc_id")
  }

  /** Image near-dup detection via perceptual hash, FULLY ORACLED on
    * the hash values themselves: per-doc textured PNGs (96 texture
    * classes — `doc_id % 96` picks the weave phase and dimensions, so
    * planted duplicate classes exist) → REAL PNG encode → REAL decode +
    * dHash (integer luma, 9×8 average-pool, horizontal gradient bits,
    * [[MultiModal.PngCodec.dhash]]) → group-by-hash dup clusters. The
    * DuckDB oracle recomputes every hash by PURE ARITHMETIC on the
    * pixel formula — hash-green therefore proves the encode → PNG
    * bytes → decode → pool → bits chain is pixel-exact end to end,
    * not merely that duplicates collide. The encode id is
    * `doc_id·256 + class` so the codec's blue/texture seed (id mod
    * 256) is the class while doc_id stays recoverable (`id div 256`).
    * Scale shape: codec work is partition-local on the range-spread
    * metadata; only (id, 16-char hash) ever shuffles — the blobs stay
    * where they were decoded, which is the entire point of
    * fingerprint-then-join dedup at 100 TB. */
  val multimodalPhashDedup: CatalogEntry = CatalogEntry(
    "multimodal_phash_dedup",
    """WITH vv AS (SELECT DISTINCT doc_id % 96 AS v FROM documents),
      |dims AS (
      |  SELECT v, (v % 3) * 16 + 16 AS w, ((v // 3) % 3) * 16 + 16 AS h
      |  FROM vv),
      |px AS (
      |  SELECT v, w, h, gx.x::BIGINT AS x, gy.y::BIGINT AS y
      |  FROM dims, unnest(generate_series(0, w - 1)) AS gx(x),
      |       unnest(generate_series(0, h - 1)) AS gy(y)),
      |gray AS (
      |  SELECT v, (x * 9) // w AS cx, (y * 8) // h AS cy,
      |    (x * 31 + y * 17 + v * 97) % 256 AS g
      |  FROM px),
      |cells AS (
      |  SELECT v, cy, cx, (sum(g)::BIGINT // count(*)::BIGINT) AS m
      |  FROM gray GROUP BY v, cy, cx),
      |bits AS (
      |  SELECT l.v, l.cy,
      |    sum(CASE WHEN l.m > r.m THEN (1 << l.cx) ELSE 0 END)::INT AS b
      |  FROM cells l JOIN cells r
      |    ON l.v = r.v AND l.cy = r.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8 GROUP BY l.v, l.cy),
      |hash AS (
      |  SELECT v, string_agg(printf('%02x', b), '' ORDER BY cy) AS dhash
      |  FROM bits GROUP BY v)
      |SELECT h.dhash, count(*)::BIGINT AS n_imgs,
      |  min(d.doc_id) AS min_doc, max(d.doc_id) AS max_doc
      |FROM documents d JOIN hash h ON d.doc_id % 96 = h.v
      |GROUP BY h.dhash ORDER BY h.dhash""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select(($"doc_id" * 256 + $"doc_id" % 96).as("img_id"),
        expr("(doc_id % 96) % 3 * 16 + 16").as("w"),
        expr("((doc_id % 96) div 3) % 3 * 16 + 16").as("h")),
      s, "img_id")
    val blobs = MultiModal.encodeTexturedImagePartitions(
      meta, "img_id", "w", "h")
    MultiModal.dhashImagePartitions(blobs, "id", "blob")
      .select(expr("id div 256").as("doc_id"), $"dhash")
      .groupBy($"dhash")
      .agg(count(lit(1)).as("n_imgs"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .orderBy($"dhash")
  }

  /** CROSS-MODAL PAIRED DEDUP — the multimodal-pair censuses a VLM
    * training-data pipeline runs over (image, caption) rows:
    * "same image, different caption" (one visual duplicated under many
    * texts — caption diversity per visual, and the dedup decision of
    * whether to keep one pair per image or all caption variants) and
    * "same caption, different image" (one text reused across visuals —
    * boilerplate/alt-text templates, the side text-only dedup cannot
    * see pairs through). Composition of two green fingerprint
    * pipelines: the REAL PNG encode→decode→dHash chain of
    * [[multimodalPhashDedup]] on the image side (doc_id % 96 texture
    * classes, so planted same-image groups exist) and `dedup_exact`'s
    * text digest on the caption side, joined on doc_id — each group
    * key reports its doc count, distinct-partner-variant count, and
    * id range; only groups with ≥ 2 partner variants survive.
    *
    * FULLY ORACLED: DuckDB recomputes every dHash by pure pixel
    * arithmetic (the phash oracle's CTEs) and every caption digest as
    * md5(text), then replays both censuses — hash-green proves the
    * real codec chain AND the pairing algebra.
    *
    * Scale shape: fingerprint-then-join — blobs never shuffle; only
    * (doc_id, 16-char dhash, 32-char md5) rides the doc_id equi-join,
    * and each census is one partial-aggregated group-by on its
    * fingerprint. At 100 TB both sides are the already-materialized
    * fingerprint tables of the per-modality dedup passes, so the pair
    * census costs one join over narrow columns. */
  val multimodalPairDedup: CatalogEntry = CatalogEntry(
    "multimodal_pair_dedup",
    """WITH vv AS (SELECT DISTINCT doc_id % 96 AS v FROM documents),
      |dims AS (
      |  SELECT v, (v % 3) * 16 + 16 AS w, ((v // 3) % 3) * 16 + 16 AS h
      |  FROM vv),
      |px AS (
      |  SELECT v, w, h, gx.x::BIGINT AS x, gy.y::BIGINT AS y
      |  FROM dims, unnest(generate_series(0, w - 1)) AS gx(x),
      |       unnest(generate_series(0, h - 1)) AS gy(y)),
      |gray AS (
      |  SELECT v, (x * 9) // w AS cx, (y * 8) // h AS cy,
      |    (x * 31 + y * 17 + v * 97) % 256 AS g
      |  FROM px),
      |cells AS (
      |  SELECT v, cy, cx, (sum(g)::BIGINT // count(*)::BIGINT) AS m
      |  FROM gray GROUP BY v, cy, cx),
      |bits AS (
      |  SELECT l.v, l.cy,
      |    sum(CASE WHEN l.m > r.m THEN (1 << l.cx) ELSE 0 END)::INT AS b
      |  FROM cells l JOIN cells r
      |    ON l.v = r.v AND l.cy = r.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8 GROUP BY l.v, l.cy),
      |hash AS (
      |  SELECT v, string_agg(printf('%02x', b), '' ORDER BY cy) AS dhash
      |  FROM bits GROUP BY v),
      |pair AS (
      |  SELECT d.doc_id, h.dhash, md5(d.text) AS text_md5
      |  FROM documents d JOIN hash h ON d.doc_id % 96 = h.v
      |  WHERE d.text IS NOT NULL),
      |img AS (
      |  SELECT dhash AS grp_key, count(*)::BIGINT AS n_docs,
      |    count(DISTINCT text_md5)::BIGINT AS n_variants,
      |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |  FROM pair GROUP BY dhash),
      |txt AS (
      |  SELECT text_md5 AS grp_key, count(*)::BIGINT AS n_docs,
      |    count(DISTINCT dhash)::BIGINT AS n_variants,
      |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |  FROM pair GROUP BY text_md5)
      |SELECT 'same_image_diff_text' AS kind, grp_key, n_docs,
      |  n_variants, min_doc, max_doc FROM img WHERE n_variants >= 2
      |UNION ALL
      |SELECT 'same_text_diff_image' AS kind, grp_key, n_docs,
      |  n_variants, min_doc, max_doc FROM txt WHERE n_variants >= 2
      |ORDER BY kind, grp_key""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select(($"doc_id" * 256 + $"doc_id" % 96).as("img_id"),
        expr("(doc_id % 96) % 3 * 16 + 16").as("w"),
        expr("((doc_id % 96) div 3) % 3 * 16 + 16").as("h")),
      s, "img_id")
    val blobs = MultiModal.encodeTexturedImagePartitions(
      meta, "img_id", "w", "h")
    val dh = MultiModal.dhashImagePartitions(blobs, "id", "blob")
      .select(expr("id div 256").as("doc_id"), $"dhash")
    val txtd = Tables.documents(s, d).where($"text".isNotNull)
      .select($"doc_id", md5($"text").as("text_md5"))
    val pair = dh.join(txtd, "doc_id")
    def census(key: org.apache.spark.sql.Column,
        partner: org.apache.spark.sql.Column, kind: String) = pair
      .groupBy(key.as("grp_key"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(partner).as("n_variants"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .where($"n_variants" >= 2)
      .select(lit(kind).as("kind"), $"grp_key", $"n_docs", $"n_variants",
        $"min_doc", $"max_doc")
    census($"dhash", $"text_md5", "same_image_diff_text")
      .unionAll(census($"text_md5", $"dhash", "same_text_diff_image"))
      .orderBy($"kind", $"grp_key")
  }

  /** Windowed PCM energy features from REAL decoded audio, FULLY
    * ORACLED on the feature values: per-doc synthetic specs → actual
    * RIFF/WAVE containers → WAV parse → per-256-frame-window exact
    * Σs² energy, peak |s|, and sample count straight off the decoded
    * 16-bit PCM ([[MultiModal.WavCodec.energyWindows]]) — the sums
    * silence detection / VAD pre-filtering / loudness normalization
    * start from. The DuckDB oracle recomputes every window by pure
    * integer arithmetic on the PCM synthesis formula, so hash-green
    * proves the encode → WAV bytes → parse → window → sum chain is
    * sample-exact (the audio analogue of `multimodal_phash_dedup`'s
    * pixel-exact proof). Scale shape: codec + windowing are
    * partition-local; only (id, window, 3 longs) feature rows shuffle,
    * never PCM. */
  val multimodalAudioEnergy: CatalogEntry = CatalogEntry(
    "multimodal_audio_energy",
    """WITH spec AS (
      |  SELECT doc_id, doc_id % 2 + 1 AS ch, doc_id % 500 + 100 AS nf,
      |    doc_id % 97 + 3 AS k
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, ch, k, g.i::BIGINT AS i
      |  FROM spec, unnest(generate_series(0, nf - 1)) AS g(i)),
      |sm AS (
      |  SELECT doc_id, i // 256 AS win,
      |    (i * k + cc.c * 7919) % 65536 - 32768 AS s
      |  FROM fr, unnest(generate_series(0, ch - 1)) AS cc(c))
      |SELECT doc_id, win, count(*)::BIGINT AS n_samples,
      |  sum(s * s)::BIGINT AS energy, max(abs(s))::BIGINT AS peak
      |FROM sm GROUP BY doc_id, win ORDER BY doc_id, win""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        (($"doc_id" % 3) * 11025 + 11025).as("rate"),
        ($"doc_id" % 2 + 1).as("channels"),
        ($"doc_id" % 500 + 100).as("frames")),
      s, "doc_id")
    val blobs = MultiModal.encodeAudioPartitions(
      meta, "doc_id", "rate", "channels", "frames")
    MultiModal.audioEnergyPartitions(blobs, "id", "blob", windowFrames = 256)
      .toDF()
      .select($"id".as("doc_id"), $"win", $"nSamples".as("n_samples"),
        $"energy", $"peak")
      .sortWithinPartitions($"doc_id", $"win")
  }

  /** Representative-frame perceptual hash over REAL multi-frame
    * containers — the video-near-dup shape at the fidelity the JDK can
    * host: per-doc GIF89a animations → parse the container for its
    * frame count → seek-decode ONLY the middle frame → dHash its
    * palette-resolved raster ([[MultiModal.GifCodec.middleFrameDhash]]
    * via the shared pooling kernel). FULLY ORACLED on frame count,
    * chosen index, and the hash itself: DuckDB replays index arithmetic
    * (floor-division middle), the frame's pixel formula, the palette's
    * odd-multiplier channel bijections, the integer luma, and the 9×8
    * pool — so hash-green proves the whole container → selective
    * decode → palette → hash chain is pixel-exact while decoding one
    * frame per clip. Scale shape: identical to the other codec
    * entries — containers stay partition-local; 16-char hashes
    * shuffle. */
  val multimodalGifPhash: CatalogEntry = CatalogEntry(
    "multimodal_gif_phash",
    """WITH spec AS (
      |  SELECT doc_id, doc_id % 16 + 16 AS w, (doc_id * 3) % 16 + 16 AS h,
      |    doc_id % 5 + 4 AS nf
      |  FROM documents),
      |m AS (SELECT doc_id, w, h, nf, (nf - 1) // 2 AS mid FROM spec),
      |px AS (
      |  SELECT doc_id, w, h, nf, mid, gx.x::BIGINT AS x, gy.y::BIGINT AS y
      |  FROM m, unnest(generate_series(0, w - 1)) AS gx(x),
      |       unnest(generate_series(0, h - 1)) AS gy(y)),
      |idx AS (
      |  SELECT doc_id, nf, mid, (x * 9) // w AS cx, (y * 8) // h AS cy,
      |    (x * 255 // w + y * 255 // h + (doc_id + mid * 31) % 256) % 256 AS t
      |  FROM px),
      |g AS (
      |  SELECT doc_id, nf, mid, cx, cy,
      |    (((t * 37) % 256) * 299 + ((t * 73) % 256) * 587
      |     + ((t * 151) % 256) * 114) // 1000 AS gv
      |  FROM idx),
      |cells AS (
      |  SELECT doc_id, nf, mid, cy, cx,
      |    (sum(gv)::BIGINT // count(*)::BIGINT) AS m
      |  FROM g GROUP BY doc_id, nf, mid, cy, cx),
      |bits AS (
      |  SELECT l.doc_id, any_value(l.nf) AS nf, any_value(l.mid) AS mid,
      |    l.cy,
      |    sum(CASE WHEN l.m > r.m THEN (1 << l.cx) ELSE 0 END)::INT AS b
      |  FROM cells l JOIN cells r
      |    ON l.doc_id = r.doc_id AND l.cy = r.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8 GROUP BY l.doc_id, l.cy)
      |SELECT doc_id, any_value(nf)::INT AS n_frames,
      |  any_value(mid)::INT AS mid_idx,
      |  string_agg(printf('%02x', b), '' ORDER BY cy) AS dhash
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = spreadByRange(Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 16 + 16).as("w"),
        (($"doc_id" * 3) % 16 + 16).as("h"),
        ($"doc_id" % 5 + 4).as("nf")),
      s, "doc_id")
    val blobs = MultiModal.encodeGifPartitions(meta, "doc_id", "w", "h", "nf")
    MultiModal.gifFrameDhashPartitions(blobs, "id", "blob")
      .toDF()
      .select($"id".as("doc_id"), $"nFrames".as("n_frames"),
        $"midIdx".as("mid_idx"), $"dhash")
      .sortWithinPartitions($"doc_id")
  }

  def entries: Seq[CatalogEntry] = Seq(
    multimodalDecode, multimodalDecodePartitions, multimodalPngRoundtrip,
    multimodalResize, multimodalWavRoundtrip, multimodalGifFrames,
    multimodalPhashDedup, multimodalAudioEnergy, multimodalGifPhash,
    multimodalPairDedup)
}
