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

  /** Column-expression path: blob → typed metadata struct + frame count. */
  val multimodalDecode: CatalogEntry = CatalogEntry.noOracle(
    "multimodal_decode") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
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
    * mapPartitions with a per-partition decoder instance. */
  val multimodalDecodePartitions: CatalogEntry = CatalogEntry.noOracle(
    "multimodal_decode_partitions") { (s, d) =>
    import s.implicits._
    MultiModal.decodePartitions(
      Tables.documents(s, d)
        .select($"doc_id", MultiModal.textAsBlob($"text").as("blob")),
      "doc_id", "blob")
      .toDF()
      .orderBy($"id")
  }

  /** REAL codec round-trip: per-document metadata → actual PNG bytes
    * (javax.imageio encode, one codec per partition) → actual PNG
    * decode — dimensions come from the decoded raster, not the input
    * metadata, so a green run proves real bytes moved through the
    * binary column. Codec byte output is JVM-specific → rows-only; the
    * dims-match invariant is asserted in MultiModalSpec. */
  val multimodalPngRoundtrip: CatalogEntry = CatalogEntry.noOracle(
    "multimodal_png_roundtrip") { (s, d) =>
    import s.implicits._
    val meta = Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 48 + 16).as("w"), (($"doc_id" * 7) % 48 + 16).as("h"))
    val blobs = MultiModal.encodeImagePartitions(meta, "doc_id", "w", "h")
    MultiModal.decodeImagePartitions(blobs, "id", "blob")
      .toDF()
      .select($"id".as("doc_id"), $"format", $"width", $"height", $"nBytes")
      .orderBy($"doc_id")
  }

  /** REAL resize pipeline: synth PNGs at mixed resolutions → bilinear
    * resize to a fixed 32x32 (the multimodal training-prep
    * normalization) → re-decode. Every decoded row must report the
    * TARGET dimensions from the actual resized raster — proving the
    * resize ran, not just the metadata changed. Codec bytes are
    * JVM-specific → rows-only; invariants in MultiModalSpec. */
  val multimodalResize: CatalogEntry = CatalogEntry.noOracle(
    "multimodal_resize") { (s, d) =>
    import s.implicits._
    val meta = Tables.documents(s, d)
      .select($"doc_id",
        ($"doc_id" % 48 + 16).as("w"), (($"doc_id" * 7) % 48 + 16).as("h"))
    val blobs = MultiModal.encodeImagePartitions(meta, "doc_id", "w", "h")
    val resized = MultiModal.resizeImagePartitions(blobs, "id", "blob",
      width = 32, height = 32)
    MultiModal.decodeImagePartitions(resized, "id", "blob")
      .toDF()
      .select($"id".as("doc_id"), $"width", $"height", $"nBytes",
        $"fingerprint")
      .orderBy($"doc_id")
  }

  def entries: Seq[CatalogEntry] = Seq(
    multimodalDecode, multimodalDecodePartitions, multimodalPngRoundtrip,
    multimodalResize)
}
