package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.MultiModal

/** Multimodal-column plumbing entries (builder brief): binary payload
  * transport + decode/metadata/frame-sample shapes. The decode itself
  * is a clearly-marked deterministic stub (no codecs in this
  * environment — see MultiModal's STUB NOTICE); the schema, binary
  * columns, partition batching and slicing are real.
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

  def entries: Seq[CatalogEntry] = Seq(
    multimodalDecode, multimodalDecodePartitions)
}
