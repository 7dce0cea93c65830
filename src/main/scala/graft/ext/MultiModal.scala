package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads travel as opaque `binary` columns next to typed metadata;
  * decode / feature-extract / frame-sample run either as column
  * expressions (when expressible) or as partition-batched imperative
  * code (`mapPartitions` — the Scala analogue of `mapInPandas`: one
  * decoder instance per partition, rows streamed through in batches).
  *
  * ==STUB NOTICE==
  * Real image/audio codecs are not available in this environment, so
  * [[decodeMeta]] / [[StubDecoder.decode]] are **deterministic fakes**:
  * they derive plausible metadata (dimensions, fingerprint) from the
  * bytes instead of decoding them. The Spark-side contract — schema,
  * binary transport, partition batching, frame sampling shape — is real
  * and tested; swap the stub for an actual codec to productionize.
  */
object MultiModal {

  /** Typed decode output (the `Dataset[T]` path). */
  case class DecodedMedia(id: Long, nBytes: Int, format: String,
      width: Int, height: Int, fingerprint: Long)

  /** Stand-in media payload: the UTF-8 bytes of a text column. At 100 TB
    * the binary column comes straight from parquet/avro ingestion. */
  def textAsBlob(text: Column): Column = encode(text, "UTF-8")

  /** STUB column-expression decode: metadata derived from the blob
    * (length + salted xxhash64 pseudo-dimensions), not a real codec. */
  def decodeMeta(blob: Column): Column = struct(
    length(blob).as("n_bytes"),
    lit("stub/raw").as("format"),
    (pmod(xxhash64(blob, lit(1)), lit(1920)) + 1).cast("int").as("width"),
    (pmod(xxhash64(blob, lit(2)), lit(1080)) + 1).cast("int").as("height"),
    xxhash64(blob).as("fingerprint"))

  /** Frame sampling shape: n evenly-spaced fixed-width byte slices of
    * the payload (what a video frame sampler produces, minus the codec). */
  def frameSample(blob: Column, n: Int, frameBytes: Int): Column = {
    val stride = greatest((length(blob) - frameBytes) / math.max(n - 1, 1), lit(0))
    transform(sequence(lit(0), lit(n - 1)), i =>
      blob.substr((i * stride + 1).cast("int"), lit(frameBytes)))
  }

  /** The partition-batched imperative decode path (mapInPandas
    * analogue): one [[StubDecoder]] per partition, reused across that
    * partition's rows. */
  def decodePartitions(df: DataFrame, idCol: String,
      blobCol: String): Dataset[DecodedMedia] = {
    val ids = df.select(col(idCol).cast("long"), col(blobCol))
    ids.mapPartitions { it =>
      val decoder = new StubDecoder // per-partition init, like a codec ctx
      it.map { row => decoder.decode(row.getLong(0), row.getAs[Array[Byte]](1)) }
    }(Encoders.product[DecodedMedia])
  }

  /** STUB decoder: deterministic metadata from bytes; no real codec. */
  final class StubDecoder {
    def decode(id: Long, bytes: Array[Byte]): DecodedMedia = {
      var h = 1125899906842597L // deterministic FNV-ish roll
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      DecodedMedia(id, bytes.length, "stub/raw",
        (math.floorMod(h, 1920) + 1).toInt,
        (math.floorMod(h >> 16, 1080) + 1).toInt, h)
    }
  }
}
