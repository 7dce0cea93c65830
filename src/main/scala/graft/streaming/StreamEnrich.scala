package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment join — the dimension-lookup face of
  * Structured Streaming: each micro-batch of the stream joins against
  * the CURRENT state of a static (batch) DataFrame. Spark re-binds the
  * static side per micro-batch, so a dim table refreshed in place is
  * picked up without restarting the query; stateless, so no watermark
  * or state store is involved.
  *
  * The static side is explicitly broadcast: at 100 TB of stream the
  * dim lookup must never shuffle the stream — broadcast hash join is
  * the only acceptable plan shape, exactly as in the batch
  * `join_broadcast_dim` entry. Left join: stream rows without a dim
  * match pass through with nulls (an enrichment must not drop facts).
  */
object StreamEnrich {

  def enrich(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")
}
