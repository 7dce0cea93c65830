package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming dead-letter routing — the streaming twin of the
  * `events_quarantine` catalog entry (and the production form of the
  * reference's silent `dropna`, transform.py:20): every micro-batch is
  * split by a prioritized rule chain into a CLEAN feed and a
  * QUARANTINE feed carrying the first-failing reason, and both feeds
  * land idempotently (per-batch `batch_id=<id>` partitions with a
  * `_SUCCESS` replay check, the [[MicroBatch.appendHistoricalBatch]]
  * discipline) so at-least-once redelivery cannot duplicate either
  * side.
  *
  * Scale shape: the rule chain is one scan-local `when` cascade — no
  * shuffle is introduced on either path; each sink write preserves the
  * source partitioning. The quarantine feed keeps FULL rows plus the
  * reason so it is replayable after a rule fix (re-ingest the
  * partition, not the world).
  */
object StreamRouter {

  /** Split one batch by `rules` (evaluated in order; first match names
    * the quarantine reason). Returns (clean, quarantined-with-reason).
    */
  def route(batch: DataFrame,
      rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "at least one routing rule required")
    val reason = rules.tail.foldLeft(
      when(rules.head._2, rules.head._1)) { case (acc, (name, cond)) =>
      acc.when(cond, name)
    }
    val tagged = batch.withColumn("reason", reason)
    (tagged.where($isClean(tagged)).drop("reason"),
      tagged.where(!$isClean(tagged)))
  }

  private def $isClean(tagged: DataFrame): Column =
    tagged.col("reason").isNull

  /** Idempotent per-batch partition write (see class doc);
    * package-visible so the replay-safety spec can drive it directly. */
  private[streaming] def appendBatch(df: DataFrame, path: String,
      batchId: Long): Unit = {
    val dir = new Path(path, s"batch_id=$batchId")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_SUCCESS")))
      df.write.mode("overwrite").parquet(dir.toString)
  }

  /** Wire a stream through the router to the two feeds. Start the
    * returned writer with a checkpoint location. */
  def writer(stream: DataFrame, cleanPath: String, quarantinePath: String,
      rules: Seq[(String, Column)]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.persist() // both feeds read the same micro-batch once
      val (clean, quarantined) = route(batch, rules)
      appendBatch(clean, cleanPath, batchId)
      appendBatch(quarantined, quarantinePath, batchId)
      batch.unpersist()
      ()
    }

  def run(stream: DataFrame, cleanPath: String, quarantinePath: String,
      checkpoint: String, rules: Seq[(String, Column)]): StreamingQuery =
    writer(stream, cleanPath, quarantinePath, rules)
      .option("checkpointLocation", checkpoint)
      .start()
}
