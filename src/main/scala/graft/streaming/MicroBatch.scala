package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.etl.Load

/** Structured-Streaming parity for the reference pipeline (SURVEY.md
  * §2.9): each DAG run is a micro-batch that appends to
  * `historical_rates` and MERGE-upserts `current_rates`
  * (load_to_bigquery.py:77-111, re-triggered per Streamlit refresh,
  * app.py:23-25,120-144). `foreachBatch` reuses the *batch* Load
  * functions verbatim — identical semantics, including the strict
  * late-data guard.
  */
object MicroBatch {

  /** Upsert one batch into the parquet snapshot at `currentPath`:
    * read-modify-write with an atomic directory swap (the read plan is
    * fully materialized into the tmp dir before the old snapshot is
    * touched, so a crash never leaves a half-written current table). */
  def upsertParquet(spark: SparkSession, batch: DataFrame, currentPath: String,
      keys: Seq[String], tsCol: String, tieCol: String): Unit = {
    val fs = new Path(currentPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next =
      if (fs.exists(new Path(currentPath)))
        Load.upsertLatest(spark.read.parquet(currentPath)
          .select(batch.columns.map(org.apache.spark.sql.functions.col): _*),
          batch, keys, tsCol, tieCol)
      else
        Load.latestPerKey(batch, keys, tsCol, tieCol)
    val tmp = new Path(currentPath + "__staging")
    next.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(new Path(currentPath), true)
    fs.rename(tmp, new Path(currentPath))
  }

  /** Wire a stream to the two sinks with reference semantics. The
    * caller starts the returned writer (`.start()`), typically with a
    * checkpoint location for exactly-once batch tracking. */
  def writer(stream: DataFrame, historicalPath: String, currentPath: String,
      keys: Seq[String], tsCol: String, tieCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist() // two sinks read the same micro-batch once
      Load.appendHistorical(batch, historicalPath)
      upsertParquet(batch.sparkSession, batch, currentPath, keys, tsCol, tieCol)
      batch.unpersist()
      ()
    }

  def run(stream: DataFrame, historicalPath: String, currentPath: String,
      checkpoint: String, keys: Seq[String], tsCol: String,
      tieCol: String): StreamingQuery =
    writer(stream, historicalPath, currentPath, keys, tsCol, tieCol)
      .option("checkpointLocation", checkpoint)
      .start()
}
