package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection on two integer criteria —
  * "keep the rows no other row beats on both axes": row r survives iff
  * no row has score ≥ r.score AND value ≥ r.value with > in at least
  * one. Multi-signal data selection (quality × length, score × recency)
  * uses exactly this in place of per-signal threshold juggling.
  *
  * The naive test is an O(n²) self-join — a non-starter at corpus
  * scale. This formulation is a TWO-LEVEL PREFIX SCAN, all shuffles
  * bounded by |distinct scores| or smaller:
  *
  *   1. collapse to one row per distinct score with `maxv` = the
  *      largest value at that score (map-side partial agg; a row
  *      survives only if it carries its score's `maxv`, because a
  *      same-score-higher-value row dominates it);
  *   2. within `bucketWidth`-wide score buckets, a bounded-partition
  *      window takes the running max of `maxv` over strictly greater
  *      scores (the per-score collapse is what makes "preceding row"
  *      mean "strictly greater score");
  *   3. across buckets — a table whose size is value-range /
  *      bucketWidth, tiny by construction — one single-partition
  *      window computes cumulative maxes, which then BROADCAST back.
  *
  * A score is on the frontier iff its `maxv` beats every
  * strictly-greater score's best value (`maxv > max(m_in, m_cross)`).
  * `div`'s truncation toward zero (vs floor) is fine for the
  * bucketing: truncation is still monotone in the score, which is all
  * the bucket ORDER needs — bucket boundaries land differently around
  * zero but no comparison crosses buckets incorrectly.
  */
object Skyline {

  /** Filter `df` to its Pareto frontier on (`scoreCol`, `valueCol`)
    * (both integral). Returns the surviving rows with their original
    * columns. */
  def frontier(df: DataFrame, scoreCol: String, valueCol: String,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val score = col(scoreCol)
    val perScore = df.groupBy(score.as("s"))
      .agg(max(col(valueCol)).as("maxv"))
      .withColumn("bucket", expr(s"s div $bucketWidth"))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val acrossBuckets = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPrefix = perScore.groupBy(col("bucket"))
      .agg(max(col("maxv")).as("bmax"))
      .withColumn("m_cross", max(col("bmax")).over(acrossBuckets))
      .select(col("bucket"), col("m_cross"))
    val frontierScores = perScore
      .withColumn("m_in", max(col("maxv")).over(inBucket))
      .join(broadcast(bucketPrefix), "bucket")
      .withColumn("m_strict",
        greatest(coalesce(col("m_in"), lit(Long.MinValue)),
          coalesce(col("m_cross"), lit(Long.MinValue))))
      .filter(col("maxv") > col("m_strict"))
      .select(col("s"), col("maxv"))
    df.join(frontierScores,
      score === col("s") && col(valueCol) === col("maxv"))
      .drop("s", "maxv")
  }
}
