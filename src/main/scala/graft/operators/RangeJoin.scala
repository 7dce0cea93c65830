package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: every probe row whose point value
  * falls inside a build row's `[start, end]` (inclusive) produces a
  * match — the interval/attribution join Spark has no equi-operator
  * for.
  *
  * Naively expressed (`p JOIN i ON p.x BETWEEN i.start AND i.end`) the
  * only plans Catalyst can pick are BroadcastNestedLoopJoin (small
  * build) or a cartesian product — O(|P|·|I|) comparisons, a
  * scale-killer when both sides are large. This operator restores an
  * equi-join shape by *bin expansion*: pick a fixed bin width, explode
  * each interval into the bins it overlaps, map each point to its one
  * bin, equi-join on the bin id, then apply the exact containment
  * predicate. A (point, interval) pair can meet only in the point's
  * single bin, so matches are emitted exactly once — no dedup pass.
  *
  * Cost: one shuffle of each side keyed by bin (sort-merge / shuffled
  * hash — AQE's skew split applies), build expansion factor
  * `≤ span/binWidth + 1` rows per interval, and per-bin work
  * proportional to genuine candidate density. With `binWidth` chosen
  * near the typical interval span, expansion stays ≤2× and candidate
  * pairs approach the true match count — the formulation that survives
  * a 1000-executor shuffle where the nested loop cannot. This is the
  * standard bucketized range-join strategy from the published
  * literature (e.g. interval joins in stream processors and the range
  * join optimization described for Spark-based warehouses).
  *
  * Contract: `pointCol` (probe) and `startCol`/`endCol` (build) are
  * integral (LongType-castable) — timestamps should be converted with
  * `unix_micros` first so bin arithmetic is exact integer math. Null
  * points / null or inverted bounds never match (the containment
  * predicate is null-rejecting, and `sequence` on null bounds is
  * avoided by pre-filtering). Column names of the two inputs must be
  * disjoint (the catalog entry aliases; same rule as Spark's own join
  * ambiguity contract).
  */
object RangeJoin {

  /** Inner point-in-interval join; emits probe ++ build columns.
    *
    * @param binWidth bin size in the same units as the point/bound
    *                 columns; pick ≈ the typical interval span so the
    *                 interval explode factor stays ≈2
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"ambiguous columns: ${overlap.mkString(",")}")

    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__px", col(pointCol).cast("long"))
      .withColumn("__pbin", floorDivBin("__px", binWidth))
      .drop("__px")
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__is", col(startCol).cast("long"))
      .withColumn("__ie", col(endCol).cast("long"))
      .withColumn("__ibin", explode(sequence(
        floorDivBin("__is", binWidth), floorDivBin("__ie", binWidth))))
      .drop("__is", "__ie")

    p.join(i, col("__pbin") === col("__ibin") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }

  /** Exact floor(x / bw) in 64-bit integer arithmetic. `floor(col / bw)`
    * would promote to double, whose 53-bit mantissa mis-bins boundary
    * values at epoch-microsecond magnitude (~2^60); instead subtract the
    * non-negative remainder and use integral `div` (the numerator is an
    * exact multiple, so truncation equals floor for either sign). */
  private def floorDivBin(longColName: String, bw: Long): Column =
    expr(s"($longColName - pmod($longColName, ${bw}L)) div ${bw}L")
}
