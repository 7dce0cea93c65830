package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every probe row, attach the build side's latest
  * payload at-or-before the probe's timestamp within the same key — the
  * time-series join Spark has no built-in operator for.
  *
  * Formulation: tag both sides, union, one window per key ordered by
  * (ts, side, tie) with `last(payload, ignoreNulls)` over an
  * unbounded-preceding frame, then keep probe rows. Compared to the
  * naive range-join (probe ⋈ build on key + inequality → per-key
  * cross-product then argmax), this is ONE shuffle on the key and
  * linear work per partition — the formulation that survives 100 TB
  * and a hot key (AQE skew-split applies to the single exchange).
  *
  * Semantics: inclusive (build row at exactly the probe ts matches —
  * build sorts before probe at equal ts); build-side ts ties resolve
  * toward the larger `buildTie` value; probes with no prior build row
  * get nulls (left join).
  */
object AsOfJoin {

  /** @param payload build columns to carry (emitted as `asof_<name>`)
    * @param buildTie unique build column ordering equal-ts build rows */
  def leftAsOf(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String,
      payload: Seq[String], buildTie: String): DataFrame = {
    val probeCols = probe.columns.toSeq
    val payloadTypes = payload.map(c =>
      c -> build.schema(c).dataType)

    val probeSide = probe
      .withColumn("__k", col(probeKey))
      .withColumn("__ts", col(probeTs))
      .withColumn("__probe", lit(1))
      .withColumn("__tie", lit(Long.MaxValue)) // probe after ties at same ts
      .withColumns(payloadTypes.map { case (c, t) =>
        s"asof_$c" -> lit(null).cast(t) }.toMap)

    val buildSide = build
      .withColumn("__k", col(buildKey))
      .withColumn("__ts", col(buildTs))
      .withColumn("__probe", lit(0))
      .withColumn("__tie", col(buildTie).cast("long"))
      .withColumns(payloadTypes.map { case (c, _) =>
        s"asof_$c" -> col(c) }.toMap)
      .withColumns(probeCols.filterNot(build.columns.contains).map { c =>
        c -> lit(null).cast(probe.schema(c).dataType) }.toMap)
      .select(probeSide.columns.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__probe").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probeSide.unionByName(buildSide)
      .withColumns(payload.map { c =>
        s"asof_$c" -> last(col(s"asof_$c"), ignoreNulls = true).over(w) }.toMap)
      .filter(col("__probe") === 1)
      .select((probeCols.map(col) ++ payload.map(c => col(s"asof_$c"))): _*)
  }
}
