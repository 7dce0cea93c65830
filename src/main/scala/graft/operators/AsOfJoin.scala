package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Left as-of join: for every probe row, attach the build side's latest
  * payload at-or-before the probe's timestamp within the same key — the
  * time-series join Spark has no built-in operator for.
  *
  * Formulation: tag both sides, union, one window per key ordered by
  * (ts, side, tie) with `last(payload_struct, ignoreNulls)` over an
  * unbounded-preceding frame, then keep probe rows. Compared to the
  * naive range-join (probe ⋈ build on key + inequality → per-key
  * cross-product then argmax), this is ONE shuffle on the key and
  * linear work per partition — the formulation that survives 100 TB
  * and a hot key (AQE skew-split applies to the single exchange).
  *
  * Semantics: inclusive (build row at exactly the probe ts matches —
  * build sorts before probe at equal ts); build-side ts ties resolve
  * toward the larger `buildTie` value; probes with no prior build row
  * get nulls (left join). All payload columns come from the SAME build
  * row: they travel as one nullable struct, so a legitimately-null
  * payload value in the matched row is returned as null (never patched
  * from an older row), matching DuckDB/pandas ASOF. Null join keys
  * never match (equi-join semantics): null-key build rows are dropped,
  * null-key probe rows pass through with null payloads.
  */
object AsOfJoin {

  /** @param payload build columns to carry (emitted as `asof_<name>`)
    * @param buildTie unique build column ordering equal-ts build rows */
  def leftAsOf(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String,
      payload: Seq[String], buildTie: String): DataFrame = {
    val probeCols = probe.columns.toSeq
    val payloadType = StructType(payload.map(c =>
      StructField(c, build.schema(c).dataType)))

    val probeSide = probe
      .withColumn("__k", col(probeKey))
      .withColumn("__ts", col(probeTs))
      .withColumn("__probe", lit(1))
      .withColumn("__tie", lit(Long.MaxValue)) // probe after ties at same ts
      .withColumn("__payload", lit(null).cast(payloadType))

    val buildSide = build
      // null keys can never equi-match; dropping them here also keeps
      // them from co-grouping with null-key probe rows in the window.
      // Null TIMESTAMPS can never satisfy the as-of inequality either
      // (SQL: ts >= NULL is unknown) — but without this filter a
      // null-ts build row sorts nulls-first in the window and its
      // non-null payload struct is inherited by EVERY probe in the
      // key as a phantom "earliest" match, where DuckDB ASOF and
      // pandas merge_asof return no match.
      .filter(col(buildKey).isNotNull && col(buildTs).isNotNull)
      .withColumn("__k", col(buildKey))
      .withColumn("__ts", col(buildTs))
      .withColumn("__probe", lit(0))
      .withColumn("__tie", col(buildTie).cast("long"))
      .withColumn("__payload", struct(payload.map(col): _*))
      .withColumns(probeCols.filterNot(build.columns.contains).map { c =>
        c -> lit(null).cast(probe.schema(c).dataType) }.toMap)
      .select(probeSide.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__probe").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probeSide.unionByName(buildSide)
      // ignoreNulls skips probe rows' null struct, never a build row:
      // a build row's struct is non-null even when its fields are null,
      // so the whole payload is taken from one (the latest) build row.
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__probe") === 1)
      .select((probeCols.map(col) ++
        payload.map(c => col("__payload").getField(c).as(s"asof_$c"))): _*)
  }

  /** As-of join with a staleness tolerance: like [[leftAsOf]], but a
    * match older than `toleranceUs` microseconds before the probe row
    * is REJECTED — all its payload columns come back null, exactly as
    * if no build row existed (pandas `merge_asof(tolerance=...)`).
    * Implemented as a row-local post-guard on the matched build
    * timestamp, so the plan is the [[leftAsOf]] plan: one shuffle,
    * zero extra exchanges. The build ts must ride along to be judged:
    * it is added to the payload internally and dropped on the way out
    * unless the caller asked for it. */
  def leftAsOfTolerance(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String,
      payload: Seq[String], buildTie: String,
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"negative tolerance: $toleranceUs")
    val wantTs = payload.contains(buildTs)
    val pay = if (wantTs) payload else payload :+ buildTs
    val joined = leftAsOf(probe, build, probeKey, buildKey,
      probeTs, buildTs, pay, buildTie)
    val fresh = unix_micros(col(probeTs)) -
      unix_micros(col(s"asof_$buildTs")) <= toleranceUs
    val guarded = payload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c"))) }
    if (wantTs) guarded else guarded.drop(s"asof_$buildTs")
  }

  /** Forward (look-ahead) as-of join: for every probe row, the build
    * side's EARLIEST payload at-or-after the probe's timestamp within
    * the same key — "next event ≥ t" (next maintenance window, next
    * price revision, next conversion). Same one-shuffle union+window
    * machinery as [[leftAsOf]], run on negated integer-microsecond
    * time, which flips at-or-before into at-or-after; equal-ts build
    * rows resolve toward the SMALLEST `buildTie` (the mirror of the
    * backward join's largest-tie rule). Timestamp payload columns come
    * back as the build row's original (un-negated) values because the
    * payload struct is captured from the build row's columns, not from
    * the negated sort key. */
  def leftAsOfForward(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String,
      payload: Seq[String], buildTie: String): DataFrame = {
    val negP = "__neg_ts_probe"
    val negB = "__neg_ts_build"
    val negTie = "__neg_tie"
    leftAsOf(
      probe.withColumn(negP, -unix_micros(col(probeTs))),
      build.withColumn(negB, -unix_micros(col(buildTs)))
        .withColumn(negTie, -col(buildTie).cast("long")),
      probeKey, buildKey, negP, negB, payload, negTie)
      .drop(negP)
  }

  /** NEAREST as-of join — pandas `merge_asof(direction='nearest')`:
    * for every probe row, the build row whose timestamp is CLOSEST in
    * either direction within the key. Composed from the two one-sided
    * passes ([[leftAsOf]] backward, [[leftAsOfForward]] forward) with
    * a row-local winner pick on exact integer-microsecond distances —
    * equal distance resolves BACKWARD (the at-or-before row), so the
    * inclusive-match rule of the one-sided joins is preserved: a
    * build row at exactly the probe ts is distance 0 both ways and
    * the backward side returns it.
    *
    * Plan shape: two key-partitioned union+window passes (one per
    * direction — the sort orders differ, so the exchange cannot be
    * shared) and a null-safe struct compare, never an inequality
    * join; both passes inherit the one-shuffle-per-direction scale
    * story of [[leftAsOf]]. The matched build ts must be judged, so
    * it rides the payload internally and is dropped on the way out
    * unless requested. */
  def leftAsOfNearest(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String,
      payload: Seq[String], buildTie: String): DataFrame = {
    val wantTs = payload.contains(buildTs)
    val pay = if (wantTs) payload else payload :+ buildTs
    val bwd = pay.foldLeft(
      leftAsOf(probe, build, probeKey, buildKey, probeTs, buildTs,
        pay, buildTie)) { (df, c) =>
      df.withColumnRenamed(s"asof_$c", s"__bwd_$c")
    }
    val both = leftAsOfForward(bwd, build, probeKey, buildKey,
      probeTs, buildTs, pay, buildTie)
    val dBwd = unix_micros(col(probeTs)) -
      unix_micros(col(s"__bwd_$buildTs"))
    val dFwd = unix_micros(col(s"asof_$buildTs")) -
      unix_micros(col(probeTs))
    // the decision is PINNED into a column before the per-payload
    // fold: the fold's first iteration overwrites `asof_<buildTs>`,
    // so re-evaluating the distance compare inside later iterations
    // would judge the winner against itself and hand the remaining
    // payload columns to the losing side
    val both2 = both.withColumn("__use_bwd",
      col(s"__bwd_$buildTs").isNotNull &&
        (col(s"asof_$buildTs").isNull || dBwd <= dFwd))
    val picked = pay.foldLeft(both2) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(col("__use_bwd"), col(s"__bwd_$c"))
          .otherwise(col(s"asof_$c")))
    }
    val cleaned = pay.foldLeft(picked.drop("__use_bwd"))(
      (df, c) => df.drop(s"__bwd_$c"))
    if (wantTs) cleaned else cleaned.drop(s"asof_$buildTs")
  }
}
