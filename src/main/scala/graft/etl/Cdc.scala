package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture by snapshot diff: given two versions of a keyed
  * table, emit the row-level changelog (insert / update / delete) that
  * transforms the old snapshot into the new one — how a warehouse
  * derives an incremental feed from systems that only publish full
  * snapshots (the reference's BigQuery MERGE consumes exactly such a
  * feed; this is its inverse).
  *
  * Semantics: a key present only in `next` is an `insert`; only in
  * `prev` a `delete`; in both with any compared column differing under
  * null-safe equality (`<=>`) an `update`; rows equal on every compared
  * column are DROPPED (an unchanged row is not a change — emitting it
  * would turn every diff into a full-table feed). Null-valued columns
  * compare null-safely, so null → value and value → null are updates,
  * null → null is unchanged.
  *
  * Scale shape: one full outer join co-partitioned on the key — both
  * sides usually arrive pre-aggregated per key (latest-per-key), whose
  * exchanges the join reuses; the unchanged-row filter runs row-local
  * before anything downstream, so the changelog shuffles |changes|, not
  * |table|.
  *
  * PRECONDITION: `keys` must be unique on BOTH snapshots. A duplicated
  * key makes the full outer join emit a cross product of its rows —
  * changelog rows that correspond to no real change — with no error.
  * Snapshots that may carry duplicates must be collapsed first
  * (latest-per-key, `Load.mergeUpsert`'s dedup, or `max(struct)`).
  * `assertUniqueKeys` runs that check as a debug-mode guard.
  */
object Cdc {

  /** Debug-mode guard for [[diff]]'s key-uniqueness precondition:
    * throws if any key occurs more than once in `snapshot`. Costs one
    * aggregate over the snapshot — wire it into tests and backfills,
    * not the hot path. */
  def assertUniqueKeys(snapshot: DataFrame, keys: Seq[String],
      side: String = "snapshot"): Unit = {
    val dup = snapshot.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"Cdc.diff: $side has duplicate keys ${keys.mkString("(", ",", ")")}" +
        s" e.g. ${dup.headOption.getOrElse("")} — collapse to " +
        "latest-per-key before diffing")
  }

  /** @param keys        join identity — MUST be unique per side (see
    *                    object doc; [[assertUniqueKeys]] is the guard)
    * @param compareCols columns whose change makes an `update`; every
    *                    compared column is emitted as `old_<c>` / `new_<c>` */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // presence flags must come from non-null literals, not key nullness
    // (a legitimately-null key column would misclassify)
    val p = prev.withColumn("__in_p", lit(1)).as("p")
    val n = next.withColumn("__in_n", lit(1)).as("n")
    val joinCond = keys.map(k => col(s"p.$k") <=> col(s"n.$k")).reduce(_ && _)
    val joined = p.join(n, joinCond, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(s"p.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val op = when(col("__in_p").isNull, lit("insert"))
      .when(col("__in_n").isNull, lit("delete"))
      .when(changed, lit("update"))
    val keyCols = keys.map(k => coalesce(col(s"n.$k"), col(s"p.$k")).as(k))
    val valCols = compareCols.flatMap(c =>
      Seq(col(s"p.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    joined
      .withColumn("op", op)
      .where(col("op").isNotNull) // unchanged rows drop here, row-local
      .select((keyCols :+ col("op")) ++ valCols: _*)
  }
}
