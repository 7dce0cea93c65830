package graft.etl

import graft.SparkTestBase

/** Snapshot-diff changelog: op classification, null-safe value
  * compares, unchanged-row suppression, multi-column updates. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def run(prev: Seq[(Long, Option[Double], String)],
      next: Seq[(Long, Option[Double], String)]) =
    Cdc.diff(prev.toDF("k", "v", "w"), next.toDF("k", "v", "w"),
      Seq("k"), Seq("v", "w"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("insert / update / delete classify; unchanged rows are dropped") {
    val ops = run(
      prev = Seq((1L, Some(1.0), "a"), (2L, Some(2.0), "b"),
        (3L, Some(3.0), "c")),
      next = Seq((1L, Some(1.0), "a"), // unchanged → absent
        (2L, Some(9.0), "b"),          // update (first col)
        (4L, Some(4.0), "d")))         // insert; 3 deleted
    assert(ops == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("null-safe compares: null→value and value→null are updates, " +
      "null→null is unchanged; second compare column counts too") {
    val ops = run(
      prev = Seq((1L, None, "a"), (2L, Some(2.0), "b"), (3L, None, "c"),
        (4L, Some(4.0), "d")),
      next = Seq((1L, Some(1.0), "a"), // null → value: update
        (2L, None, "b"),               // value → null: update
        (3L, None, "c"),               // null → null: unchanged
        (4L, Some(4.0), "D")))         // second column changed: update
    assert(ops == Map(1L -> "update", 2L -> "update", 4L -> "update"))
  }

  test("emitted old_/new_ columns carry both sides of an update") {
    val row = Cdc.diff(
      Seq((1L, 1.0)).toDF("k", "v"), Seq((1L, 2.0)).toDF("k", "v"),
      Seq("k"), Seq("v")).collect().head
    assert(row.getString(1) == "update" &&
      row.getDouble(2) == 1.0 && row.getDouble(3) == 2.0)
  }

  test("validation: empty keys or compare columns refuse") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] { Cdc.diff(df, df, Nil, Seq("v")) }
    intercept[IllegalArgumentException] { Cdc.diff(df, df, Seq("k"), Nil) }
  }

  test("assertUniqueKeys: the debug guard for the key-uniqueness " +
      "precondition passes unique snapshots and names the violating side") {
    val unique = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    Cdc.assertUniqueKeys(unique, Seq("k")) // no throw
    val duped = Seq((1L, 1.0), (1L, 9.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Cdc.assertUniqueKeys(duped, Seq("k"), side = "prev")
    }
    assert(e.getMessage.contains("prev") && e.getMessage.contains("duplicate"))
  }
}
