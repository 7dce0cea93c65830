package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Equivalence of the two "latest per key" formulations: window
  * row_number (whole-row path) vs max_by-style max(struct) (100 TB
  * path) — on randomized data with deliberate timestamp ties. */
class LatestPerKeySpec extends SparkTestBase {
  import spark.implicits._

  test("latestPerKey ≡ max(struct) aggregation on random tables with ties") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val rows = Seq.fill(200)((
        s"k${rnd.nextInt(20)}",
        rnd.nextInt(10).toLong, // coarse ts: many ties
        rnd.nextLong()))        // unique-ish tiebreak
      val df = rows.toDF("key", "ts", "uid")
      val viaWindow = Load.latestPerKey(df, Seq("key"), "ts", "uid")
        .select($"key", $"ts", $"uid").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val viaMaxBy = df.groupBy($"key")
        .agg(max(struct($"ts", $"uid")).as("m"))
        .select($"key", $"m.ts", $"m.uid").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaWindow == viaMaxBy, s"round $round diverged")
    }
  }

  test("latestPerKey emits exactly one row per key") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 3L))
      .toDF("key", "ts", "uid")
    val out = Load.latestPerKey(df, Seq("key"), "ts", "uid").collect()
    assert(out.length == 2)
  }
}
