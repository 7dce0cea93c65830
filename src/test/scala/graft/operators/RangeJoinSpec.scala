package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(p: Seq[(Long, Long)], i: Seq[(Long, Long, Long)]) =
    (for {
      (pid, x) <- p
      (iid, s, e) <- i
      if x >= s && x <= e
    } yield (pid, iid)).toSet

  private def binned(p: Seq[(Long, Long)], i: Seq[(Long, Long, Long)],
      bw: Long) =
    RangeJoin.pointInInterval(
      p.toDF("pid", "x"), i.toDF("iid", "s", "e"), "x", "s", "e", bw)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("matches the naive cross-product on random data, every bin width") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(200)(j => (j.toLong, rnd.nextLong() % 1000L))
    val intervals = Seq.tabulate(50) { j =>
      val s = rnd.nextLong() % 1000L
      (j.toLong, s, s + rnd.nextInt(120))
    }
    val expect = naive(points, intervals)
    for (bw <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = binned(points, intervals, bw)
      assert(got.length == got.toSet.size, s"dup matches at bw=$bw")
      assert(got.toSet == expect, s"wrong matches at bw=$bw")
    }
  }

  test("inclusive bounds on both ends; empty and inverted intervals") {
    val got = binned(
      Seq((1L, 10L), (2L, 20L), (3L, 15L)),
      Seq((100L, 10L, 20L), (200L, 15L, 15L), (300L, 30L, 25L)), 8L)
    assert(got.toSet == Set((1L, 100L), (2L, 100L), (3L, 100L), (3L, 200L)))
  }

  test("null points and null bounds never match") {
    val p = Seq((1L, Some(10L)), (2L, None: Option[Long])).toDF("pid", "x")
    val i = Seq((100L, Some(0L), Some(50L)), (200L, None: Option[Long], Some(50L)))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, i, "x", "s", "e", 16L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 100L)))
  }

  test("plans an equi-join (no nested loop / cartesian), unlike the naive form") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Seq.tabulate(100)(j => (j.toLong, j.toLong * 3)).toDF("pid", "x")
      val i = Seq.tabulate(100)(j => (j.toLong, j.toLong * 2, j.toLong * 2 + 50))
        .toDF("iid", "s", "e")
      val fast = RangeJoin.pointInInterval(p, i, "x", "s", "e", 50L)
      val fastPlan = fast.queryExecution.executedPlan.toString
      assert(!fastPlan.contains("BroadcastNestedLoopJoin") &&
        !fastPlan.contains("CartesianProduct"), fastPlan)
      assert(fastPlan.contains("SortMergeJoin") ||
        fastPlan.contains("ShuffledHashJoin"), fastPlan)

      val naivePlan = p.join(i, $"x" >= $"s" && $"x" <= $"e")
        .queryExecution.executedPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
        naivePlan.contains("CartesianProduct"), naivePlan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("exact binning at epoch-microsecond magnitude (double math would mis-bin)") {
    // points sit 1 unit either side of a bin boundary near 2^60, where a
    // double's ulp is 256 — float-division binning would collapse them
    val bw = 600000000L // 10-min bins in micros
    val boundary = (1700000000000000000L / bw) * bw
    val points = Seq((1L, boundary - 1), (2L, boundary), (3L, boundary + 1))
    val intervals = Seq(
      (100L, boundary - bw, boundary - 1),     // ends just before boundary
      (200L, boundary, boundary + bw - 1))     // starts exactly at boundary
    val got = binned(points, intervals, bw).toSet
    assert(got == Set((1L, 100L), (2L, 200L), (3L, 200L)),
      s"boundary points mis-binned: $got")
  }

  test("rejects ambiguous column names and non-positive bin widths") {
    val df = Seq((1L, 2L)).toDF("a", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, df, "x", "a", "x", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, Seq((1L, 2L)).toDF("s", "e"),
        "x", "s", "e", 0L)
    }
  }
}
