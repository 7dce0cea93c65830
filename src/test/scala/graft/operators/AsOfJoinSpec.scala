package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val build = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
    (1L, ts("2024-01-01 12:00:00"), 101L, 2.0),
    (2L, ts("2024-01-01 11:00:00"), 200L, 3.0))
    .toDF("user_id", "ts", "event_id", "value")

  private def run(probe: Seq[(Long, Long, Timestamp)]) =
    AsOfJoin.leftAsOf(
      probe.toDF("pid", "user_id", "ts"), build,
      "user_id", "user_id", "ts", "ts", Seq("event_id", "value"), "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("picks latest at-or-before per key; inclusive equality; null when none") {
    val out = run(Seq(
      (1L, 1L, ts("2024-01-01 11:00:00")), // between builds → 100
      (2L, 1L, ts("2024-01-01 12:00:00")), // exactly at build → inclusive 101
      (3L, 1L, ts("2024-01-01 09:00:00")), // before all → null
      (4L, 2L, ts("2024-01-02 00:00:00")), // key 2 → 200
      (5L, 3L, ts("2024-01-02 00:00:00")))) // unseen key → null
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None,
      4L -> Some(200L), 5L -> None))
  }

  test("build-side timestamp ties resolve toward the larger tie column") {
    val tied = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 9L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.leftAsOf(
      Seq((1L, 1L, ts("2024-01-01 10:30:00"))).toDF("pid", "user_id", "ts"),
      tied, "user_id", "user_id", "ts", "ts", Seq("event_id"), "event_id")
      .collect().head.getLong(3)
    assert(out == 9L)
  }

  test("a null payload value in the matched build row is returned as null, " +
      "not patched from an older row") {
    val b = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100L), Some(1.0)),
      (1L, ts("2024-01-01 12:00:00"), None: Option[Long], Some(2.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.leftAsOf(
      Seq((1L, 1L, ts("2024-01-01 13:00:00"))).toDF("pid", "user_id", "ts"),
      b, "user_id", "user_id", "ts", "ts", Seq("event_id", "value"), "value")
      .select($"asof_event_id", $"asof_value").collect().head
    assert(out.isNullAt(0), "latest build row's null must not fall back to 100")
    assert(out.getDouble(1) == 2.0)
  }

  test("multi-payload columns with mixed nulls all come from the same build row") {
    val b = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100L), None: Option[Double]),
      (1L, ts("2024-01-01 12:00:00"), None: Option[Long], Some(2.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.leftAsOf(
      Seq((1L, 1L, ts("2024-01-01 13:00:00"))).toDF("pid", "user_id", "ts"),
      b, "user_id", "user_id", "ts", "ts", Seq("event_id", "value"), "ts")
      .select($"asof_event_id", $"asof_value").collect().head
    // the incoherent per-column formulation would stitch (100, 2.0)
    assert(out.isNullAt(0) && out.getDouble(1) == 2.0,
      s"payload must be the latest row's (null, 2.0), got $out")
  }

  test("null join keys never match: null-key build rows are ignored, " +
      "null-key probe rows emit null payloads") {
    val b = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), 100L, 1.0),
      (None: Option[Long], ts("2024-01-01 10:00:00"), 999L, 9.9))
      .toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.leftAsOf(
      Seq((1L, None: Option[Long], ts("2024-01-01 11:00:00")),
        (2L, Some(1L), ts("2024-01-01 11:00:00")))
        .toDF("pid", "user_id", "ts"),
      b, "user_id", "user_id", "ts", "ts", Seq("event_id"), "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(100L)))
  }

  test("tolerance: stale matches reject to null, fresh ones survive, " +
      "and the matched ts column stays internal unless requested") {
    val out = AsOfJoin.leftAsOfTolerance(
      Seq((1L, 1L, ts("2024-01-01 10:30:00")),  // 30 min stale → keep
        (2L, 1L, ts("2024-01-01 11:30:00")),    // 90 min stale → null
        (3L, 1L, ts("2024-01-01 12:00:00")),    // exact hit, 0 stale → keep
        (4L, 3L, ts("2024-01-01 12:00:00")))    // no match at all → null
        .toDF("pid", "user_id", "ts"),
      build, "user_id", "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id", toleranceUs = 3600000000L)
    assert(out.columns.toSeq ==
      Seq("pid", "user_id", "ts", "asof_event_id", "asof_value"),
      s"internal asof_ts must be dropped, got ${out.columns.toSeq}")
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> Some(101L),
      4L -> None))
    // a stale match nulls EVERY payload column, not just the first
    val vals = out.collect().map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(vals == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("forward: picks earliest at-or-after; inclusive; equal-ts build " +
      "ties resolve toward the SMALLER tie; null when none ahead") {
    val out = AsOfJoin.leftAsOfForward(
      Seq((1L, 1L, ts("2024-01-01 11:00:00")),  // between → next is 101
        (2L, 1L, ts("2024-01-01 12:00:00")),    // exactly at build → 101
        (3L, 1L, ts("2024-01-01 13:00:00")),    // after all → null
        (4L, 2L, ts("2024-01-01 10:00:00")))    // key 2 → 200
        .toDF("pid", "user_id", "ts"),
      build, "user_id", "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(1L -> Some(101L), 2L -> Some(101L), 3L -> None,
      4L -> Some(200L)))

    val tied = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 9L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val tieOut = AsOfJoin.leftAsOfForward(
      Seq((1L, 1L, ts("2024-01-01 09:00:00"))).toDF("pid", "user_id", "ts"),
      tied, "user_id", "user_id", "ts", "ts", Seq("event_id"), "event_id")
      .collect().head.getLong(3)
    assert(tieOut == 7L, "forward ties resolve to the smallest tie value")
  }

  test("forward equivalence with the naive range-join + argmin on random data") {
    val rnd = new scala.util.Random(29)
    def t(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
    val b = Seq.fill(60)((rnd.nextInt(5).toLong, t(rnd.nextInt(100)),
      rnd.nextLong().abs, rnd.nextDouble()))
      .toDF("user_id", "ts", "event_id", "value")
    val p = Seq.tabulate(80)(i => (i.toLong, rnd.nextInt(6).toLong, t(rnd.nextInt(100))))
      .toDF("pid", "user_id", "ts")
    val fast = AsOfJoin.leftAsOfForward(p, b, "user_id", "user_id", "ts", "ts",
      Seq("event_id"), "event_id")
      .select($"pid", $"asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val naive = p.as("p").join(b.as("b"),
        col("p.user_id") === col("b.user_id") && col("p.ts") <= col("b.ts"), "left")
      .groupBy($"pid")
      .agg(min(struct(col("b.ts"), col("b.event_id"))).as("m"))
      .select($"pid", $"m.event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == naive)
  }

  test("nearest: closest build row either direction; equal distance " +
      "resolves backward; one-sided cases degrade to that side") {
    val b = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 12:00:00"), 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val p = Seq(
      (1L, 1L, ts("2024-01-01 10:30:00")), // 30m back vs 90m fwd -> 100
      (2L, 1L, ts("2024-01-01 11:40:00")), // 100m back vs 20m fwd -> 101
      (3L, 1L, ts("2024-01-01 11:00:00")), // exact tie -> backward 100
      (4L, 1L, ts("2024-01-01 09:00:00")), // before all -> forward 100
      (5L, 1L, ts("2024-01-01 13:00:00")), // after all -> backward 101
      (6L, 2L, ts("2024-01-01 13:00:00"))) // unseen key -> null
      .toDF("pid", "user_id", "ts")
    val out = AsOfJoin.leftAsOfNearest(p, b, "user_id", "user_id",
      "ts", "ts", Seq("event_id", "value"), "event_id")
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
                         else Some((r.getLong(3), r.getDouble(4))))
      }.toMap
    assert(out == Map(
      1L -> Some((100L, 1.0)), 2L -> Some((101L, 2.0)),
      3L -> Some((100L, 1.0)), 4L -> Some((100L, 1.0)),
      5L -> Some((101L, 2.0)), 6L -> None), s"got $out")
  }

  test("a null build timestamp never matches: dropped in all variants " +
      "instead of becoming a phantom earliest row") {
    // SQL semantics: ts >= NULL is unknown — DuckDB ASOF / pandas
    // merge_asof return no match. Unfiltered, the null ts sorts
    // nulls-first in the window and its non-null payload struct is
    // inherited by every probe in the key.
    val b = Seq(
      (1L, null.asInstanceOf[Timestamp], 7L, 1.0),
      (2L, null.asInstanceOf[Timestamp], 8L, 2.0),
      (2L, ts("2024-01-01 10:00:00"), 9L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val p = Seq(
      (1L, 1L, ts("2024-01-01 12:00:00")), // only a null-ts build row
      (2L, 2L, ts("2024-01-01 12:00:00"))) // real row must still match
      .toDF("pid", "user_id", "ts")
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select($"pid", $"asof_event_id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val bwd = ids(AsOfJoin.leftAsOf(p, b, "user_id", "user_id",
      "ts", "ts", Seq("event_id"), "event_id"))
    val near = ids(AsOfJoin.leftAsOfNearest(p, b, "user_id", "user_id",
      "ts", "ts", Seq("event_id"), "event_id"))
    assert(bwd == Map(1L -> None, 2L -> Some(9L)), s"backward: $bwd")
    assert(near == Map(1L -> None, 2L -> Some(9L)), s"nearest: $near")
  }

  test("nearest equivalence with the naive both-direction argmin on " +
      "random data, and all payload columns come from the one winner") {
    val rnd = new scala.util.Random(47)
    def t(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
    val b = Seq.fill(60)((rnd.nextInt(5).toLong, t(rnd.nextInt(100)),
      rnd.nextLong().abs, rnd.nextDouble()))
      .toDF("user_id", "ts", "event_id", "value")
    val p = Seq.tabulate(80)(i =>
      (i.toLong, rnd.nextInt(6).toLong, t(rnd.nextInt(100))))
      .toDF("pid", "user_id", "ts")
    val fast = AsOfJoin.leftAsOfNearest(p, b, "user_id", "user_id",
      "ts", "ts", Seq("event_id", "value"), "event_id")
      .select($"pid", $"asof_event_id", $"asof_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    // naive: all same-key pairs, rank by (|Δt|, direction: backward
    // first, then the side's own tie rule on event_id — larger id for
    // backward, smaller for forward: encode as signed tie key)
    val naive = p.as("p").join(b.as("b"),
        col("p.user_id") === col("b.user_id"), "left")
      .select($"pid", col("b.event_id").as("bid"),
        col("b.value").as("bval"),
        abs(unix_micros(col("p.ts")) - unix_micros(col("b.ts")))
          .as("dist"),
        when(unix_micros(col("b.ts")) <= unix_micros(col("p.ts")), 0)
          .otherwise(1).as("dir"),
        when(unix_micros(col("b.ts")) <= unix_micros(col("p.ts")),
          -col("b.event_id")).otherwise(col("b.event_id")).as("tie"))
      .groupBy($"pid")
      .agg(min(struct($"dist", $"dir", $"tie", $"bid", $"bval")).as("m"))
      .select($"pid", $"m.bid", $"m.bval").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(fast == naive)
  }

  test("equivalence with the naive range-join + argmax on random data") {
    val rnd = new scala.util.Random(13)
    def t(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
    val b = Seq.fill(60)((rnd.nextInt(5).toLong, t(rnd.nextInt(100)),
      rnd.nextLong().abs, rnd.nextDouble()))
      .toDF("user_id", "ts", "event_id", "value")
    val p = Seq.tabulate(80)(i => (i.toLong, rnd.nextInt(6).toLong, t(rnd.nextInt(100))))
      .toDF("pid", "user_id", "ts")
    val fast = AsOfJoin.leftAsOf(p, b, "user_id", "user_id", "ts", "ts",
      Seq("event_id"), "event_id")
      .select($"pid", $"asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val naive = p.as("p").join(b.as("b"),
        col("p.user_id") === col("b.user_id") && col("p.ts") >= col("b.ts"), "left")
      .groupBy($"pid")
      .agg(max(struct(col("b.ts"), col("b.event_id"))).as("m"))
      .select($"pid", $"m.event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == naive)
  }
}
