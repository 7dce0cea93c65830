package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rotation-group recovery against the ARTIFACT FORMATS actually
  * committed to the repo (r14 verdict item 1): the driver's
  * `BENCH_r{N}.json` wrapper stores the bench line quote-ESCAPED
  * inside a `"tail"` string — `\"rotation_group\":0` — which the r14
  * regex could not match, so the recovery silently fell back to
  * floorMod and skipped group 1. These cases pin both committed
  * shapes (escaped wrapper, bare line), the timed/untimed inference
  * for pre-r15 artifacts, the explicit `rotation_timed` field, and
  * the don't-advance-past-an-untimed-slice rule.
  */
class BenchRotationSpec extends AnyFunSuite {

  // the r13 wrapper shape, verbatim escaping: slice TIMED
  // (degraded_shard false, partial false), group 0
  private val r13Wrapper =
    """{"n":13,"rc":0,"cpus":32,"sf":0.1,"tail":"...,\"calib0\":[0.29,0.3,0.03],\"degraded_shard\":false,\"partial\":false,\"sweeps_completed\":2,\"unwarmed\":0,\"timed\":145,\"catalog\":234,\"rotation_group\":0,\"rotation_k\":3,\"single_task\":[],\"sf\":\"/root/testdata/sf0.1\"}","parsed":null}"""

  // the r14 wrapper shape: group 2 PUBLISHED but the slice was dropped
  // (degraded_shard true) — the case the advance must skip
  private val r14Wrapper =
    """{"n":14,"rc":0,"cpus":32,"sf":0.1,"tail":"...,\"degraded_shard\":true,\"partial\":false,\"sweeps_completed\":2,\"healthy_sweeps\":2,\"degraded_sweeps\":[],\"timed\":103,\"catalog\":234,\"rotation_group\":2,\"rotation_k\":3,\"regressions\":[],\"sf\":\"/root/testdata/sf0.1\"}","parsed":null}"""

  test("escaped wrapper: rotation_group parses from the \\\"-quoted tail") {
    assert(Bench.rotationRecord(r13Wrapper) === Some((0, true)))
    assert(Bench.rotationRecord(r14Wrapper) === Some((2, false)))
  }

  test("bare bench line parses, explicit rotation_timed wins over the " +
      "degraded_shard inference") {
    val bare =
      """{"metric":"total","degraded_shard":false,"partial":false,""" +
        """"rotation_group":1,"rotation_k":3,"rotation_timed":false}"""
    assert(Bench.rotationRecord(bare) === Some((1, false)),
      "rotation_timed:false must override the healthy-shard inference")
    val timed =
      """{"degraded_shard":true,"rotation_group":1,"rotation_timed":true}"""
    assert(Bench.rotationRecord(timed) === Some((1, true)),
      "explicit rotation_timed:true wins even when degraded_shard is true")
  }

  test("pre-r15 inference: partial or degraded_shard means NOT timed") {
    val partial =
      """{"degraded_shard":false,"partial":true,"rotation_group":2}"""
    assert(Bench.rotationRecord(partial) === Some((2, false)))
    val clean = """{"degraded_shard":false,"partial":false,"rotation_group":2}"""
    assert(Bench.rotationRecord(clean) === Some((2, true)))
  }

  test("no rotation_group in the text -> None (triggers floorMod fallback)") {
    assert(Bench.rotationRecord("""{"n":9,"tail":"...truncated..."}""") === None)
    assert(Bench.rotationRecord("") === None)
  }

  test("the r15 scenario: newest artifact untimed (r14, group 2) is " +
      "skipped; advance from r13's timed group 0 -> group 1") {
    assert(Bench.nextRotationGroup(Seq(r14Wrapper, r13Wrapper), 3) ===
      Some(1))
  }

  test("advance wraps around modulo rotation_k") {
    val g2timed = """{"degraded_shard":false,"partial":false,"rotation_group":2}"""
    assert(Bench.nextRotationGroup(Seq(g2timed), 3) === Some(0))
  }

  test("no timed artifact anywhere -> None (fallback to floorMod)") {
    assert(Bench.nextRotationGroup(Seq(r14Wrapper), 3) === None)
    assert(Bench.nextRotationGroup(Seq.empty, 3) === None)
  }

  test("single-task attribution: an event is blamed on exactly the " +
      "timed run whose window contains its midpoint") {
    // synthetic stage log around two timed runs:
    //   warm-up stage at t=500 (before any window), q_a [1000,2000],
    //   gap stage at t=2500, q_b [3000,6000], settle stage at t=9000
    val windows = Seq(("q_a", 1000L, 2000L), ("q_b", 3000L, 6000L))
    val events = Seq(
      (500L, "warm-up stage"),   // concurrent warm-up: no window
      (1500L, "stage 12 4.0 s"), // inside q_a
      (2500L, "inter-run gap"),  // between windows
      (4000L, "stage 40 3.5 s"), // inside q_b
      (9000L, "settle stage"))   // after the last window
    assert(Bench.attributeSingleTask(windows, events) === Set("q_a", "q_b"))
    // the r15 failure mode: ONLY out-of-window events -> no blame.
    // (date_functions' 0.245 s timed run was flagged for a warm-up
    // stage recorded before its window even opened)
    assert(Bench.attributeSingleTask(windows,
      Seq((500L, "w"), (2500L, "g"), (9000L, "s"))) === Set.empty[String])
    // window bounds are inclusive on both ends
    assert(Bench.attributeSingleTask(windows, Seq((1000L, "e"))) ===
      Set("q_a"))
    assert(Bench.attributeSingleTask(windows, Seq((6000L, "e"))) ===
      Set("q_b"))
    // no windows at all (e.g. every run failed before timing): no blame
    assert(Bench.attributeSingleTask(Seq.empty, events) ===
      Set.empty[String])
  }

  test("heal decision: the r14 scenario heals (healthy re-probe, ample " +
      "slack), the r11 bandwidth-starved host does not") {
    // r14 shape: startup blip passed, re-probe at baseline, ~150 s
    // elapsed after warm-up/restart, predicted full sweep ~55 s,
    // 470 s budget -> 150 + 45 + 60 + 110 + 30 = 395 <= 470: HEAL
    assert(Bench.healFits(1.0, 1.0, 44, Some(55.0), 150.0, 45.0, 470.0))
    // persistent degradation (r11's 1.8x): never heal, whatever fits
    assert(!Bench.healFits(1.8, 1.0, 44, Some(55.0), 150.0, 45.0, 470.0))
    // bandwidth-starved mode the CPU probe is blind to — r19 lowered
    // the mem threshold to 1.6x (the r18 host read 2.0x and the old
    // 5x bar never fired)
    assert(!Bench.healFits(1.0, 6.0, 44, Some(55.0), 150.0, 45.0, 470.0))
    assert(!Bench.healFits(1.0, 2.0, 44, Some(55.0), 150.0, 45.0, 470.0))
    // no credible predictor (baseline doesn't cover the shard): no heal
    assert(!Bench.healFits(1.0, 1.0, 44, None, 150.0, 45.0, 470.0))
    // nothing to restore: no-op
    assert(!Bench.healFits(1.0, 1.0, 0, Some(55.0), 150.0, 45.0, 470.0))
    // thin slack: 250 elapsed + 45 + 60 + 2*55 + 30 = 495 > 470
    assert(!Bench.healFits(1.0, 1.0, 44, Some(55.0), 250.0, 45.0, 470.0))
    // boundary: exactly equal fits (<=), both probes AT threshold
    assert(Bench.healFits(1.5, 1.6, 1, Some(55.0), 225.0, 45.0, 470.0))
  }

  test("post-warm budget shrink: rotation entries drop first, " +
      "costliest first, core survives") {
    val timed = Seq("core_a", "core_b", "rot_x", "rot_y", "new_z")
    val core = Set("core_a", "core_b", "new_z")
    val cost = Map("core_a" -> 1.0, "core_b" -> 5.0, "rot_x" -> 4.0,
      "rot_y" -> 2.0, "new_z" -> 3.0)
    // capacity admits everything but the two rotation entries' cost:
    // rot_x (costlier) must go first, then rot_y; core untouched
    def fitsAt(cap: Double)(set: Seq[String]): Boolean =
      set.map(cost).sum <= cap
    assert(Bench.shrinkToBudget(timed, core, cost, fitsAt(11.0),
      minKeep = 1) === Seq("core_a", "core_b", "rot_y", "new_z"))
    assert(Bench.shrinkToBudget(timed, core, cost, fitsAt(9.0),
      minKeep = 1) === Seq("core_a", "core_b", "new_z"))
    // still not fitting after all rotation dropped: costliest core goes
    assert(Bench.shrinkToBudget(timed, core, cost, fitsAt(4.0),
      minKeep = 1) === Seq("core_a", "new_z"))
    // already fits: untouched, original order preserved
    assert(Bench.shrinkToBudget(timed, core, cost, fitsAt(100.0),
      minKeep = 1) === timed)
    // the floor stops the shrink even when nothing fits
    assert(Bench.shrinkToBudget(timed, core, cost, fitsAt(0.0),
      minKeep = 3).size === 3)
  }

  test("rotation_age counts consecutive untimed artifacts newest-first " +
      "(r20 verdict item 5: the staleness the artifact must publish)") {
    val untimed =
      """{"degraded_shard":true,"rotation_group":1,"rotation_timed":false}"""
    val timed =
      """{"degraded_shard":false,"partial":false,"rotation_group":0,""" +
        """"rotation_timed":true}"""
    assert(Bench.rotationAge(Seq(timed, untimed)) === 0,
      "newest artifact timed -> age 0")
    assert(Bench.rotationAge(Seq(untimed, timed)) === 1)
    assert(Bench.rotationAge(Seq(untimed, untimed, untimed, timed)) === 3,
      "the r18-r20 shape: three stuck driver rounds read as age 3")
    // artifacts with no rotation record (truncated tails) are skipped,
    // not counted as untimed
    assert(Bench.rotationAge(Seq("""{"n":9,"tail":"..."}""", timed)) === 0)
    assert(Bench.rotationAge(Seq.empty) === 0)
    assert(Bench.rotationAge(Seq(untimed)) === 1)
  }

  test("a full-catalog BENCH_ALL artifact advances the rotation group " +
      "(its empty slice is vacuously timed — r20 verdict item 5)") {
    // the shape Bench emits under BENCH_ALL: rotationSlice is empty so
    // rotation_timed prints true even on a degraded host
    val benchAll =
      """{"timed":276,"catalog":276,"round":21,"rotation_group":1,""" +
        """"rotation_k":4,"rotation_timed":true}"""
    assert(Bench.rotationRecord(benchAll) === Some((1, true)))
    val stuckDriver =
      """{"degraded_shard":true,"rotation_group":1,"rotation_timed":false}"""
    // builder BENCH_ALL newer than the stuck driver artifact: advances
    assert(Bench.nextRotationGroup(Seq(benchAll, stuckDriver), 4) ===
      Some(2))
  }

  test("degraded-tier cross-check: >= 3x the same-substrate denominator " +
      "on a 0-healthy-sweep run is excluded; healthy sweeps stand down") {
    val tier = Map("agg_percentiles" -> 1.53, "roundtrip_csv" -> 1.41,
      "cheap" -> 0.2, "calibn_sec" -> 0.34)
    // the r20 driver-run shape: 70.5 s against a 1.53 s tier denominator
    val results = Map("agg_percentiles" -> 70.5, "roundtrip_csv" -> 1.2,
      "cheap" -> 0.9, "unknown_entry" -> 50.0)
    assert(Bench.tierExcludedEntries(results, tier,
      anyHealthySweep = false) === Set("agg_percentiles"),
      "70.5 vs 1.53 excluded; 1.2 vs 1.41 kept; sub-1s jitter kept; " +
        "no tier denominator -> no cross-check")
    // any healthy sweep: lower-median already prefers healthy samples
    assert(Bench.tierExcludedEntries(results, tier,
      anyHealthySweep = true) === Set.empty[String])
    // boundary: exactly 3.0x at >= 1 s is excluded
    assert(Bench.tierExcludedEntries(Map("q" -> 3.0), Map("q" -> 1.0),
      anyHealthySweep = false) === Set("q"))
    // a zero/absent denominator can never divide
    assert(Bench.tierExcludedEntries(Map("q" -> 9.0), Map("q" -> 0.0),
      anyHealthySweep = false) === Set.empty[String])
  }

  test("stall-mode attribution: run >> cpu in EVERY window flags the " +
      "entry; one healthy window acquits it; warm-up events ignored") {
    // the r19 CC signature: stage run 134.6 s, cpu 8.9 s — run/cpu 15x
    val windows = Seq(
      ("stalled", 1000L, 10000L),            // one window, stalled
      ("mixed", 20000L, 30000L), ("mixed", 40000L, 50000L),
      ("healthy", 60000L, 70000L),
      ("quiet", 80000L, 81000L))             // no >=2 s stages at all
    val events = Seq(
      (500L, 200.0, 2.0),       // warm-up stage: outside every window
      (5000L, 134.6, 8.9),      // stalled's window: run/cpu 15x
      (25000L, 90.0, 3.0),      // mixed window 1: stalled
      (45000L, 12.0, 11.5),     // mixed window 2: cpu-bound -> acquit
      (65000L, 30.0, 28.0))     // healthy: run ~ cpu
    assert(Bench.stallModeEntries(windows, events) === Set("stalled"))
    // a fast entry with NO recorded stages is never stall-mode (the
    // forall must not vacuously flag stage-free windows as stalled):
    // run = 0 < minRunSec
    assert(!Bench.stallModeEntries(windows, events).contains("quiet"))
    // below the absolute floor: a 3 s run at 20x cpu is noise, not a
    // stall verdict
    assert(Bench.stallModeEntries(Seq(("tiny", 0L, 1000L)),
      Seq((500L, 3.0, 0.15))) === Set.empty[String])
    // no windows: nothing flagged
    assert(Bench.stallModeEntries(Seq.empty, events) ===
      Set.empty[String])
  }
}
