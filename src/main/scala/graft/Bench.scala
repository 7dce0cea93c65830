package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the catalog on SPARK_GRAFT_SF_DIR.
  *
  * Measurement rules (accreted round 1 → 12; each clause names the
  * artifact failure it prevents):
  *   - materialize the FULL plan through the `noop` sink — a bare
  *     `count()` lets Catalyst prune projections/sorts, timing a plan
  *     the correctness gate never checked;
  *   - one untimed warm-up pass first, so JVM/Spark/codegen startup
  *     isn't billed to whichever query happens to run first;
  *   - timed runs are INTERLEAVED full-catalog sweeps (run every timed
  *     query once, then repeat) rather than back-to-back repeats: the
  *     r2 artifact recorded a single-shot 17 s GC/JIT hiccup for a
  *     1.4 s query, and the r8 artifact showed a several-minute
  *     session-pressure window inflating one alphabetical stretch of
  *     back-to-back triples 10-30x — with sweeps, each query's samples
  *     are minutes apart, so a transient window can tax at most one
  *     sample and the cross-sweep lower-median sheds it;
  *   - TWO timed sweeps, not three (round-12 budget fix): the r8
  *     insight that mattered was the INTERLEAVING, not the sample
  *     count — lower-median of 2 = min, which is exactly the "shed the
  *     noisy sample" estimator the 3-sweep median was approximating.
  *     Three sweeps of a 200-entry catalog plus per-sweep restart
  *     overhead stopped fitting the driver's 470 s budget around r10
  *     and produced four consecutive partial artifacts (r8-r11);
  *   - ONE session restart, after warm-up, before sweep 1 only
  *     (round-12; was per-sweep in r11): the restart exists to drop
  *     the warm-up's dead-but-strongly-held block store (cleaner off,
  *     see below) so the timed heap is deterministic — that benefit is
  *     paid for once; repeating it re-paid settle + JIT quiesce per
  *     sweep (~60-90 s each) for no additional determinism. Between
  *     sweeps: unpersist + gc + a SHORT quiesce;
  *   - a SHARDED timed catalog (round-12): the ~100 core production
  *     entries (listed as "core" in BASELINE_BENCH.json) are timed
  *     every round; the remaining entries rotate in rotation_k
  *     deterministic hash groups, one group per round, so every entry
  *     is re-measured every rotation_k rounds while the per-round
  *     sweep stays ~135 entries ≈ 70 s warm. Correctness is NOT
  *     sharded — Verify still gates all entries every round. The
  *     round index comes from the committed BENCH_r{N}.json files
  *     (max N + 1): deterministic, no wall clock. The rotation GROUP
  *     advances +1 from the newest artifact whose slice was actually
  *     TIMED (round-13 verdict item 6 + round-14 item 1: a round with
  *     no artifact must not make the group index skip, and a round
  *     that dropped its slice must not make the next run advance past
  *     entries never measured — the artifact's "rotation_timed" field
  *     records the fact). New entries absent
  *     from the baseline are always timed (fresh code gets a number
  *     the round it lands). SPARK_GRAFT_BENCH_ALL=1 times everything
  *     (used to re-record the baseline);
  *   - DEGRADED-SWEEP self-exclusion (round-13 verdict item 2): each
  *     sweep's calibration is checked against the baseline calibn_sec
  *     both before AND after the sweep (the r13 run degraded mid-run:
  *     sweep 2 calibrated 13x baseline, silently turning min-of-2
  *     into min-of-1). A sweep reading >1.5x on either probe has its
  *     samples flagged and listed under "degraded_sweeps"; a
  *     replacement sweep runs if the feasibility arithmetic fits (at
  *     most one). Published per-entry numbers prefer healthy samples,
  *     falling back to flagged ones only when no sweep was healthy;
  *   - budget arithmetic, closed by construction (round-12): with the
  *     470 s default budget, worst-case healthy-session spend is
  *     warm-up (hard cap 100) + restart/settle/quiesce (≤ 75) +
  *     calib (~6) + sweep 1 (~70) + inter-sweep (≤ 30) + sweep 2
  *     (~70) ≈ 350 s. A degraded host (the r11 1.8x bandwidth-starved
  *     session) inflates sweeps to ~130 s each: the pre-sweep-2
  *     feasibility check then stops cleanly after ONE complete sweep —
  *     every timed entry still sampled, partial stays false — instead
  *     of blowing the budget mid-sweep into an alphabetically-biased
  *     partial;
  *   - System.gc() + unpersist between sweeps: stops heap growth from
  *     biasing sweep 2 and drops sweep 1's localCheckpoint blocks
  *     where nothing is being timed;
  *   - fixed CPU calibration probes (single-thread + all-thread LCG)
  *     and a memory-BANDWIDTH probe before each sweep, reported as
  *     calib1/calibn/calibm (medians) plus the per-sweep readings
  *     under "sweep_cals": the probes' cost is machine-constant, so a
  *     reading far above its baseline identifies a slow SESSION (r7
  *     read 1.478x on a commit that changed no plans; the r11 session
  *     read 1.8x on both LCG probes before any repo code ran) — and
  *     the per-sweep readings let a reader separate session noise
  *     from code in one glance without cross-referencing logs;
  *   - single-task stage detector: any timed entry whose execution
  *     contains a ≥ 3 s stage with tasks = 1 is listed under
  *     "single_task" — the r10/r11 class of scale defect (AQE or a
  *     1-file input collapsing a hot stage onto one core) becomes a
  *     machine-checkable artifact field instead of a log forensic;
  *   - STALL-MODE exclusion from vs_baseline (round-20, r19 verdict
  *     item 1b): deadlined samples and entries whose every timed
  *     window showed run ≫ cpu at an anomalous reading are listed
  *     under "stall_excluded" and filtered out of the published
  *     ratio — r19's artifact of record put four 47-120 s stall
  *     samples into vs_baseline (21.756) while its own drift probes
  *     read 1.05/1.29; a ratio built on samples that measure the
  *     host's block-manager stalls is disinformation. Their raw
  *     numbers stay in "queries" — the exclusion is from the ratio,
  *     never from the record;
  *   - mid-warm stall abort + observed-cost fit (round-20, item 1a):
  *     the warm pass aborts when 6 consecutive warms read ≥ 10× their
  *     baseline (the probes are blind to this mode), and the post-warm
  *     fit-shrink prices each entry at the worse of probe-scaled
  *     baseline and observed-warm/3 — a stall window now shrinks the
  *     timed set instead of silently eating the sweeps' budget;
  *   - emit the JSON line on stdout AND to bench_out.json, because the
  *     stdout line drowns in sbt log noise ("parsed": null in r01);
  *   - split the total into production vs verification subtotals: the
  *     `*_portable` entries run md5-as-string hashing that exists ONLY
  *     to put a DuckDB hash oracle on the sketch algorithms — their
  *     cost is verification overhead, not engine throughput — and
  *     report the production-subtotal ratio vs the committed
  *     BASELINE_BENCH.json so a regression is machine-checkable.
  */
object Bench {

  /** Catalog entries that exist solely to oracle a sketch algorithm
    * with a cross-engine-portable (md5-prefix) hash; production twins
    * (`dedup_minhash_lsh`, `doc_winnow_fingerprint`, `text_simhash`)
    * keep xxhash64 and are counted as production. */
  val verificationOnly: Set[String] =
    Set("doc_winnow_portable", "dedup_minhash_portable",
      "text_simhash_portable", "dedup_simhash_portable",
      "heavy_hitters_mg_portable")

  /** Parse (rotation_group, slice-was-timed) from ONE committed bench
    * artifact's RAW text. Committed artifacts come in two shapes: the
    * bare JSON line this main emits, and the driver's wrapper, which
    * embeds a (possibly truncated) suffix of that line quote-ESCAPED
    * inside a "tail" string — BENCH_r13.json literally contains
    * `\"rotation_group\":0`. The r14 recovery regex matched only the
    * unescaped form, never hit either committed artifact, and the
    * silent floorMod fallback skipped rotation group 1 (r14 verdict
    * item 1). Unescape before matching so both shapes parse.
    *
    * "Timed" prefers the explicit `rotation_timed` field (emitted from
    * r15 on); older artifacts infer it as `degraded_shard:false` AND
    * `partial:false` — the r14 run dropped its rotation slice via the
    * degraded-shard decision yet still published the advanced group
    * number. */
  private[graft] def rotationRecord(raw: String): Option[(Int, Boolean)] = {
    val text = raw.replace("\\\"", "\"")
    """"rotation_group":\s*([0-9]+)""".r.findFirstMatchIn(text).map { m =>
      val timed = """"rotation_timed":\s*(true|false)""".r
        .findFirstMatchIn(text).map(_.group(1) == "true").getOrElse {
          """"degraded_shard":\s*true""".r.findFirstIn(text).isEmpty &&
            """"partial":\s*true""".r.findFirstIn(text).isEmpty
        }
      (m.group(1).toInt, timed)
    }
  }

  /** Next rotation group from the committed artifacts, newest first:
    * +1 from the newest artifact whose slice was actually TIMED.
    * Artifacts that selected a group but dropped its slice (degraded
    * shard, partial run) are skipped entirely — advancing past an
    * untimed group would leave its entries permanently unmeasured.
    * Sequential coverage is per TIMED slice, not per published
    * number. A full-catalog BENCH_ALL artifact records
    * `rotation_timed: true` (its rotation slice is vacuously covered —
    * every entry was timed), so builder-side BENCH_ALLs advance the
    * group too once their artifact is in the scanned set (r20 verdict
    * item 5). */
  private[graft] def nextRotationGroup(rawsNewestFirst: Seq[String],
      rotationK: Int): Option[Int] =
    rawsNewestFirst.iterator.flatMap(rotationRecord(_)).collectFirst {
      case (g, true) => math.floorMod(g + 1, rotationK)
    }

  /** Rotation STALENESS counter (r20 verdict item 5 — "worth a
    * staleness counter in the artifact"): how many consecutive recent
    * artifacts failed to time their rotation slice. 0 = the newest
    * rotation-recording artifact advanced the group; N = the group has
    * been stuck behind N untimed runs (r18-r20 published
    * rotation_timed:false three driver rounds running and nothing in
    * the artifact said how stale the non-core entries were).
    * Artifacts with no rotation record (pre-r12, truncated) are
    * skipped, same as in [[nextRotationGroup]]. */
  private[graft] def rotationAge(rawsNewestFirst: Seq[String]): Int =
    rawsNewestFirst.iterator.flatMap(rotationRecord(_))
      .takeWhile(!_._2).size

  /** Pure DEGRADED-TIER cross-check (r20 verdict item 1): on a run
    * with no healthy sweep (`sweeps_completed: 0`, or every completed
    * sweep self-flagged), a sample >= `factor`x its SAME-SUBSTRATE
    * degraded-tier denominator is a co-location-window artifact, not a
    * plan measurement — the r20 driver artifact published 10 samples
    * at 13-69x their tier denominators (all ~1-1.5 s in the tier
    * record hours earlier) because the window was CPU-shaped and the
    * run>>cpu stall signature never fired. Returns the entries to
    * exclude from the headline ratios (their raw numbers stay in
    * "queries"; the exclusion is published under "tier_excluded").
    * With any healthy sweep in hand the lower-median already prefers
    * healthy samples, so the cross-check stands down. `minSec` keeps
    * sub-second jitter out of the signal. */
  private[graft] def tierExcludedEntries(results: Map[String, Double],
      tierKv: Map[String, Double], anyHealthySweep: Boolean,
      factor: Double = 3.0, minSec: Double = 1.0): Set[String] =
    if (anyHealthySweep) Set.empty
    else results.collect { case (n, v) if v >= minSec &&
      tierKv.get(n).exists(t => t > 0 && v / t >= factor) => n }.toSet

  /** Pure decision predicate for the startup-degraded shard HEAL —
    * restore the rotation slice iff the post-warm-up probe reads
    * healthy (same 1.5x CPU / 1.6x mem thresholds as the startup
    * test — r19 lowered mem from 5x: the r18 session was ALU-flat
    * with calibm at 2.0x and the old threshold never fired), there is
    * something to restore, AND the budget arithmetic fits:
    * restored-entry warm pass (<= `healWarmSec`) + pre-sweep quiesce
    * and probe overhead (~60 s) + two predicted FULL-shard sweeps +
    * the inter-sweep gap (~30 s). `estSweepSec` is None when the
    * baseline doesn't credibly predict the full shard — no predictor,
    * no heal (a blind restore is how budgets blow mid-sweep). */
  private[graft] def healFits(reCpu: Double, reMem: Double,
      restoredCount: Int, estSweepSec: Option[Double],
      elapsedSec: Double, healWarmSec: Double, budgetSec: Double): Boolean =
    reCpu <= 1.5 && reMem <= 1.6 && restoredCount > 0 &&
      estSweepSec.exists(est =>
        elapsedSec + healWarmSec + 60.0 + 2 * est + 30.0 <= budgetSec)

  /** Pure shrink for the post-warm budget fit (r19, verdict item 2):
    * when two predicted sweeps of the warmed timed set no longer fit
    * the remaining budget, drop entries — rotation slice first, then
    * core — costliest first within each group, until the arithmetic
    * fits (or a floor of `minKeep` entries is reached, below which the
    * artifact stops being worth emitting and the budget overrun is
    * the lesser evil). Entries with no baseline record (new this
    * round) rank with core: they are the rows the round exists to
    * measure. Returns the kept set in the original order. */
  private[graft] def shrinkToBudget(timed: Seq[String],
      isCore: String => Boolean, cost: String => Double,
      fits: Seq[String] => Boolean, minKeep: Int = 20): Seq[String] = {
    val dropOrder = timed.sortBy(n => (if (isCore(n)) 1 else 0, -cost(n)))
    var kept = timed
    val it = dropOrder.iterator
    while (!fits(kept) && kept.size > minKeep && it.hasNext) {
      val d = it.next()
      kept = kept.filterNot(_ == d)
    }
    kept
  }

  /** Pure post-hoc single-task attribution (r15 verdict item 4 →
    * r16 item 6): assign each recorded ≥ 3 s one-task stage event to
    * the TIMED run whose [start, end] wall-clock window contains the
    * stage's midpoint. Windows come only from `attribute = true` runs
    * (the serial timed sweeps), so stages from the concurrent warm-up,
    * the settle pass, or inter-sweep gaps fall outside every window
    * and are dropped — the r15 failure mode was exactly a warm-up
    * stage blamed on `date_functions`' 0.245 s timed run. Extracted
    * pure so `BenchRotationSpec` can pin the scoping on a synthetic
    * stage log. */
  private[graft] def attributeSingleTask(
      windows: Seq[(String, Long, Long)],
      events: Seq[(Long, String)]): Set[String] =
    events.flatMap { case (midMs, _) =>
      windows.collectFirst { case (n, a, b) if midMs >= a && midMs <= b => n }
    }.toSet

  /** Pure per-entry STALL-MODE attribution (r19 verdict item 1b): an
    * entry is in stall mode when EVERY one of its timed windows shows
    * the substrate-stall signature — the ≥ 2 s stages inside the
    * window total ≥ `minRunSec` of executor wall-time at ≥ `factor`×
    * their executor CPU-time. That is the shape the r19 CC attribution
    * pinned (stage run 134.6 s, cpu 8.9 s, 32 tasks, ALU probes flat):
    * task threads parked on block-manager / IO waits, measuring the
    * host's stall window, not the plan. "EVERY window" is the
    * conservative arm: with ≥ 2 sweeps the published lower-median
    * already sheds a single stalled sample, so only an entry whose
    * every sample stalled can publish a stall reading. Events outside all
    * windows (warm-up, settle, gaps) are ignored, same scoping as
    * [[attributeSingleTask]]. Extracted pure so `BenchRotationSpec`
    * pins the rule on synthetic logs. */
  private[graft] def stallModeEntries(
      windows: Seq[(String, Long, Long)],
      events: Seq[(Long, Double, Double)],
      minRunSec: Double = 5.0, factor: Double = 6.0): Set[String] =
    windows.groupBy(_._1).collect { case (n, ws) if ws.forall {
      case (_, a, b) =>
        val es = events.filter(e => e._1 >= a && e._1 <= b)
        val run = es.map(_._2).sum
        val cpu = es.map(_._3).sum
        run >= minRunSec && run >= factor * math.max(cpu, 0.1)
    } => n }.toSet

  @volatile private var calibSink = 0L // defeats dead-code elimination

  private def lcgSpin(iters: Long): Long = {
    var h = 0L
    var i = 0L
    while (i < iters) {
      h = h * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    h
  }

  /** Fixed-cost CPU probe: `threads` concurrent LCG spins of 2e8 steps
    * each. Pure integer ALU work — no allocation, no I/O — so its wall
    * time moves ONLY with machine load/contention, never with any code
    * in this repo. `private[graft]` so [[HostProbe]] (the
    * healthy-window watcher's probe main) reuses the identical
    * instrument — a watcher probing with different code would detect
    * a different window than the bench measures. */
  private[graft] def calibrate(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      new Thread(() => { calibSink = lcgSpin(200000000L) })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-cost MEMORY-BANDWIDTH probe: `threads` concurrent strided
    * sums over per-thread 64 MB long arrays (touched at allocation, so
    * steady-state reads, not page faults). Exists because the ALU
    * probe is CACHE-RESIDENT and therefore BLIND to the dominant
    * co-location hazard on a shared host: memory-bandwidth
    * saturation. A starved session shows the exact signature the r10
    * verdict called "transient session pressure" — normal LCG
    * calibration, yet the same stages at ~10x executorCpuTime (cycles
    * stalled on memory bill as CPU) and heavy jvmGCTime (GC is
    * bandwidth-bound) — measured on this box: an idle-VM steady-state
    * read rate of 0.1-1.9 GB/s (vs the >10 GB/s a healthy host
    * gives) while the LCG probes read within 15% of baseline.
    * calibm_sec makes that session state machine-detectable in the
    * artifact. */
  private lazy val memProbeArrays: IndexedSeq[Array[Long]] =
    (1 to 8).map { _ =>
      val a = new Array[Long](8 * 1024 * 1024) // 64 MB
      var i = 0
      // stride 512 longs = 4 KB — one write per PAGE. The first cut
      // strode 1024 longs (8 KB), leaving every other page untouched,
      // so the session's first calibrateMem() billed soft faults as
      // bandwidth and inflated sweep 1's calibm_sec.
      while (i < a.length) { a(i) = i; i += 512 } // touch every page
      a
    }

  private[graft] def calibrateMem(): Double = {
    val arrays = memProbeArrays // allocated once, reused every sweep
    val t0 = System.nanoTime()
    val ts = arrays.map { a =>
      new Thread(() => {
        var s = 0L
        var pass = 0
        while (pass < 4) {
          var i = 0
          while (i < a.length) { s += a(i); i += 8 } // one read/cacheline
          pass += 1
        }
        calibSink = s
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def buildSession(): SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the JVM-wide generated-class cache defaults to 100 entries; a
      // ~200-entry catalog swept in interleaved order (r8 fix for
      // session-noise robustness) evicts EVERY query's classes between
      // its own repeats, so each timed run re-pays single-threaded
      // Janino compilation (~1-2 s flat per query — the r8/r9 "uniform
      // regression" vs the back-to-back-recorded baseline). Size it to
      // hold the whole catalog so timed runs measure execution, not
      // recompilation.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // BENCH-ONLY: disable the ContextCleaner. ~500 query executions
      // share this session; every young GC releases thousands of dead
      // broadcast/RDD weak refs at once and the cleaner's remove-RPC
      // flood saturates the BlockManagerMaster dispatcher — queries
      // that register broadcast pieces mid-build stall behind it for
      // MINUTES (observed: 4 s entries reading 120-340 s, different
      // victims each run, always broadcast-building ones; calibration
      // normal). With tracking off, blocks accumulate (a few GB in a
      // 19 GB store, MEMORY_AND_DISK spills, nothing is lost) and the
      // restart after warm-up drops the bulk of them wholesale.
      // Verify/tests keep the default cleaner.
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()

    // Wall-clock discipline (round-9 fix): the driver runs Bench under a
    // hard external timeout (~600 s including sbt startup/compile) and a
    // kill leaves NO artifact — BENCH_r09.json was rc=124 with
    // "parsed": null even though the same catalog benched at 0.8x
    // baseline the same morning. A soft budget
    // (SPARK_GRAFT_BENCH_BUDGET_SEC, default 470 s measured from this
    // main's start) is checked between queries; when exceeded,
    // remaining work is dropped and the JSON is emitted from the
    // samples already collected, marked "partial": true with
    // "sweeps_completed" — a slow session degrades the sample count,
    // never the artifact.
    val t0Wall = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - t0Wall) / 1e9
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "470").toDouble
    val nSweeps = sys.env.getOrElse("SPARK_GRAFT_BENCH_SWEEPS", "2").toInt
    // Warm-up runs against the MEASURED dir (round-11 revert of the
    // round-9 sf0.001 shortcut): under AQE, physical plans — and so
    // the generated whole-stage-codegen classes — are NOT
    // data-size-independent (different broadcast/coalesce decisions at
    // 1/100th the bytes → different generated code). An sf0.001
    // warm-up left sweep 1 loading fresh sf0.1 codegen classes into a
    // saturated C2 queue, so entries ran INTERPRETED for whole stages.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)

    // SPARK_GRAFT_BENCH_SKIP: comma-separated entries excluded from the
    // run entirely (warm-up AND sweeps) — the A/B attribution knob for
    // correlated-drift hunts (r17 verdict item 1: does the portable-md5
    // elevation band clear when the md5-dense column entries sit out a
    // sweep?). Diagnostic only: a skip run is marked in the artifact
    // ("skip_list") and is NOT a valid baseline-record input.
    val skipList: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val names = SparkEntry.queries.keys.toSeq.filterNot(skipList).sorted
    if (skipList.nonEmpty)
      System.err.println(s"[bench] SKIP list active (${skipList.size}): " +
        skipList.toSeq.sorted.mkString(","))

    // ----- baseline record (parsed once: ratios + the core shard list).
    // The baseline file is a flat JSON object; scrape it with regexes
    // (no JSON library on the allowed deps).
    val baselinePath = Paths.get("BASELINE_BENCH.json")
    val baselineText: Option[String] =
      if (Files.exists(baselinePath)) Some(Files.readString(baselinePath))
      else None
    val baseKv: Map[String, Double] = baselineText.map { text =>
      """"([a-z0-9_]+)":\s*([0-9.]+)""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
    val baseCore: Seq[String] = baselineText.flatMap { text =>
      """"core":\s*\[([^\]]*)\]""".r.findFirstMatchIn(text).map { m =>
        "\"([a-z0-9_]+)\"".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSeq
      }
    }.getOrElse(Seq.empty)
    val rotationK: Int = baselineText.flatMap { text =>
      """"rotation_k":\s*([0-9]+)""".r.findFirstMatchIn(text)
        .map(_.group(1).toInt)
    }.getOrElse(3).max(1)
    // Every baseline-driven DECISION (degradation shrink, sweep-cost
    // prediction, vs_baseline) requires the run's config to match what
    // the baseline recorded — calibn measured on different core counts
    // or per-entry times from a different SF predict nothing. One flag,
    // checked everywhere baseKv feeds a decision.
    val baselineConfigMatches: Boolean = baselineText.exists { text =>
      val baseSf = """"sf":\s*"([^"]+)"""".r
        .findFirstMatchIn(text).map(_.group(1))
      val baseCpus = """"cpus":\s*"?([0-9]+)"?""".r
        .findFirstMatchIn(text).map(_.group(1))
      baseSf.contains(sfDir) && baseCpus.contains(cpus)
    }
    // ----- DEGRADED-TIER record (r20 verdict item 1): the same-substrate
    // denominator set recorded in r20 (BASELINE_BENCH_DEGRADED.json,
    // 276/276, 3 sweeps on the calibm~1.7x tier). Two uses: (a) on a
    // run with NO healthy sweep, any sample >= 3x its same-tier
    // denominator is a co-location-window artifact (r20's driver run
    // published 13-69x samples — agg_percentiles 70.5 s vs 1.53 tier —
    // that the run>>cpu stall signature missed because the window was
    // CPU-shaped); such samples are excluded from the headline ratios
    // and published under "tier_excluded". (b) "vs_degraded_tier" is
    // emitted beside vs_baseline so a degraded-host run has a
    // same-substrate comparison in the artifact itself.
    val tierPath = Paths.get("BASELINE_BENCH_DEGRADED.json")
    val tierText: Option[String] =
      if (Files.exists(tierPath)) Some(Files.readString(tierPath))
      else None
    val tierKv: Map[String, Double] = tierText.map { text =>
      """"([a-z0-9_]+)":\s*([0-9.]+)""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
    val tierConfigMatches: Boolean = tierText.exists { text =>
      val tSf = """"sf":\s*"([^"]+)"""".r
        .findFirstMatchIn(text).map(_.group(1))
      val tCpus = """"cpus":\s*"?([0-9]+)"?""".r
        .findFirstMatchIn(text).map(_.group(1))
      tSf.contains(sfDir) && tCpus.contains(cpus)
    }

    // ----- timed-catalog shard (round-12). Round index = max committed
    // BENCH_r{N}.json + 1 — deterministic, survives re-runs within a
    // round (same N → same shard → comparable re-runs).
    import scala.jdk.CollectionConverters._
    // SPARK_GRAFT_ROUND overrides the file-derived index — for
    // exercising a specific rotation group ahead of its round.
    val roundIdx: Int = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt)
      .getOrElse(Files.list(Paths.get(".")).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("BENCH_r\\d+\\.json") =>
          s.stripPrefix("BENCH_r").stripSuffix(".json").toInt }
        .maxOption.getOrElse(0) + 1)
    val benchAll = sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    // Rotation group advances +1 per committed TIMED slice, not by
    // round number (round-13 verdict item 6) and not by published
    // number alone (round-14 verdict item 1): a round with no artifact
    // (r12) must not make floorMod(roundIdx, k) skip a group, and a
    // round that published a group but DROPPED its slice (r14:
    // degraded_shard, core-only) must not make the next run advance
    // past entries that were never measured. [[nextRotationGroup]]
    // scans the artifacts newest-first — handling the driver wrapper's
    // quote-escaped "tail" form that r14's regex silently missed — and
    // advances from the newest artifact whose slice was actually
    // timed. SPARK_GRAFT_ROUND keeps its override meaning (exercise a
    // specific group ahead of its round); the round-index derivation
    // remains the fallback when no artifact records a timed group. The
    // derivation path is LOGGED: r14's fallback was silent, which is
    // exactly how a dead recovery regex survived a round unnoticed.
    // Artifact scan, newest first. Two sources (r20 verdict item 5):
    // the driver's committed BENCH_r{N}.json files (round = file name)
    // and the working tree's bench_out.json — the builder's most
    // recent run, which from r21 on self-describes its round via the
    // artifact's "round" field; a BENCH_ALL bench_out is a full-
    // catalog timed run and must advance the rotation group just like
    // a driver artifact would. Ordering: round DESC, BENCH_r file
    // preferred over bench_out at the same round (the driver runs
    // after the builder session ends, so its artifact is the later
    // one). A bench_out without a "round" field (pre-r21) cannot be
    // ordered and is ignored.
    val artifactRaws: Seq[String] = {
      val benchR = Files.list(Paths.get(".")).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("BENCH_r\\d+\\.json") =>
          (s.stripPrefix("BENCH_r").stripSuffix(".json").toInt, 1, s) }
        .toSeq
      val benchOut = {
        val p = Paths.get("bench_out.json")
        if (!Files.exists(p)) Seq.empty
        else {
          val text = scala.util.Try(Files.readString(p)).getOrElse("")
          """"round":\s*([0-9]+)""".r.findFirstMatchIn(text)
            .map(m => (m.group(1).toInt, 0, "bench_out.json")).toSeq
        }
      }
      (benchR ++ benchOut).sortBy(t => (-t._1, -t._2))
        .map { case (_, _, f) => scala.util.Try(
          Files.readString(Paths.get(f))).getOrElse("") }
    }
    val rotAge: Int = rotationAge(artifactRaws)
    val (rotationG, rotationSrc): (Int, String) = {
      val fromArtifacts =
        if (sys.env.contains("SPARK_GRAFT_ROUND")) None
        else nextRotationGroup(artifactRaws, rotationK)
      fromArtifacts.map((_, "artifact"))
        .getOrElse((math.floorMod(roundIdx, rotationK),
          if (sys.env.contains("SPARK_GRAFT_ROUND")) "env-override"
          else "floorMod-fallback"))
    }
    System.err.println(
      s"[bench] rotation group $rotationG derived via $rotationSrc")
    // Startup degradation probe (round-12): the r11 session ran BOTH
    // LCG probes at ~1.8x baseline before any repo code executed — on
    // such a host two full sweeps of the sharded catalog cannot fit
    // 470 s no matter how the harness is arranged. Measure the host
    // FIRST (the probes cost ~1 s total) and, when it reads badly
    // degraded, drop the rotation slice and time the CORE entries
    // only: a complete 2-sweep core artifact beats a 1-sweep sharded
    // one. The startup readings are published as "calib0" so a reader
    // sees the decision's evidence in the artifact.
    // MIN of two probes 3 s apart: a one-off startup blip (an sbt-host
    // GC, a compile-daemon tail) inflates one reading and passes; a
    // real bandwidth-starved window persists for minutes and inflates
    // both (observed: a genuinely starving host read 2.48x here and
    // 3.9x by sweep time — the shrink was correct).
    val calib0 = {
      // FRESH-JVM BIAS FIX (r22, the HostProbe r21 fix applied to the
      // bench's own startup probe): a cold JVM's first calibrateMem
      // readings run 1.5-2.2x the warmed value (probe-array
      // allocation/paging and GC settling bill as bandwidth), so
      // calib0 over-fired the startup-degraded core-only shard on
      // healthy hosts (r21 carry item: startup 0.045 vs in-sweep
      // 0.022). Two discarded warm-up triples bring the instruments
      // to the steady state the 1.5x/1.6x thresholds were calibrated
      // on; the measured min-of-two pair below is unchanged.
      calibrate(1); calibrate(cpus.toInt); calibrateMem()
      calibrateMem()
      Thread.sleep(1000)
      val a = (calibrate(1), calibrate(cpus.toInt), calibrateMem())
      Thread.sleep(3000)
      val b = (calibrate(1), calibrate(cpus.toInt), calibrateMem())
      (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3))
    }
    // Two hazards, two probes: the LCG factor sees CPU contention; the
    // bandwidth factor sees the starvation mode the LCG is BLIND to
    // (cache-resident — a starved host has read 0.1-1.9 GB/s with LCG
    // probes within 15% of baseline). Memory readings are noisier, so
    // its threshold is wider.
    val degradeCpu =
      if (!baselineConfigMatches) 1.0
      else baseKv.get("calibn_sec").filter(_ > 0)
        .map(calib0._2 / _).getOrElse(1.0)
    val degradeMem =
      if (!baselineConfigMatches) 1.0
      else baseKv.get("calibm_sec").filter(_ > 0)
        .map(calib0._3 / _).getOrElse(1.0)
    val degradeFactor = math.max(degradeCpu, degradeMem)
    // `degraded` is a DECISION, revisited once after warm-up (the heal
    // block below): the startup probe fires while the sbt/compile tail
    // is still settling, so it over-detects (r14: calib0 1.75x, both
    // sweeps then AT baseline — the rotation slice was dropped for
    // nothing, r14 verdict item 5).
    //
    // r19: the mem threshold dropped 5.0 -> 1.6. The r18 final run's
    // degradation mode was ALU-flat / bandwidth-2.0x — the old
    // threshold never fired, the full 158-entry shard was attempted
    // on a starved host, and the driver got a partial artifact with
    // 140 cold timings. calibm is noisier than the LCG (hence wider
    // than the 1.5x CPU bar) but the min-of-two-probes estimator
    // absorbs one-off spikes; sustained 1.6x bandwidth means warmed
    // entries will read ~1.2x+ anyway, so a core-only shard (plus the
    // heal revisit when the window passes) is the right spend.
    var degraded = !benchAll && (degradeCpu > 1.5 || degradeMem > 1.6)
    var shardHealed = false
    def inRotation(n: String): Boolean =
      math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(n), rotationK) == rotationG
    def shardNames(dropRotation: Boolean): Seq[String] =
      if (benchAll || baseCore.isEmpty) names
      else {
        val core = baseCore.toSet
        // entries with no baseline record are NEW this round: always
        // time them, so fresh code gets a number the round it lands
        val known = baseKv.keySet
        names.filter(n => core(n) || !known(n) ||
          (!dropRotation && inRotation(n)))
      }
    var timedNames: Seq[String] = shardNames(dropRotation = degraded)
    // this round's rotation slice — the entries whose staleness the
    // rotation exists to bound; "rotation_timed" in the artifact is
    // the fact the next run's group-advance decision needs
    val rotationSlice: Seq[String] =
      if (benchAll || baseCore.isEmpty) Seq.empty
      else names.filter(n => !baseCore.contains(n) &&
        baseKv.contains(n) && inRotation(n))
    val baseCalN: Option[Double] =
      if (baselineConfigMatches) baseKv.get("calibn_sec").filter(_ > 0)
      else None
    val baseCalM: Option[Double] =
      if (baselineConfigMatches) baseKv.get("calibm_sec").filter(_ > 0)
      else None
    // ratio vs the baseline's probe; 1.0 (always healthy) when no
    // config-matched baseline exists to compare against
    def calNRatio(c: Double): Double = baseCalN.map(c / _).getOrElse(1.0)
    def calMRatio(c: Double): Double = baseCalM.map(c / _).getOrElse(1.0)
    // A probe triple reads degraded when EITHER the ALU probe (>1.5x)
    // or the bandwidth probe (>1.6x) is off baseline (r19: the mem
    // check is new — the r18 mode was ALU-flat/bandwidth-2x and every
    // ALU-only health gate passed while sweeps measured starvation)
    def probeDegraded(c: (Double, Double, Double)): Boolean =
      calNRatio(c._2) > 1.5 || calMRatio(c._3) > 1.6
    def probeCal(): (Double, Double, Double) = {
      val a = (calibrate(1), calibrate(cpus.toInt), calibrateMem())
      Thread.sleep(2000)
      val b = (calibrate(1), calibrate(cpus.toInt), calibrateMem())
      (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3))
    }
    System.err.println(f"[bench] round $roundIdx: timing " +
      f"${timedNames.size}/${names.size} entries (core ${baseCore.size}, " +
      f"rotation group $rotationG/$rotationK" +
      (if (benchAll) ", BENCH_ALL" else "") +
      (if (degraded) f", DEGRADED host ${degradeFactor}%.2fx: core only"
       else "") + ")")

    // Stage-attribution listener: when a timed query stalls, the log
    // must say WHERE (driver wait vs task CPU vs task count) — the
    // session-pressure windows move between runs and are unreproducible
    // in quiet profiling, so the evidence has to come from the run
    // that hit them.
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Single-task scale-defect detector: entries recorded here had a
    // ≥ 3 s stage running as ONE task during their timed run — the
    // shape that cannot scale out (r10's 466 s CC stage, r11's 1-file
    // CSV write). Reported as "single_task" in the artifact.
    // Attribution is POST-HOC by wall-clock window, not by reading a
    // current-entry variable at event time: listener events arrive on
    // the AsyncEventQueue thread, which can lag the driver past the
    // end of a run — an event-time lookup can blame the NEXT entry
    // (or drop the finding) exactly when a heavy final stage is the
    // thing being reported. The listener records (midpointMs, raw
    // line); timed runs record their [start, end] windows; the
    // artifact joins the two at the end, when the bus has drained.
    val singleTaskEvents =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    // Numeric stage costs for the STALL-MODE detector (r19 verdict
    // item 1b): (midpointMs, runSec, cpuSec) for every ≥ 2 s stage.
    // The canonical substrate-stall signature — pinned by the r19 CC
    // attribution (stage run 134.6 s, cpu 8.9 s, ALU probes flat) —
    // is task wall-clock ≫ task CPU: threads parked on block-manager
    // / IO waits, not executing plans. Attribution is post-hoc by
    // timed window, same scoping as single_task.
    val stageCostEvents =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Double)]()
    val timedWindows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def newSession(): SparkSession = {
      val s = buildSession()
      s.sparkContext.setLogLevel("WARN")
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = sc.stageInfo
            val dur = (for { a <- i.completionTime; b <- i.submissionTime }
              yield a - b).getOrElse(-1L)
            if (dur >= 2000) {
              val m = i.taskMetrics
              stageLog.add(f"stage ${i.stageId} real ${dur / 1000.0}%.1f s " +
                f"tasks=${i.numTasks} cpu=${m.executorCpuTime / 1e9}%.1f " +
                f"run=${m.executorRunTime / 1e3}%.1f " +
                f"gc=${m.jvmGCTime / 1e3}%.1f")
            }
            if (dur >= 3000 && i.numTasks == 1)
              i.completionTime.foreach(end =>
                singleTaskEvents.add((end - dur / 2,
                  f"stage ${i.stageId} ${dur / 1000.0}%.1f s")))
            if (dur >= 2000) {
              val m = i.taskMetrics
              i.completionTime.foreach(end =>
                stageCostEvents.add((end - dur / 2,
                  m.executorRunTime / 1e3, m.executorCpuTime / 1e9)))
            }
          }
        })
      s
    }
    var spark = newSession()
    // Per-query deadline (round-11, verdict item 5): one pathological
    // entry must never zero out a whole sweep again (r10: a single
    // 466 s entry burned the entire 470 s budget → partial artifact,
    // 0 sweeps). The watchdog cancels the query's job group REPEATEDLY
    // (period 2 s) once the deadline passes — a single cancel can land
    // between two of an iterative entry's jobs and miss. A deadlined
    // entry records its elapsed time (~deadline) as a LOWER BOUND —
    // still counted in totals and vs_baseline so the artifact can't
    // look better by dropping its worst entries — and is listed under
    // "deadlined" in the JSON.
    val queryDeadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_DEADLINE_SEC", "120").toDouble
    val deadlined =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val watchdog = new java.util.Timer("bench-deadline", true)
    val groupSeq = new java.util.concurrent.atomic.AtomicLong()
    // `attribute`: stage-attribution diagnostics share ONE queue, so
    // they are only meaningful when queries run serially — the timed
    // sweeps. The 8-thread warm-up passes false (clears would race
    // with other threads' appends and misattribute stages).
    // `cancelSink`: when a NON-attributed (warm) run is deadline-
    // cancelled, its name lands here — the warm pass's caller must
    // treat a cancelled warm as NOT warmed (r19 ADVICE: an entry whose
    // warm runOnce was cancelled mid-execution is partially warmed yet
    // was absent from the skipped list, a residual cold-timed path).
    def runOnce(name: String, dir: String, attribute: Boolean,
        deadlineSec: Double = queryDeadlineSec,
        cancelSink: java.util.Set[String] = null): Double = {
      if (attribute) stageLog.clear()
      val wall0 = System.currentTimeMillis()
      val group = s"bench-$name-${groupSeq.incrementAndGet()}"
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      @volatile var killed = false
      val killer = new java.util.TimerTask {
        override def run(): Unit = {
          killed = true
          spark.sparkContext.cancelJobGroup(group)
        }
      }
      watchdog.schedule(killer, (deadlineSec * 1000).toLong, 2000L)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        killer.cancel()
        spark.sparkContext.clearJobGroup()
        if (attribute)
          timedWindows.add((name, wall0, System.currentTimeMillis()))
        if (killed) {
          // Only a TIMED run's cancellation is a reportable deadline:
          // the concurrent warm-up runs 8 heavy entries at once, so a
          // warm-up cancellation measures contention, not the query
          // (r11: a 2.4 s entry was flagged from its warm-up run).
          if (attribute) deadlined.add(name)
          else if (cancelSink != null) cancelSink.add(name)
          System.err.println(f"[bench] $name hit the per-query deadline " +
            f"($deadlineSec%.0f s): cancelled" +
            (if (attribute) ", recording lower bound" else " (warm-up)"))
          return (System.nanoTime() - t0) / 1e9
        }
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      killer.cancel()
      spark.sparkContext.clearJobGroup()
      val sec = (System.nanoTime() - t0) / 1e9
      if (attribute) {
        timedWindows.add((name, wall0, System.currentTimeMillis()))
        if (sec >= 3.0) {
          System.err.println(
            s"[bench] slow $name ${math.rint(sec * 10) / 10} s: " +
              stageLog.asScala.mkString("; "))
        }
      }
      sec
    }

    // Recorded-cost rank, shared by warm-up (descending: warm the
    // expensive first) and sweep order (ascending: time the cheap
    // first): the MAX time ever recorded per entry across the round
    // artifacts in the repo (BENCH_r*.json / bench_out.json, scraped
    // with the baseline's regex — stale highs are fine, they mark
    // expensive code paths). Unrecorded (new) entries rank by the
    // heavy-prefix heuristic.
    val costRank: String => Double = {
      val heavyPrefixes = Seq("dedup_", "decontam_", "graph_", "basket_",
        "anomaly_", "sample_cap", "corpus_", "multimodal_", "pipeline_")
      val kv = """"([a-z0-9_]+)":\s*([0-9.]+)""".r
      val recorded: Map[String, Double] = Files.list(Paths.get("."))
        .iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.matches("BENCH_r\\d+\\.json") || n == "bench_out.json"
        }.toSeq
        .flatMap { p =>
          val text = scala.util.Try(Files.readString(p)).getOrElse("")
          kv.findAllMatchIn(text)
            .map(m => m.group(1) -> m.group(2).toDouble)
        }.groupMapReduce(_._1)(_._2)(math.max)
      n => recorded.getOrElse(n,
        if (heavyPrefixes.exists(n.startsWith)) 5.0 else 0.0)
    }
    var unwarmed = -1
    // Entries the warm deadline left cold and that were therefore
    // DROPPED from the timed set (r19): published so a reader can see
    // what a shrunk artifact does not cover.
    var warmDropped = 0
    var budgetDropped = 0
    // Concurrent warm pass over `entries` (8 threads, costliest first
    // within each `priority` tier — LOWER tiers warm first, so when
    // the deadline truncates, the un-warmed tail is the highest tier;
    // hard deadline `budget`); returns the names left un-warmed. Used
    // by the main warm-up and by the shard-heal block's warm of the
    // restored rotation entries.
    //
    // Costliest first, DATA-DRIVEN: when the deadline truncates the
    // warm-up, the un-warmed tail must be the CHEAP entries
    // (first-run codegen ~1 s each, shed by the sweep median), never
    // the iterative / gram-join entries whose cold first run costs
    // 10-60 s inside a timed sweep. A static prefix list proved
    // luck-dependent (r11: two runs with the same budget warmed
    // different subsets; the one that missed dedup_cluster_cc paid
    // 55 s for it in sweep 1 and the sweep blew the budget).
    // Per-entry OBSERVED warm wall-times (r19 verdict item 1a): the
    // probes are blind to the block-manager/IO stall mode (ALU and
    // bandwidth read near-baseline while task threads park — the
    // driver's r19 run published drift 1.05/1.29 around 50-145x entry
    // samples), so the only instrument that sees a stall window is
    // the work itself. The warm pass IS that instrument: its per-entry
    // costs feed the post-warm fit-shrink and the mid-warm abort.
    val warmObserved =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
    def warmConcurrent(entries: Seq[String], dir: String,
        budget: Double,
        priority: String => Int = _ => 0): Seq[String] = {
      val w0 = System.nanoTime()
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      entries.sortBy(n => (priority(n), -costRank(n))).foreach(queue.add)
      // Deadline-cancelled warms are NOT warmed (r19 ADVICE): collect
      // them and return them with the leftovers so the caller's
      // never-time-cold drop covers the partially-warmed path too.
      val cancelled =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      // Mid-warm stall abort (r19 verdict item 1a): when the last 6
      // COMPLETED warms each ran >= 10x their baseline cost (8-way
      // warm contention on a healthy host reads 2-4x; the r19 stall
      // windows read 20-145x), the host is inside a stall window —
      // stop warming so the window shrinks the timed set instead of
      // eating the sweeps' budget. Ratio floor 0.2 s on the base cost
      // keeps sub-100ms entries' jitter out of the signal. Only armed
      // when the baseline credibly prices the entries, and NEVER under
      // BENCH_ALL (r20 tier run: a stall window at warm time aborted
      // the pass 51 s into a 900 s budget and 261 entries entered
      // sweep 1 cold — a re-record run has an operator-sized budget
      // and exists to produce WARMED numbers; for it, warming through
      // the window is strictly better than cold sweeps).
      val stallStreak = new java.util.concurrent.atomic.AtomicInteger(0)
      // Completed-warm counter for the COLD-START GRACE (r21): the
      // first 8-thread waves of a fresh session warm the costliest
      // entries while whole-stage codegen floods the C2 queue — on a
      // HEALTHY host this session's launch-adjacent warms read 14-55 s
      // against 0.5-2.6 s baselines (10-30x), tripping the streak and
      // cold-dropping ~100 entries twice in one session. A stall
      // WINDOW persists; the launch transient by construction hits
      // only the first warms. Warms count toward the streak only
      // after 16 have completed (two full 8-thread waves).
      val warmsDone = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var stallAbort = false
      val stallAbortArmed = !benchAll
      val warmThreads = (1 to 8).map { _ =>
        new Thread(() => {
          // NO unpersist in here: warm-up entries run CONCURRENTLY, and
          // a blanket getPersistentRDDs unpersist from one thread
          // destroys another thread's in-flight localCheckpoint blocks
          // (observed: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Blocks
          // accumulated by the warm-up are dropped wholesale by the
          // post-warm-up session restart.
          // budget check BEFORE poll: polling first and then testing
          // the budget let a thread exit holding an entry that was
          // neither run nor re-queued — absent from the returned
          // skipped list yet cold, up to 8 entries (one per thread)
          // silently leaking past the never-time-cold drop
          var n: String =
            if (!stallAbort && (System.nanoTime() - w0) / 1e9 < budget)
              queue.poll()
            else null
          while (n != null) {
            // Per-entry deadline = REMAINING warm budget (+30 s
            // grace, floor 40 s). A short FLAT deadline was tried
            // (45 s) and made the bench worse — it cancelled the
            // heavy iterative entries mid-run under 8-way contention
            // and they entered sweep 1 cold, paying 20-50x
            // (dedup_cluster_cc 48.6 s cold vs 2.0 s warmed). With
            // costliest-first ordering the expensive entries start
            // EARLY and get effectively the full deadline; only
            // stragglers started near the budget edge are clipped, so
            // the warm-up cannot stretch its budget while the
            // entries that matter still warm fully.
            val remain = budget - (System.nanoTime() - w0) / 1e9
            val e0 = System.nanoTime()
            runOnce(n, dir, attribute = false,
              deadlineSec = math.min(queryDeadlineSec,
                math.max(40.0, remain + 30.0)),
              cancelSink = cancelled)
            val warmSec = (System.nanoTime() - e0) / 1e9
            if (!cancelled.contains(n)) warmObserved.put(n, warmSec)
            val graceOver = warmsDone.incrementAndGet() > 16
            baseKv.get(n)
              .filter(_ => baselineConfigMatches && stallAbortArmed &&
                graceOver)
              .foreach { b =>
                // absolute >= 5 s floor (r20 ADVICE): cost-descending
                // warm order clusters sub-100 ms entries at the tail,
                // and 6 of them at ~2 s each (codegen/JIT + 8-way
                // contention) would satisfy the ratio test on a
                // healthy host; a real stall window inflates entries
                // to tens of seconds, far past the floor
                if (warmSec >= 5.0 && warmSec >= 10.0 * math.max(b, 0.2)) {
                  if (stallStreak.incrementAndGet() >= 6 && !stallAbort) {
                    stallAbort = true
                    System.err.println(f"[bench] MID-WARM STALL: 6 " +
                      "consecutive warms at >= 10x baseline — aborting " +
                      "the warm pass, remaining entries drop cold")
                  }
                } else stallStreak.set(0)
              }
            // Per-entry warm wall-time (r16 verdict item 2): when the
            // deadline truncates a warm pass, the log must say what
            // consumed the budget — r16 hit the 100 s deadline having
            // warmed only 68 of 159 entries and nothing recorded why.
            System.err.println(f"[bench] warm $n $warmSec%.1f s (pass " +
              f"${(System.nanoTime() - w0) / 1e9}%.1f/$budget%.0f s)")
            n = if (!stallAbort &&
                  (System.nanoTime() - w0) / 1e9 < budget) queue.poll()
                else null
          }
        })
      }
      warmThreads.foreach(_.start())
      warmThreads.foreach(_.join())
      (queue.iterator().asScala.toList ++ cancelled.asScala.toList).distinct
    }
    locally {
      val w0 = System.nanoTime()
      // Hard deadline: the concurrent warm-up's wall time is high-
      // variance (observed 46 s to 321 s for the same catalog — eight
      // job-submitting threads can convoy on the DAGScheduler event
      // loop), and an unlucky warm-up must never eat the sweeps'
      // budget. Only the TIMED shard is warmed (round-12: warming the
      // rotation groups that won't be timed this round bought
      // nothing and cost ~30% of the warm-up budget). Entries left
      // un-warmed pay their first-run cost inside sweep 1 once; the
      // cross-sweep lower-median sheds it.
      //
      // The deadline is ADAPTIVE (r16 verdict item 2): the flat 100 s
      // cap left 91 of 159 entries cold in r16, and the cold first
      // runs inside sweep 1 produced a broad 1.3-1.7x elevation band
      // plus one 3.8x driver flag (`multimodal_gif_frames` — profiled
      // at 0.599 s isolated, i.e. the flag was entirely a warm-up
      // artifact). A truncated warm-up does not even save budget: the
      // skipped entries' first-run cost is paid anyway, serially,
      // INSIDE the measured sweep. So give the warm pass every second
      // the sweep arithmetic does not need: reserve restart + settle +
      // quiesce (~75 s), calibration (~6 s), two predicted sweeps
      // (baseline-driven with the same 1.3x headroom as the
      // feasibility check, scaled by the startup probe's session
      // factor), the inter-sweep gap (~30 s) and 25 s slack; the
      // remainder is the warm budget, floored at the old 100 s and
      // capped at 240 s (~the 8-thread cost of warming a full
      // 236-entry catalog; beyond that a warm pass is soaking up a
      // degraded host, not doing JIT work). Env override wins.
      val warmBudget = sys.env.get("SPARK_GRAFT_WARMUP_BUDGET_SEC")
        .map(_.toDouble).getOrElse {
          val known = timedNames.flatMap(baseKv.get)
          val covered = baselineConfigMatches &&
            known.size >= timedNames.size * 0.9
          // entries absent from the baseline (new this round — the
          // 0.9 gate admits up to 10% of them) still cost two timed
          // runs each; pricing them at ZERO overstated the spare
          // budget by their real sweep cost, so price each uncovered
          // entry at the MEDIAN covered cost instead
          val median =
            if (known.isEmpty) 0.0
            else known.toSeq.sorted.apply(known.size / 2)
          val baseSum = known.sum + (timedNames.size - known.size) * median
          if (covered && baseSum > 0) {
            // worst of the ALU and bandwidth probe drifts (r19): the
            // r18 host was ALU-flat / bandwidth-2x, and a CPU-only
            // factor under-reserved the sweeps by the same 2x. The
            // 0.8 floor sits OUTSIDE the max (r19 ADVICE: with calibn
            // absent and a faster-than-baseline bandwidth probe, an
            // inner-floored CPU branch of 1.0 vs a mem branch of 0.6
            // still combined below the floor's intent)
            val sessionFactor = math.max(0.8, math.max(
              baseCalN.map(calib0._2 / _).getOrElse(1.0),
              baseCalM.map(calib0._3 / _).getOrElse(1.0)))
            val reserved =
              75.0 + 6.0 + 2 * 1.3 * sessionFactor * baseSum + 30.0 + 25.0
            math.max(100.0, math.min(240.0, budgetSec - elapsedSec - reserved))
          } else 100.0
        }
      // Rotation entries warm LAST (r19): when the deadline truncates
      // the pass, the cold tail must be the droppable tier — core and
      // new-this-round entries are what the artifact exists to
      // measure, the rotation slice just has its staleness bounded
      // and can wait a round.
      val rotationSet = rotationSlice.toSet
      val skippedNames = warmConcurrent(timedNames, warmDir, warmBudget,
        priority = n => if (rotationSet(n)) 1 else 0)
      val skipped = skippedNames.size
      unwarmed = skipped
      // Never time a cold entry (r19, verdict item 2b): the r18 run
      // timed 140 cold entries on a starved host and the artifact
      // measured JIT/IO warm-up, not plans. Entries the warm deadline
      // skipped are dropped from the timed set — a complete warmed
      // 60-entry artifact beats 158 cold timings (the r12 "core-only
      // beats sharded" principle applied to warm-up). BENCH_ALL keeps
      // the old behavior: re-record runs need full coverage and run
      // under an operator-sized budget.
      if (!benchAll && skipped > 0) {
        val dropSet = skippedNames.toSet
        timedNames = timedNames.filterNot(dropSet)
        warmDropped = skipped
        unwarmed = 0
        System.err.println(s"[bench] $skipped un-warmed entries DROPPED " +
          s"from the timed set (never time cold): " +
          skippedNames.sorted.take(12).mkString(",") +
          (if (skipped > 12) ",..." else ""))
      }
      // Second warm pass over the costliest entries when the first
      // pass finished under budget: one warm execution is NOT enough
      // for the codec/kernel-heavy entries — r16's `multimodal_gif_
      // frames` read 3.8x after its cold sweep-1 run failed to warm it
      // for sweep 2, and quiet EntryProfile reps show the same shape
      // (run 2 at 0.76 s vs run 4+ at 0.58 s). Leftover warm budget
      // buys those entries their run-3 warmth where it is untimed.
      val warmRemain = warmBudget - (System.nanoTime() - w0) / 1e9
      // pass-2 cut count is LOGGED (r17 ADVICE): it does not feed
      // `unwarmed` — those entries did warm once — but a
      // partially-completed second pass must be distinguishable from a
      // full one when reconstructing warm-state provenance from the log
      var pass2Cut = 0
      if (skipped == 0 && warmRemain > 25.0) {
        val top = timedNames.sortBy(n => -costRank(n)).take(16)
        pass2Cut = warmConcurrent(top, warmDir, warmRemain).size
      }
      System.err.println(f"[bench] warm-up sweep ($warmDir, 8 threads, " +
        f"budget $warmBudget%.0f s) " +
        f"${(System.nanoTime() - w0) / 1e9}%.1f s; elapsed $elapsedSec%.1f s" +
        (if (skipped > 0) s"; $skipped entries un-warmed (deadline)" else "") +
        (if (pass2Cut > 0) s"; second warm pass cut $pass2Cut entries " +
          "short (deadline)" else ""))
    }

    // SESSION RESTART, once (round-11 introduced it per-sweep; round-12
    // keeps exactly one, after warm-up): `getPersistentRDDs.unpersist`
    // only drops blocks whose RDDs are still registered — the
    // localCheckpoint / broadcast blocks of ~200 already-finished
    // warm-up executions are dead-but-STRONGLY-HELD by the
    // BlockManager store with the cleaner off, so sweep 1 would start
    // on a nearly-full old gen and heavy entries GC-thrash (observed:
    // a stage with executorRun 112 s of which jvmGCTime 100.7 s,
    // calibration probes all normal). Stopping the context releases
    // the entire store wholesale; what must survive a restart DOES
    // survive: JIT-compiled code and the JVM-static generated-class
    // cache (codegen.cache lives in object CodeGenerator, not the
    // session). Re-planning per entry costs ~0.1-0.3 s, identical for
    // every run. The heap at sweep 1's start is thereby deterministic.
    spark.stop()
    spark = newSession()
    System.gc()
    // Settle pass: the fresh session's first queries absorb its
    // init + compile storm — the r11 run that restarted and then
    // timed cheapest-first showed a consecutive stretch of ~dozen
    // sub-second entries reading 7-14 s each (stage run-time 4x
    // their CPU: task threads waiting out compiler/init threads),
    // and the pre-sweep JIT quiesce can't see it because compilation
    // only STARTS when queries run. Three median-cost entries run
    // untimed first and eat that storm; the extra warmth they gain is
    // what warm-up intends for every entry anyway.
    locally {
      val settle =
        timedNames.sortBy(costRank).drop(timedNames.size / 2).take(3)
      settle.foreach(n =>
        runOnce(n, sfDir, attribute = false, deadlineSec = 15.0))
    }
    // Startup-degraded shard HEAL (r14 verdict item 5): the r14 run's
    // calib0 read 1.75x so the rotation slice was dropped at startup —
    // then BOTH sweeps calibrated at baseline and the run finished
    // with 241 s of slack; the two r13-flagged entries sitting in that
    // slice went unmeasured for nothing. The startup probe fires ~30 s
    // after an sbt compile storm and over-detects; the decision is
    // revisited exactly ONCE, here — after warm-up + restart + settle,
    // the last untimed point before sweep 1 — and the slice is
    // restored when (a) the host now probes healthy (same 1.5x CPU /
    // 1.6x mem thresholds as the startup test, r19) and (b) the budget
    // arithmetic fits: restored-entry warm pass + quiesce/probe
    // overhead + two predicted FULL-shard sweeps + inter-sweep gap.
    // Restored entries get a short concurrent warm so they don't enter
    // sweep 1 cold (they were excluded from the main warm-up).
    if (degraded && !benchAll && baseCore.nonEmpty) {
      val re = probeCal()
      val reCpu = baseCalN.map(re._2 / _).getOrElse(1.0)
      val reMem = baseCalM.map(re._3 / _).getOrElse(1.0)
      val full = shardNames(dropRotation = false)
      val restored = full.filterNot(timedNames.toSet)
      val baseSumFull = full.flatMap(baseKv.get).sum
      val covered = baselineConfigMatches &&
        full.count(baseKv.contains) >= full.size * 0.9
      val estSweep =
        if (covered && baseSumFull > 0)
          // worst of the two drifts, like every other sweep predictor
          // (a reMem=1.55 host under both heal thresholds would
          // otherwise under-predict the restored sweeps ~1.55x)
          Some(1.3 * math.max(0.8, math.max(reCpu, reMem)) * baseSumFull)
        else None // no credible predictor -> no heal (conservative)
      val healWarmBudget = 45.0
      if (healFits(reCpu, reMem, restored.size, estSweep, elapsedSec,
          healWarmBudget, budgetSec)) {
        System.err.println(f"[bench] startup degradation HEALED (cal " +
          f"now $reCpu%.2fx cpu / $reMem%.2fx mem): restoring " +
          f"${restored.size} rotation entries, warm <= " +
          f"$healWarmBudget%.0f s")
        timedNames = full
        degraded = false
        shardHealed = true
        // restored entries the heal warm pass could not cover are
        // dropped again, same never-time-cold rule as the main pass
        val healSkipped = warmConcurrent(restored, sfDir, healWarmBudget)
        if (healSkipped.nonEmpty) {
          val dropSet = healSkipped.toSet
          timedNames = timedNames.filterNot(dropSet)
          warmDropped += healSkipped.size
          System.err.println(s"[bench] heal warm pass left " +
            s"${healSkipped.size} entries cold: dropped from timed set")
        }
      } else {
        System.err.println(f"[bench] startup degradation stands (cal " +
          f"$reCpu%.2fx/$reMem%.2fx, restorable=${restored.size}, " +
          f"est_sweep=${estSweep.fold("n/a")(e => f"$e%.0f s")}, " +
          f"elapsed=$elapsedSec%.0f s): core-only shard kept")
      }
    }
    // Post-warm budget fit (r19, verdict item 2b): even a fully-warmed
    // timed set can blow the budget on a degraded host — warmed
    // entries on the r18 bandwidth-starved box ran 1.2-2x their
    // baseline, so two sweeps of 158 entries could not fit where the
    // startup arithmetic (healthy-host costs) said they would. Predict
    // the two sweeps from the baseline per-entry costs scaled by the
    // WORST current probe drift (ALU and bandwidth — the r18 mode was
    // ALU-flat/bandwidth-2x, invisible to a CPU-only factor) and, when
    // they don't fit, drop entries rotation-first / costliest-first
    // until they do. The artifact stays COMPLETE over what it times;
    // "budget_dropped" records what it chose not to cover.
    if (!benchAll && baselineConfigMatches) {
      val fit = probeCal()
      val fCpu = baseCalN.map(fit._2 / _).getOrElse(1.0)
      val fMem = baseCalM.map(fit._3 / _).getOrElse(1.0)
      val factor = math.max(0.8, math.max(fCpu, fMem))
      val known = timedNames.filter(baseKv.contains)
      if (known.size >= timedNames.size * 0.9 && known.nonEmpty) {
        val costs = known.map(baseKv).sorted
        val median = costs(costs.size / 2)
        def cost(n: String): Double = baseKv.getOrElse(n, median)
        // OBSERVED-cost arm (r19 verdict item 1a): the probes are
        // blind to the block-manager stall mode (the r19 driver run
        // published drift 1.05/1.29 around 50-145x entry samples), so
        // the predictor also reads what the warm pass just MEASURED.
        // Divide the 8-way-contended warm wall-time by 3 (healthy
        // contention inflates 2-4x, so /3 ~ solo cost; a stalled 60 s
        // warm still predicts 20 s >> baseline) and take the worse of
        // the probe-scaled baseline and the observed estimate.
        def effCost(n: String): Double = math.max(factor * cost(n),
          Option(warmObserved.get(n)).map(_.doubleValue / 3.0)
            .getOrElse(0.0))
        // 45 s overhead: pre-sweep quiesce + both sweeps' pre/post
        // probe pairs + the inter-sweep unpersist/gc/quiesce gap
        def fits(set: Seq[String]): Boolean =
          elapsedSec + 45.0 + 2 * 1.3 * set.map(effCost).sum <=
            budgetSec
        if (!fits(timedNames)) {
          val rotationSet = rotationSlice.toSet
          val kept = shrinkToBudget(timedNames,
            isCore = n => !rotationSet(n), cost = effCost, fits = fits)
          budgetDropped = timedNames.size - kept.size
          System.err.println(f"[bench] predicted 2-sweep cost exceeds " +
            f"remaining budget (probe drift $factor%.2fx, observed-warm " +
            f"arm armed, elapsed " +
            f"$elapsedSec%.0f/$budgetSec%.0f s): dropping $budgetDropped " +
            f"entries (rotation-first) -> ${kept.size} timed")
          timedNames = kept
        }
      }
    }
    // JIT quiesce, ADAPTIVE (round-11): the concurrent warm-up
    // generates hundreds of whole-stage-codegen classes and queues
    // them for C2; if sweep 1 starts while 16 compiler threads are
    // still chewing the queue, entries run partially INTERPRETED on a
    // compiler-taxed machine (observed: one session's sweep 1 at
    // 286 s vs another's 114 s, same code, same coverage — slow
    // entries showing the same stages at ~10x CPU). Wait until the
    // JVM's total compilation time stops advancing (<400 ms of
    // compiler work across a 2 s window, 3 windows in a row), capped
    // — time spent here is untimed and buys back multiples of itself
    // inside the sweep.
    def jitQuiesce(capSec: Double): Unit = {
      Thread.sleep(4000) // GC/unpersist settling
      val mx = java.lang.management.ManagementFactory.getCompilationMXBean
      if (mx == null || !mx.isCompilationTimeMonitoringSupported)
        Thread.sleep(8000)
      else {
        val q0 = System.nanoTime()
        var prev = mx.getTotalCompilationTime
        var quiet = 0
        while (quiet < 3 && (System.nanoTime() - q0) / 1e9 < capSec) {
          Thread.sleep(2000)
          val cur = mx.getTotalCompilationTime
          if (cur - prev < 400) quiet += 1 else quiet = 0
          prev = cur
        }
        System.err.println(f"[bench] JIT quiesce wait " +
          f"${(System.nanoTime() - q0) / 1e9}%.1f s")
      }
    }

    // Degraded-sweep self-exclusion (round-13 verdict item 2): the r13
    // artifact's sweep 2 calibrated at 13x baseline (co-located load
    // began mid-run), silently turning min-of-2 into min-of-1 — the
    // harness detected degradation at STARTUP (calib0) but not
    // mid-run. Now every sweep is health-checked against the baseline
    // calibn_sec both BEFORE and AFTER it runs (degradation can begin
    // mid-sweep); a sweep reading >1.5x on either probe has its
    // samples FLAGGED, is listed under "degraded_sweeps", and a
    // replacement sweep runs if the feasibility arithmetic says it
    // fits (at most one — the budget bounds retries). Published
    // numbers prefer healthy samples; if NO sweep is healthy the
    // flagged samples are still published (marked) rather than
    // publishing nothing.
    val samples =
      scala.collection.mutable.Map.empty[String, List[(Double, Boolean)]]
    val sweepCals =
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    val sweepCalsPost =
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    val sweepHealthy = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val degradedSweeps = scala.collection.mutable.ArrayBuffer.empty[Int]
    var sweepsCompleted = 0
    var healthySweeps = 0
    var partial = false
    var lastSweepSec = 0.0
    val maxAttempts = nSweeps + 1 // at most ONE replacement sweep
    // Warm-sweep cost predictor, shared by the pre-sweep feasibility
    // check and the post-degradation-wait recheck. BASELINE-driven,
    // not last-sweep-driven (round-12): sweep 1 absorbs the first-run
    // cost of every entry the warm-up deadline skipped, so
    // `1.2 x lastSweepSec` over-predicts a WARM sweep 2 by 2-3x. A
    // warm sweep's best predictor is the baseline's per-entry sum over
    // the timed set, scaled by how much slower THIS session runs the
    // fixed CPU probe, with 1.3x headroom; falls back to 1.2x last
    // sweep when the baseline doesn't cover the timed set.
    def predictNextSweepSec(): Double = {
      val baseSum = timedNames.flatMap(baseKv.get).sum
      val covered = baselineConfigMatches &&
        timedNames.count(baseKv.contains) >= timedNames.size * 0.9
      // session factor from the last HEALTHY pre-sweep probe when one
      // exists: a mid-sweep degradation window (post-probe flagged)
      // must not veto the replacement sweep that exists to redo its
      // samples
      val lastGoodCal = sweepCals.zip(sweepHealthy)
        .collect { case (c, true) => c }.lastOption
        .orElse(sweepCals.lastOption)
      // worst of the ALU and bandwidth drifts (r19): a CPU-only factor
      // under-predicted the r18 bandwidth-starved sweeps by ~2x
      val sessionFactor = math.max(
        baseCalN.flatMap(b => lastGoodCal.map(c => c._2 / b))
          .getOrElse(1.0),
        baseCalM.flatMap(b => lastGoodCal.map(c => c._3 / b))
          .getOrElse(1.0)).max(0.8)
      if (covered && baseSum > 0) 1.3 * sessionFactor * baseSum
      else lastSweepSec * 1.2
    }
    // Attempts that ran NO samples (persistent pre-sweep degradation
    // with a healthy sweep in hand) are reported separately from
    // degraded_sweeps: a skipped attempt has no row in sweep_cals /
    // sweep_cals_post, so listing it under degraded_sweeps would
    // mis-index readers correlating the three arrays (r14 ADVICE).
    val skippedSweeps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sweepLoop = new scala.util.control.Breaks
    sweepLoop.breakable {
      for (s <- 1 to maxAttempts) {
        if (healthySweeps >= nSweeps) sweepLoop.break()
        // Pre-sweep feasibility FIRST (round-12 review fix): the
        // inter-sweep unpersist + gc + quiesce costs ~20-35 s — paying
        // it for a sweep the check then cancels wastes exactly the
        // budget the check exists to protect, and the +15 s overhead
        // term below accounts for the quiesce that follows a GO
        // decision, not one already spent.
        // Pre-sweep feasibility: starting a sweep that cannot finish
        // only produces an alphabetically-biased partial — if the next
        // sweep's predicted cost doesn't fit in the remaining budget,
        // stop cleanly with the sweeps already collected (r11: sweep 3
        // was started with 97 s left against an 89.5 s previous sweep
        // and overran the budget mid-sweep — a partial artifact where
        // stopping at 2 clean sweeps was strictly better).
        //
        // The predictor is BASELINE-driven, not last-sweep-driven
        // (round-12): sweep 1 absorbs the first-run cost of every
        // entry the warm-up deadline skipped (~1.4 s/entry observed,
        // much more for heavies), so `1.2 x lastSweepSec` over-
        // predicts a WARM sweep 2 by 2-3x and cancelled runs that had
        // ample budget (the full-catalog shakedown: sweep 1 cold
        // 344 s, warm sweep cost ~110 s, 345 s remaining — stopped).
        // A warm sweep's best predictor is the baseline's per-entry
        // sum over the timed set, scaled by how much slower THIS
        // session runs the fixed CPU probe, with 1.3x headroom. Falls
        // back to 1.2 x last sweep when the baseline doesn't cover
        // the timed set (pre-re-record artifacts, BENCH_ALL runs on
        // a stale baseline).
        if (s > 1) {
          val estNext = predictNextSweepSec()
          // 30 s overhead term: inter-sweep quiesce (~15) + the pre
          // AND post probeCal() pairs (~8-14) that run inside every
          // sweep since the r14 self-exclusion change — the old 15 s
          // constant predated them and let a thin-slack run overshoot
          // into a partial (r14 ADVICE)
          if (elapsedSec + 30.0 + estNext > budgetSec) {
            System.err.println(f"[bench] remaining budget " +
              f"${budgetSec - elapsedSec}%.0f s < overhead + predicted " +
              f"sweep ($estNext%.0f s): stopping after " +
              f"$sweepsCompleted sweeps")
            sweepLoop.break()
          }
        }
        if (s == 1) jitQuiesce(60.0)
        else {
          // Between sweeps: drop sweep 1's checkpoint blocks (serial
          // context — safe, unlike during the concurrent warm-up),
          // collect, and a SHORT quiesce (sweep 1 compiled everything
          // already; only stragglers remain).
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          System.gc()
          jitQuiesce(15.0)
        }
        // MIN of two probes ~2 s apart (same estimator as calib0): the
        // per-sweep calibration runs right after System.gc() + quiesce,
        // and a concurrent-GC tail of the 32 GB heap inflates a single
        // reading 7-30x (observed: sweep-2 cals [2.01, 2.11, 0.97] vs
        // [0.285, 0.32, 0.033] on a healthy session whose sweep then
        // ran FASTER than sweep 1). A one-off tail passes; sustained
        // session degradation inflates both readings and is still
        // detected.
        var preCal = probeCal()
        if (probeDegraded(preCal)) {
          // degraded RIGHT NOW: co-located-load windows last minutes —
          // wait one out once instead of spending ~90 s measuring
          // samples that would only be flagged
          System.err.println(f"[bench] pre-sweep calibration " +
            f"${calNRatio(preCal._2)}%.2fx cpu / " +
            f"${calMRatio(preCal._3)}%.2fx mem baseline: waiting 30 s " +
            "for the window to pass")
          Thread.sleep(30000)
          preCal = probeCal()
          // the 30 s wait + two probe pairs ran AFTER the feasibility
          // check above — re-verify the budget before committing to a
          // sweep, or a run that passed with thin slack overshoots
          // into a partial artifact (r14 ADVICE)
          if (s > 1 &&
              elapsedSec + 10.0 + predictNextSweepSec() > budgetSec) {
            System.err.println(f"[bench] budget no longer fits after " +
              f"degradation wait (elapsed $elapsedSec%.0f s): stopping " +
              f"after $sweepsCompleted sweeps")
            sweepLoop.break()
          }
        }
        if (probeDegraded(preCal) && healthySweeps > 0) {
          // still degraded with a healthy sweep already in hand: a
          // flagged sweep's samples would be excluded anyway — stop
          // instead of burning the budget on them. Reported under
          // skipped_sweeps (NOT degraded_sweeps): no samples ran, so
          // there is no sweep_cals row to correlate with
          skippedSweeps += s
          System.err.println(f"[bench] sweep attempt $s skipped: " +
            f"calibration ${calNRatio(preCal._2)}%.2fx cpu / " +
            f"${calMRatio(preCal._3)}%.2fx mem baseline persists")
          sweepLoop.break()
        }
        sweepCals += preCal
        val sw0 = System.nanoTime()
        // Budget shard (round-11): the `*_portable` verification twins
        // exist only to hash-oracle the sketch entries — their md5-as-
        // string cost is verification overhead, excluded from every
        // throughput ratio already. Timing them once (sweep 1) keeps
        // their numbers in the artifact while the repeat sweeps spend
        // the budget on production entries only.
        // CHEAPEST-FIRST sweep order (round-11): a budget-death mid-
        // sweep used to leave an alphabetical prefix — the dedup_*
        // heavies — as the whole partial sample (r11: a 30-entry
        // partial read 9.3x on cold cluster entries alone). Cheap
        // entries first maximizes per-entry coverage per unit budget;
        // heavies still run at the sweep's end, a COMPLETED sweep
        // times the identical set either way, and a partial stays
        // marked partial.
        // verification twins are timed until a HEALTHY sample exists
        // (on the standard run: once, in sweep 1 — identical to the
        // old `s == 1` rule; a replacement for a degraded sweep 1
        // re-times them so their only number isn't a flagged one)
        val sweepNames = timedNames.filter(n => !verificationOnly(n) ||
            !samples.getOrElse(n, Nil).exists(_._2))
          .sortBy(costRank)
        val sweepSamples =
          scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        val inner = new scala.util.control.Breaks
        inner.breakable {
          for (n <- sweepNames) {
            if (elapsedSec > budgetSec) {
              partial = true
              System.err.println(f"[bench] budget $budgetSec%.0f s exceeded " +
                f"at $elapsedSec%.1f s (sweep $s, query $n): emitting partial result")
              inner.break()
            }
            // Tail-entry deadline clamp (r19 verdict item 1c): one
            // expensive entry near the budget edge must not overrun
            // the whole run (r19's driver artifact: a 120 s deadline
            // sample inside the 470 s budget contributed to 0
            // completed sweeps). The per-entry deadline shrinks toward
            // the remaining budget, floor 20 s so a healthy heavy
            // entry still finishes; a clamped cancellation lands in
            // `deadlined` and is therefore ratio-excluded.
            val clamp = math.min(queryDeadlineSec,
              math.max(20.0, budgetSec - elapsedSec - 10.0))
            sweepSamples +=
              ((n, runOnce(n, sfDir, attribute = true, deadlineSec = clamp)))
            // NO per-query unpersist here: spreading the cleaner's RPCs
            // through the sweep cost ~100 s/sweep of untimed gaps; the
            // between-sweep unpersist + gc absorbs the same work where
            // nothing is being timed.
          }
        }
        // post-sweep probe: catches degradation that BEGAN mid-sweep
        // (the r13 failure mode — pre-probe healthy, samples garbage).
        // A budget-partial sweep skips it (nothing left to protect).
        val postCal = if (partial) preCal else probeCal()
        sweepCalsPost += postCal
        val healthy = !probeDegraded(preCal) && !probeDegraded(postCal)
        sweepHealthy += healthy
        if (!healthy) {
          degradedSweeps += s
          System.err.println(f"[bench] sweep $s DEGRADED (cal pre " +
            f"${calNRatio(preCal._2)}%.2fx/${calMRatio(preCal._3)}%.2fx " +
            f"/ post ${calNRatio(postCal._2)}%.2fx/" +
            f"${calMRatio(postCal._3)}%.2fx baseline): samples flagged")
        } else if (!partial) healthySweeps += 1
        sweepSamples.foreach { case (n, v) =>
          samples(n) = (v, healthy) :: samples.getOrElse(n, Nil)
        }
        if (partial) sweepLoop.break()
        sweepsCompleted += 1
        lastSweepSec = (System.nanoTime() - sw0) / 1e9
        System.err.println(f"[bench] sweep $s " +
          f"$lastSweepSec%.1f s; elapsed $elapsedSec%.1f s")
      }
    }
    // Lower-median over however many samples survived the budget (= min
    // for the standard 2-sweep run — the warmed-up reading, biased
    // against one-off noise). HEALTHY samples only when any exist for
    // the entry; a flagged sweep's samples are the fallback, never the
    // preference.
    val results = names.flatMap { n =>
      samples.get(n).map { all =>
        val good = all.filter(_._2)
        val t = (if (good.nonEmpty) good else all).map(_._1)
        // a -1.0 (hard failure) in ANY sweep publishes -1.0, healthy
        // or not: healthy-preferred selection must surface a
        // load-sensitive crash, never shed it with the noise (r14
        // ADVICE — the old code only checked the preferred pool)
        n -> (if (all.exists(_._1 == -1.0)) -1.0
              else t.sorted.apply((t.length - 1) / 2))
      }
    }
    def medCal(sel: ((Double, Double, Double)) => Double): Double = {
      // healthy sweeps' probes only when any exist: a flagged sweep's
      // inflated calibration must not feed vs_baseline_cal
      val pool =
        if (sweepHealthy.contains(true))
          sweepCals.zip(sweepHealthy).collect { case (c, true) => c }.toSeq
        else sweepCals.toSeq
      val v = pool.map(sel).sorted
      if (v.isEmpty) -1.0 else v((v.length - 1) / 2)
    }
    val calib1 = medCal(_._1)
    val calibN = medCal(_._2)
    val calibM = medCal(_._3)

    // Post-hoc attributions (give the async listener bus a moment to
    // drain first): single-task scale defects, and the STALL-MODE set
    // (r19 verdict item 1b) — computed BEFORE the ratio block so
    // stalled samples can be excluded from vs_baseline. An entry is
    // excluded when (a) it was deadlined (its number is a lower bound
    // of an unfinished run — 4 such samples made r19's published
    // 21.756 disinformation), or (b) every timed window showed the
    // run ≫ cpu stall signature AND its published number is
    // anomalous (≥ 3 s and ≥ 3× its baseline) — the anomaly guard
    // keeps a legitimately IO-shaped entry on a healthy host inside
    // the ratio. Excluded entries keep their numbers in "queries"
    // (facts are facts) and are listed under "stall_excluded".
    Thread.sleep(1000)
    val singleTask: Set[String] = attributeSingleTask(
      timedWindows.asScala.toSeq, singleTaskEvents.asScala.toSeq)
    val resultMap = results.toMap
    val stallExcluded: Set[String] = {
      val byWindow = stallModeEntries(
        timedWindows.asScala.toSeq, stageCostEvents.asScala.toSeq)
      val anomalous = byWindow.filter { n =>
        resultMap.get(n).exists(v => v >= 3.0 &&
          baseKv.get(n).forall(b => b <= 0 || v / b >= 3.0))
      }
      (anomalous ++ deadlined.asScala).filter(resultMap.contains)
    }
    if (stallExcluded.nonEmpty)
      System.err.println(s"[bench] ${stallExcluded.size} stall-mode " +
        s"entries EXCLUDED from vs_baseline: " +
        stallExcluded.toSeq.sorted.mkString(","))
    // Degraded-tier cross-check (r20 verdict item 1): with NO healthy
    // sweep in hand, any sample >= 3x its same-substrate tier
    // denominator is window arithmetic, not a plan measurement —
    // excluded from the headline ratios alongside the stall set (raw
    // numbers stay in "queries"). Disjoint from stall_excluded in the
    // artifact so a reader sees which detector fired.
    val tierExcluded: Set[String] =
      if (!tierConfigMatches) Set.empty
      else tierExcludedEntries(resultMap, tierKv, healthySweeps > 0)
        .diff(stallExcluded)
    if (tierExcluded.nonEmpty)
      System.err.println(s"[bench] ${tierExcluded.size} entries >= 3x " +
        s"their degraded-tier denominator on a 0-healthy-sweep run — " +
        s"EXCLUDED from vs_baseline: " +
        tierExcluded.toSeq.sorted.mkString(","))
    val ratioExcluded: Set[String] = stallExcluded ++ tierExcluded

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val prod = results.collect {
      case (k, v) if v >= 0 && !verificationOnly(k) => v }.sum
    // vs-baseline ratio over the PRODUCTION queries present in BOTH
    // records, so adding a catalog entry can't masquerade as a
    // regression and the md5-portable verification twins can't dilute
    // an engine-throughput ratio. Emitted only when the run's config
    // matches what the baseline recorded: exact sf dir (a substring
    // test would match sf0.12 against the sf0.1 record) and the same
    // core/shuffle-partition count (a local[4] run against a local[32]
    // record would compare different parallelism).
    val (vsBaseline, vsBaselineCal, vsBaselineCalm):
        (Option[Double], Option[Double], Option[Double]) =
      baselineText match {
        case None => (None, None, None)
        case Some(_) =>
          if (!baselineConfigMatches)
            (None, None, None)
          else {
            val shared = results.collect {
              case (k, v) if v >= 0 && baseKv.contains(k) &&
                !verificationOnly(k) && !ratioExcluded(k) => (v, baseKv(k)) }
            val baseSum = shared.map(_._2).sum
            val raw =
              if (baseSum > 0) Some(shared.map(_._1).sum / baseSum) else None
            // Session-speed-normalized ratio: divide out how much slower
            // this session ran the fixed CPU probe than the baseline
            // session did. raw answers "is this run slower than the
            // recorded one"; calibrated answers "did the PLANS get
            // slower". Both are reported — neither replaces the other.
            val cal = for {
              r <- raw
              b <- baseKv.get("calibn_sec") if b > 0 && calibN > 0
            } yield r * b / calibN
            // Substrate-normalized ratio: divide out the WORST of the
            // ALU and memory-bandwidth probe drifts. The r18 sessions
            // showed the mode cal is blind to — calibn flat while
            // calibm read 1.25-1.33x baseline (shared-host bandwidth
            // starvation) and the median code-untouched entry tracked
            // calibm, not calibn. A calm near 1.0 under an elevated
            // vs_baseline says "substrate, not plans" from the
            // artifact alone; a calm elevation is real code drift no
            // probe excuses.
            val calm = for {
              r <- raw
              bn <- baseKv.get("calibn_sec") if bn > 0 && calibN > 0
              bm <- baseKv.get("calibm_sec") if bm > 0 && calibM > 0
            } yield r / math.max(calibN / bn, calibM / bm)
            (raw, cal, calm)
          }
      }
    def ratio3(name: String, v: Option[Double]): String =
      v.map(r => s""","$name":${math.rint(r * 1000) / 1000}""").getOrElse("")
    // Same-substrate ratio (r20 verdict item 1): vs the degraded-tier
    // record, so a degraded-host run carries its own like-for-like
    // comparison — a sample 2x the HEALTHY baseline but 0.7x the tier
    // is the substrate, not the plan. Shares the exclusion set with
    // vs_baseline.
    val vsTier: Option[Double] =
      if (!tierConfigMatches) None
      else {
        val shared = results.collect {
          case (k, v) if v >= 0 && tierKv.contains(k) &&
            !verificationOnly(k) && !ratioExcluded(k) => (v, tierKv(k)) }
        val s = shared.map(_._2).sum
        if (s > 0) Some(shared.map(_._1).sum / s) else None
      }
    // The probe-drift factors calm divides out, published alongside it
    // (r18 ADVICE): calm is DIAGNOSTIC — it attributes, it does not
    // gate — and a reader must see how much was divided out to weigh
    // it. Gate on raw/cal; read calm with drift_cpu/drift_mem beside.
    val (driftCpu, driftMem): (Option[Double], Option[Double]) =
      if (!baselineConfigMatches) (None, None)
      else (baseKv.get("calibn_sec").filter(_ > 0)
              .map(calibN / _).filter(_ > 0),
            baseKv.get("calibm_sec").filter(_ > 0)
              .map(calibM / _).filter(_ > 0))
    val extra = ratio3("vs_baseline", vsBaseline) +
      ratio3("vs_baseline_cal", vsBaselineCal) +
      ratio3("vs_baseline_calm", vsBaselineCalm) +
      ratio3("vs_degraded_tier", vsTier) +
      ratio3("drift_cpu", driftCpu) +
      ratio3("drift_mem", driftMem)
    // Per-entry outliers, pre-digested: entries reading >= 3x their
    // baseline AND >= 1 s absolute — the rows a cross-round reader
    // would otherwise have to dig out of the 130+-entry queries map
    // by hand. Together with calib0/sweep_cals this makes the artifact
    // answer "was it the session or an entry?" in one glance.
    val regressions = results.collect {
      case (k, v) if baselineConfigMatches && v >= 1.0 &&
          baseKv.get(k).exists(b => b > 0 && v / b >= 3.0) =>
        s"""{"q":"$k","sec":${math.rint(v * 1000) / 1000},""" +
          s""""base":${baseKv(k)}}"""
    }
    def strArr(xs: Iterable[String]): String =
      xs.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def calsJson(
        cs: scala.collection.Seq[(Double, Double, Double)]): String = cs
      .map { case (a, b, c) =>
        s"[${math.rint(a * 1000) / 1000},${math.rint(b * 1000) / 1000}," +
          s"${math.rint(c * 1000) / 1000}]" }
      .mkString("[", ",", "]")
    val sweepCalsJson = calsJson(sweepCals)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""production_sec":$prod,"verification_sec":${total - prod},""" +
        s""""calib1_sec":${math.rint(calib1 * 1000) / 1000},""" +
        s""""calibn_sec":${math.rint(calibN * 1000) / 1000},""" +
        s""""calibm_sec":${math.rint(calibM * 1000) / 1000},""" +
        s""""sweep_cals":$sweepCalsJson,""" +
        s""""calib0":[${math.rint(calib0._1 * 1000) / 1000},""" +
        s"""${math.rint(calib0._2 * 1000) / 1000},""" +
        s"""${math.rint(calib0._3 * 1000) / 1000}],""" +
        s""""degraded_shard":$degraded,""" +
        s""""shard_healed":$shardHealed,""" +
        s""""partial":$partial,"sweeps_completed":$sweepsCompleted,""" +
        s""""healthy_sweeps":$healthySweeps,""" +
        s""""degraded_sweeps":${degradedSweeps.sorted.mkString("[", ",", "]")},""" +
        s""""skipped_sweeps":${skippedSweeps.sorted.mkString("[", ",", "]")},""" +
        s""""sweep_cals_post":${calsJson(sweepCalsPost)},""" +
        s""""unwarmed":$unwarmed,""" +
        s""""warm_dropped":$warmDropped,""" +
        s""""budget_dropped":$budgetDropped,""" +
        s""""timed":${timedNames.size},"catalog":${names.size},""" +
        s""""round":$roundIdx,""" +
        s""""rotation_group":$rotationG,"rotation_k":$rotationK,""" +
        s""""rotation_timed":${rotationSlice.forall(samples.contains)},""" +
        s""""rotation_age":$rotAge,""" +
        s""""skip_list":${strArr(skipList.toSeq.sorted)},""" +
        s""""single_task":${strArr(singleTask)},""" +
        s""""stall_excluded":${strArr(stallExcluded)},""" +
        s""""tier_excluded":${strArr(tierExcluded)},""" +
        s""""regressions":${regressions.mkString("[", ",", "]")},""" +
        s""""deadlined":${strArr(deadlined.asScala)}""" +
        s"""$extra,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
