package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR.
  *
  * Measurement rules (round-1 + round-2 verdict fixes):
  *   - materialize the FULL plan through the `noop` sink — a bare
  *     `count()` lets Catalyst prune projections/sorts, timing a plan
  *     the correctness gate never checked;
  *   - one untimed warm-up pass first, so JVM/Spark/codegen startup
  *     isn't billed to whichever query happens to run first;
  *   - median of 3 timed runs per query, INTERLEAVED as full catalog
  *     sweeps (run every query once, then repeat) rather than 3
  *     back-to-back runs: the r2 artifact recorded a single-shot 17s
  *     GC/JIT hiccup for a 1.4s query, and the r8 artifact showed a
  *     several-minute session-pressure window inflating one
  *     alphabetical stretch of back-to-back triples 10-30x — with
  *     sweeps, each query's 3 samples are minutes apart, so a transient
  *     window can tax at most one sample and the median sheds it;
  *   - System.gc() between sweeps: it both stops heap growth from
  *     biasing later sweeps and lets Spark's ContextCleaner reclaim
  *     accumulated broadcast/RDD state (~400 query executions share one
  *     session here);
  *   - a fixed CPU calibration probe (single-thread and all-thread LCG
  *     spin) timed before each sweep, reported as calib1_sec /
  *     calibN_sec: the probe's cost is machine-constant, so a probe
  *     reading far above its recorded baseline means THE SESSION was
  *     slow (co-located load, CPU contention), not the engine — the r7
  *     bench read 1.478x baseline on a commit that changed no plans,
  *     and without a calibration record that is indistinguishable from
  *     a real regression;
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
    * in this repo. */
  private def calibrate(threads: Int): Double = {
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

  private def calibrateMem(): Double = {
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
      // ~110-entry catalog swept in interleaved order (r8 fix for
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
      // explicit between-sweep unpersist drops the checkpoint blocks.
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
    // Warm-up runs against the MEASURED dir (round-11 revert of the
    // round-9 sf0.001 shortcut): under AQE, physical plans — and so
    // the generated whole-stage-codegen classes — are NOT
    // data-size-independent (different broadcast/coalesce decisions at
    // 1/100th the bytes → different generated code). An sf0.001
    // warm-up left sweep 1 loading fresh sf0.1 codegen classes into a
    // saturated C2 queue, so entries ran INTERPRETED for whole stages:
    // date_functions read 18.5 s (14 s of solid single-task CPU)
    // against a 0.37 s baseline and a 0.67 s quiet-session median.
    // The 8-thread concurrent drain keeps the real-dir warm-up inside
    // its deadline.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Stage-attribution listener: when a timed query stalls, the log
    // must say WHERE (driver wait vs task CPU vs task count) — the
    // session-pressure windows move between runs and are unreproducible
    // in quiet profiling, so the evidence has to come from the run
    // that hit them.
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
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
    def runOnce(name: String, dir: String, attribute: Boolean,
        deadlineSec: Double = queryDeadlineSec): Double = {
      if (attribute) stageLog.clear()
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
        if (killed) {
          // Only a TIMED run's cancellation is a reportable deadline:
          // the concurrent warm-up runs 8 heavy entries at once, so a
          // warm-up cancellation measures contention, not the query
          // (r11: a 2.4 s entry was flagged from its warm-up run).
          if (attribute) deadlined.add(name)
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
      if (attribute && sec >= 3.0) {
        import scala.jdk.CollectionConverters._
        System.err.println(s"[bench] slow $name ${math.rint(sec * 10) / 10} s: " +
          stageLog.asScala.mkString("; "))
      }
      sec
    }

    // Warm-up: fills codegen/catalog caches AND lets C2 compile the
    // measured dir's generated classes, untimed — CONCURRENT (8
    // threads draining one queue): warm-up cost is dominated by
    // per-entry driver work (planning + Janino codegen compilation,
    // single-threaded per entry), which parallelizes cleanly across
    // entries; the serial sweep had grown to ~210 s of the
    // externally-timed-out bench budget at a ~165-entry catalog.
    // Only the UNTIMED sweep runs concurrently — timed sweeps stay
    // strictly serial so one query's reading never includes another's
    // CPU contention.
    // Recorded-cost rank, shared by warm-up (descending: warm the
    // expensive first) and sweep order (ascending: time the cheap
    // first): the MAX time ever recorded per entry across the round
    // artifacts in the repo (BENCH_r*.json / bench_out.json, scraped
    // with the baseline's regex — stale highs are fine, they mark
    // expensive code paths). Unrecorded (new) entries rank by the
    // heavy-prefix heuristic.
    val costRank: String => Double = {
      import scala.jdk.CollectionConverters._
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
    locally {
      val w0 = System.nanoTime()
      // Hard deadline: the concurrent warm-up's wall time is high-
      // variance (observed 46 s to 321 s for the same catalog — eight
      // job-submitting threads can convoy on the DAGScheduler event
      // loop), and an unlucky warm-up must never eat the sweeps'
      // budget. Entries left un-warmed pay their first-run cost inside
      // sweep 1 once; the cross-sweep median sheds it.
      val warmBudget =
        sys.env.getOrElse("SPARK_GRAFT_WARMUP_BUDGET_SEC", "120").toDouble
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      // Costliest first, DATA-DRIVEN: when the deadline truncates the
      // warm-up, the un-warmed tail must be the CHEAP entries
      // (first-run codegen ~1 s each, shed by the sweep median), never
      // the iterative / gram-join entries whose cold first run costs
      // 10-60 s inside a timed sweep. A static prefix list proved
      // luck-dependent (r11: two runs with the same 120 s budget
      // warmed different subsets; the one that missed
      // dedup_cluster_cc paid 55 s for it in sweep 1 and the sweep
      // blew the budget). Instead, rank by the MAX time ever recorded
      // for the entry across the round artifacts in the repo
      // (BENCH_r*.json / bench_out.json, scraped with the same regex
      // as the baseline — stale highs are FINE here: an entry that was
      // ever slow has expensive code paths worth warming first).
      // Entries with no record (new this round) fall back to the
      // heavy-prefix heuristic.
      names.sortBy(n => -costRank(n)).foreach(queue.add)
      val warmThreads = (1 to 8).map { _ =>
        new Thread(() => {
          // NO unpersist in here: warm-up entries run CONCURRENTLY, and
          // a blanket getPersistentRDDs unpersist from one thread
          // destroys another thread's in-flight localCheckpoint blocks
          // (observed: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Blocks
          // accumulated by the warm-up are dropped once, serially,
          // before the first timed sweep.
          var n = queue.poll()
          while (n != null &&
              (System.nanoTime() - w0) / 1e9 < warmBudget) {
            // Per-entry deadline = REMAINING warm budget (+30 s
            // grace, floor 40 s). A short FLAT deadline was tried
            // (45 s) and made the bench worse — it cancelled the
            // heavy iterative entries mid-run under 8-way contention
            // and they entered sweep 1 cold, paying 20-50x
            // (dedup_cluster_cc 48.6 s cold vs 2.0 s warmed). With
            // costliest-first ordering the expensive entries start
            // EARLY and get effectively the full deadline; only
            // stragglers started near the budget edge are clipped, so
            // the warm-up cannot stretch a 120 s budget to 195 s
            // (observed on a bandwidth-starved session) while the
            // entries that matter still warm fully.
            val remain = warmBudget - (System.nanoTime() - w0) / 1e9
            runOnce(n, warmDir, attribute = false,
              deadlineSec = math.min(queryDeadlineSec,
                math.max(40.0, remain + 30.0)))
            n = queue.poll()
          }
        })
      }
      warmThreads.foreach(_.start())
      warmThreads.foreach(_.join())
      val skipped = queue.size
      unwarmed = skipped
      System.err.println(f"[bench] warm-up sweep ($warmDir, 8 threads) " +
        f"${(System.nanoTime() - w0) / 1e9}%.1f s; elapsed $elapsedSec%.1f s" +
        (if (skipped > 0) s"; $skipped entries un-warmed (deadline)" else ""))
    }
    // 3 interleaved sweeps: each query's samples land minutes apart, so
    // a transient contention window taxes at most one of its 3 samples.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val sweepCals =
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    var sweepsCompleted = 0
    var partial = false
    var lastSweepSec = 0.0
    val sweepLoop = new scala.util.control.Breaks
    sweepLoop.breakable {
      for (s <- 1 to 3) {
        // Pre-sweep feasibility: starting a sweep that cannot finish
        // only produces an alphabetically-biased partial — if the last
        // completed sweep's cost doesn't fit in the remaining budget,
        // stop cleanly with the sweeps already collected. The estimate
        // must include the INTER-SWEEP overhead spent before any query
        // is timed (12 s drain pause + gc + two calibration probes,
        // ~15 s) plus sweep-to-sweep variance headroom (r11: sweep 3
        // was started with 97 s left against a 89.5 s previous sweep
        // and overran the budget mid-sweep — a partial artifact where
        // stopping at 2 clean sweeps was strictly better).
        if (s > 1 &&
            elapsedSec + 15.0 + lastSweepSec * 1.2 > budgetSec) {
          System.err.println(f"[bench] remaining budget " +
            f"${budgetSec - elapsedSec}%.0f s < overhead + 1.2x last " +
            f"sweep ($lastSweepSec%.0f s): stopping after ${s - 1} sweeps")
          sweepLoop.break()
        }
        // SESSION RESTART (round-11): `getPersistentRDDs.unpersist`
        // only drops blocks whose RDDs are still registered — the
        // localCheckpoint / broadcast blocks of ~200 already-finished
        // warm-up executions are dead-but-STRONGLY-HELD by the
        // BlockManager store with the cleaner off, so sweep 1 started
        // on a nearly-full old gen and heavy entries GC-thrashed
        // (observed: a stage with executorRun 112 s of which
        // jvmGCTime 100.7 s, calibration probes all normal). Stopping
        // the context releases the entire store wholesale; what must
        // survive a restart DOES survive: JIT-compiled code and the
        // JVM-static generated-class cache (codegen.cache lives in
        // object CodeGenerator, not the session). Re-planning per
        // entry costs ~0.1-0.3 s, identical for every run. The heap at
        // each timed sweep's start is thereby DETERMINISTIC — the
        // run-to-run variance of "how full did warm-up leave the old
        // gen" is what made identical code bench 0.6x one hour and
        // 1.8x the next.
        spark.stop()
        spark = newSession()
        System.gc()
        // Settle pass: the fresh session's first queries absorb its
        // init + compile storm — the r11 run that restarted and then
        // timed cheapest-first showed a consecutive stretch of ~dozen
        // sub-second entries reading 7-14 s each (stage run-time 4x
        // their CPU: task threads waiting out compiler/init threads),
        // and the pre-sweep JIT quiesce can't see it because
        // compilation only STARTS when queries run. Three median-cost
        // entries run untimed first and eat that storm; the extra
        // warmth they gain is what warm-up intends for every entry
        // anyway.
        locally {
          val settle = names.sortBy(costRank).drop(names.size / 2).take(3)
          settle.foreach(n =>
            runOnce(n, sfDir, attribute = false, deadlineSec = 20.0))
        }
        // Drain pause, ADAPTIVE (round-11): a fixed 12 s was tuned for
        // the ContextCleaner RPC storm (now moot — referenceTracking is
        // off in bench), but the dominant start-of-sweep hazard turned
        // out to be the C2 COMPILE BACKLOG: the concurrent warm-up
        // generates hundreds of whole-stage-codegen classes and queues
        // them for C2; if sweep 1 starts while 16 compiler threads are
        // still chewing the queue, entries run partially INTERPRETED on
        // a compiler-taxed machine (observed: one session's sweep 1 at
        // 286 s vs another's 114 s, same code, same coverage — slow
        // entries showing the same stages at ~10x CPU). Wait until the
        // JVM's total compilation time stops advancing (<400 ms of
        // compiler work across a 2 s window, 3 windows in a row),
        // capped at 75 s — time spent here is untimed and buys back
        // multiples of itself inside the sweep.
        locally {
          Thread.sleep(4000) // GC/unpersist settling
          val mx = java.lang.management.ManagementFactory
            .getCompilationMXBean
          if (mx == null || !mx.isCompilationTimeMonitoringSupported)
            Thread.sleep(8000)
          else {
            val q0 = System.nanoTime()
            var prev = mx.getTotalCompilationTime
            var quiet = 0
            while (quiet < 3 && (System.nanoTime() - q0) / 1e9 < 75.0) {
              Thread.sleep(2000)
              val cur = mx.getTotalCompilationTime
              if (cur - prev < 400) quiet += 1 else quiet = 0
              prev = cur
            }
            System.err.println(f"[bench] JIT quiesce wait " +
              f"${(System.nanoTime() - q0) / 1e9}%.1f s before sweep $s")
          }
        }
        val c1 = calibrate(1)
        val cN = calibrate(cpus.toInt)
        val cM = calibrateMem()
        sweepCals += ((c1, cN, cM))
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
        val sweepNames =
          (if (s == 1) names else names.filterNot(verificationOnly))
            .sortBy(costRank)
        for (n <- sweepNames) {
          if (elapsedSec > budgetSec) {
            partial = true
            System.err.println(f"[bench] budget $budgetSec%.0f s exceeded " +
              f"at $elapsedSec%.1f s (sweep $s, query $n): emitting partial result")
            sweepLoop.break()
          }
          samples(n) = runOnce(n, sfDir, attribute = true) ::
            samples.getOrElse(n, Nil)
          // NO per-query unpersist here: spreading the cleaner's RPCs
          // through the sweep cost ~100 s/sweep of untimed gaps; the
          // between-sweep unpersist + gc + drain pause absorbs the
          // same work where nothing is being timed.
        }
        sweepsCompleted = s
        lastSweepSec = (System.nanoTime() - sw0) / 1e9
        System.err.println(f"[bench] sweep $s " +
          f"$lastSweepSec%.1f s; elapsed $elapsedSec%.1f s")
      }
    }
    // Median over however many samples survived the budget (lower-median
    // for even counts — the warmed-up reading, biased against noise).
    val results = names.flatMap { n =>
      samples.get(n).map { t =>
        n -> (if (t.contains(-1.0)) -1.0
              else t.sorted.apply((t.length - 1) / 2))
      }
    }
    def medCal(sel: ((Double, Double, Double)) => Double): Double = {
      val v = sweepCals.map(sel).sorted
      if (v.isEmpty) -1.0 else v((v.length - 1) / 2)
    }
    val calib1 = medCal(_._1)
    val calibN = medCal(_._2)
    val calibM = medCal(_._3)

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
    // record would compare different parallelism). The baseline file is
    // a flat JSON object; scrape it with regexes (no JSON library on
    // the allowed deps).
    val baselinePath = Paths.get("BASELINE_BENCH.json")
    val (vsBaseline, vsBaselineCal): (Option[Double], Option[Double]) =
      if (!Files.exists(baselinePath)) (None, None)
      else {
        val text = Files.readString(baselinePath)
        val baseSf = """"sf":\s*"([^"]+)"""".r
          .findFirstMatchIn(text).map(_.group(1))
        val baseCpus = """"cpus":\s*"?([0-9]+)"?""".r
          .findFirstMatchIn(text).map(_.group(1))
        if (!baseSf.contains(sfDir) || !baseCpus.contains(cpus)) (None, None)
        else {
          val kv = """"([a-z0-9_]+)":\s*([0-9.]+)""".r
          val base = kv.findAllMatchIn(text)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          val shared = results.collect {
            case (k, v) if v >= 0 && base.contains(k) &&
              !verificationOnly(k) => (v, base(k)) }
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
            b <- base.get("calibn_sec") if b > 0 && calibN > 0
          } yield r * b / calibN
          (raw, cal)
        }
      }
    def ratio3(name: String, v: Option[Double]): String =
      v.map(r => s""","$name":${math.rint(r * 1000) / 1000}""").getOrElse("")
    val extra = ratio3("vs_baseline", vsBaseline) +
      ratio3("vs_baseline_cal", vsBaselineCal)
    val deadlinedJson = {
      import scala.jdk.CollectionConverters._
      deadlined.asScala.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]")
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""production_sec":$prod,"verification_sec":${total - prod},""" +
        s""""calib1_sec":${math.rint(calib1 * 1000) / 1000},""" +
        s""""calibn_sec":${math.rint(calibN * 1000) / 1000},""" +
        s""""calibm_sec":${math.rint(calibM * 1000) / 1000},""" +
        s""""partial":$partial,"sweeps_completed":$sweepsCompleted,""" +
        s""""unwarmed":$unwarmed,""" +
        s""""deadlined":$deadlinedJson""" +
        s"""$extra,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
