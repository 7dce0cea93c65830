#!/usr/bin/env python3
"""Regenerate BASELINE_BENCH.json from a full-catalog Bench run
(driver-side tooling only; the Scala library has no Python dependency).

Usage: make_baseline.py <bench_out.json> <core_list.json> <source_note>

Per BASELINE.md's regeneration policy the baseline is re-recorded from a
quiet-session full run (SPARK_GRAFT_BENCH_ALL=1) in the same commit as a
methodology or optimization change. This tool also embeds the round-12
sharding contract:
  - "core":       entries Bench times EVERY round,
  - "rotation_k": the non-core entries rotate across this many rounds.
"""
import json, sys

def main(bench_path, core_path, note):
    b = json.load(open(bench_path))
    core = json.load(open(core_path))
    if b.get("partial"):
        sys.exit("refusing: bench run is partial")
    # round-18: SPARK_GRAFT_BENCH_SKIP runs exist only for A/B drift
    # attribution — a baseline must price the full catalog's session
    # (JIT profiles, cache pressure) exactly as a real round runs it
    if b.get("skip_list"):
        sys.exit(f"refusing: diagnostic skip-list run {b['skip_list']}")
    # round-15: a startup-degraded run drops the rotation slice and
    # times the core entries only — it can pass every sweep-health
    # check below (r14 did: degraded_shard:true, 2 healthy sweeps)
    # yet recording it would leave the rotation entries with no
    # denominator at all
    if b.get("degraded_shard"):
        sys.exit("refusing: degraded_shard run (rotation slice dropped)")
    if b.get("rotation_timed") is False:
        sys.exit("refusing: rotation slice was not timed")
    if b.get("sweeps_completed", 0) < 2:
        sys.exit("refusing: need >= 2 completed sweeps")
    # round-14: sweeps that calibrated >1.5x baseline are flagged in
    # the artifact — a baseline must come from healthy sweeps only
    if b.get("degraded_sweeps"):
        sys.exit(f"refusing: degraded sweeps {b['degraded_sweeps']}")
    if b.get("healthy_sweeps", b.get("sweeps_completed", 0)) < 2:
        sys.exit("refusing: need >= 2 healthy sweeps")
    # a routine sharded round passes the two checks above yet covers
    # only ~2/3 of the catalog; recording it would leave the rotation
    # entries permanently "new" (always timed) and break the sweep
    # budget arithmetic — require a BENCH_ALL artifact
    if b.get("timed") is not None and b.get("timed") != b.get("catalog"):
        sys.exit(f"refusing: sharded run ({b['timed']}/{b['catalog']} "
                 f"timed) — re-run with SPARK_GRAFT_BENCH_ALL=1")
    queries = {k: v for k, v in sorted(b["queries"].items()) if v >= 0}
    missing = [c for c in core if c not in queries]
    if missing:
        sys.exit(f"refusing: core entries missing from run: {missing}")
    out = {
        "cpus": 32,
        "shuffle_partitions": 32,
        "production_sec": b["production_sec"],
        "verification_sec": b["verification_sec"],
        "total_sec": b["production_sec"] + b["verification_sec"],
        "verification_only": sorted(
            k for k in queries if k.endswith("_portable")),
        "calib1_sec": b["calib1_sec"],
        "calibn_sec": b["calibn_sec"],
        "calibm_sec": b.get("calibm_sec"),
        "sf": b["sf"],
        "rotation_k": 3,
        "core": sorted(core),
        "source": note,
        "queries": queries,
    }
    json.dump(out, open("BASELINE_BENCH.json", "w"), indent=1, sort_keys=False)
    print(f"wrote BASELINE_BENCH.json: {len(queries)} queries, "
          f"{len(core)} core, production {b['production_sec']:.1f}s, "
          f"calib1 {b['calib1_sec']} calibn {b['calibn_sec']} "
          f"calibm {b.get('calibm_sec')}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
