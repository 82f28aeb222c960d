"""Multi-executor scaling analog: E separate 4-core-pinned JVMs ("executors")
each extracting a disjoint slice of the same synthetic snapshot.

This is the closest single-box stand-in for the north_rule's "N executors →
4N executors" criterion: a real cluster scales by adding executor
*processes* (each with its own JVM heap, GC, and Python worker pool), not by
growing one JVM — exactly what this harness varies. The single-JVM
`tools/bench_scaling.py` numbers understate cluster scaling because one JVM
at 32 threads serializes on allocation/GC that per-executor JVMs don't
share.

Usage: python tools/bench_multiexec.py [pages] — runs E=2 (8 cores) vs
E=8 (32 cores), each executor 4 cores, and reports aggregate urls/sec +
scaling efficiency. Appends results to BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ENV = {**os.environ, "SPARK_DRIVER_MEM": "12g"}  # per-executor JVM heap

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
CORES_PER_EXEC = 4


def run_fleet(n_exec: int) -> dict:
    procs = []
    slice_n = PAGES // n_exec
    t0 = time.time()
    for i in range(n_exec):
        lo, hi = i * slice_n, (i + 1) * slice_n if i < n_exec - 1 else PAGES
        cores = f"{i * CORES_PER_EXEC}-{(i + 1) * CORES_PER_EXEC - 1}"
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", cores, sys.executable, "tools/scaling_job.py",
                 "--cpus", str(CORES_PER_EXEC), "--pages", str(PAGES),
                 "--mode", "extract", "--repeat", "1",
                 "--row-lo", str(lo), "--row-hi", str(hi)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                cwd="/root/repo", env=ENV,
            )
        )
    urls = 0
    walls = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        urls += r["processed_urls"]
        walls.append(r["wall_sec"])
    fleet_wall = max(walls)
    return {
        "executors": n_exec,
        "cores_per_executor": CORES_PER_EXEC,
        "total_cores": n_exec * CORES_PER_EXEC,
        "processed_urls": urls,
        "wall_sec_max": fleet_wall,
        "wall_sec_all": walls,
        "urls_per_sec": round(urls / fleet_wall, 2),
        "launch_to_done_sec": round(time.time() - t0, 2),
    }


def main():
    lo = run_fleet(2)
    print(json.dumps(lo))
    hi = run_fleet(8)
    print(json.dumps(hi))
    eff = round((hi["urls_per_sec"] / lo["urls_per_sec"]) / 4.0, 3)
    print(json.dumps({"mode": "extract-multiexec", "efficiency_2to8_executors": eff}))
    try:
        with open("/root/repo/BENCH_SCALING.json") as f:
            data = json.load(f)
    except FileNotFoundError:
        data = {}
    data["extract_multiexec"] = {
        "executors2": lo, "executors8": hi,
        "scaling_efficiency_NtoFourN": eff,
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(data, f, indent=2)


if __name__ == "__main__":
    main()
