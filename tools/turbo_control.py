"""Turbo-frequency control for the scaling ladder: a pure-CPU busy loop
run at the same taskset pinning as the crawl legs. Reports per-core Mops;
the 2-core leg of this box clocks measurably higher than the 8-core leg
(turbo headroom), which inflates small-N baselines and so UNDERSTATES
N→4N scaling efficiency. Efficiency normalized by this ratio is the
cluster-relevant number (every node of a real cluster runs at the
many-core operating point).

Usage: python tools/turbo_control.py   # prints one JSON line
(the script re-execs itself under taskset for each leg)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import subprocess
import sys
import time


def _spin(q, seconds=6.0):
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < seconds:
        for _ in range(100_000):
            x = x * 1.0000001 + 1.0
        n += 100_000
    q.put(n / (time.perf_counter() - t0))


def leg(n_procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_spin, args=(q,)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / len(rates) / 1e6  # per-core Mops


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps({"procs": int(sys.argv[1]), "mops_per_core": round(leg(int(sys.argv[1])), 2)}))
        sys.exit(0)
    out = {}
    for n in (2, 8):
        r = subprocess.run(
            ["taskset", "-c", f"0-{n - 1}", sys.executable, __file__, str(n)],
            capture_output=True, text=True, timeout=120,
        )
        out[f"mops_per_core_{n}c"] = json.loads(r.stdout)["mops_per_core"]
    out["frequency_ratio_2c_over_8c"] = round(
        out["mops_per_core_2c"] / out["mops_per_core_8c"], 3
    )
    print(json.dumps(out))
