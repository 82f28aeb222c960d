"""Memory-bandwidth ceiling probe for the scaling ladder.

The crawl ladder's kernels (Arrow column transfers, hash-join probes,
bloom folds) are DRAM-traffic-bound once per-core compute is trivial.
This probe measures the box's aggregate deliverable bandwidth at the
SAME pinned operating points as the ladder legs (cores 0-1 vs 0-7) with
two kernels:

- triad:  a[:] = b + 0.5*c over streams far beyond LLC (sequential
          read/write, like shuffle serialization and Arrow batches)
- gather: out = table[idx] with uniform-random idx (pointer-chase-ish
          reads, like hash-map probes in joins and bloom checks)

If aggregate bandwidth grows only k× from 2 to 8 cores, then NO
bandwidth-bound stage can exceed k/4 scaling efficiency on this box,
whatever the Spark plan looks like — that is the single-box ceiling the
crawl kernels run into, and it vanishes on a real cluster where each
node adds its own memory channels (every node runs at the 8-core-leg
operating point).

Usage: python tools/membw_probe.py            # prints one JSON line
(re-execs itself under taskset per leg, like turbo_control.py)
Do NOT run while a scaling ladder is in flight - it saturates the bus.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import subprocess
import sys
import time

N_TRIAD = 4_000_000  # float64s per stream: 3 streams x 32 MiB >> LLC share
N_TABLE = 8_000_000  # gather table: 64 MiB
N_IDX = 4_000_000
SECONDS = 5.0


def _triad_worker(q):
    import numpy as np

    a = np.zeros(N_TRIAD)
    b = np.random.default_rng(1).random(N_TRIAD)
    c = np.random.default_rng(2).random(N_TRIAD)
    np.add(b, 0.5 * c, out=a)  # warm
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECONDS:
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
        iters += 1
    dt = time.perf_counter() - t0
    # counted traffic per iter: read b, read c, write a (+1 RFO read of a
    # not counted -> reported number is a LOWER bound on true traffic)
    q.put(iters * 3 * 8 * N_TRIAD / dt / 1e9)


def _gather_worker(q):
    import numpy as np

    rng = np.random.default_rng(3)
    table = rng.random(N_TABLE)
    idx = rng.integers(0, N_TABLE, N_IDX)
    out = table[idx]  # warm
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECONDS:
        np.take(table, idx, out=out)
        iters += 1
    dt = time.perf_counter() - t0
    # counted: idx read + one 8B element per gather + out write; real
    # traffic is higher (each random touch pulls a 64B line)
    q.put(iters * 3 * 8 * N_IDX / dt / 1e9)


def leg(kind: str, n_procs: int) -> float:
    worker = _triad_worker if kind == "triad" else _gather_worker
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)  # aggregate GB/s across the leg's workers


if __name__ == "__main__":
    if len(sys.argv) > 2:
        print(json.dumps({"gbps": round(leg(sys.argv[1], int(sys.argv[2])), 2)}))
        sys.exit(0)
    out: dict = {}
    for kind in ("triad", "gather"):
        for n in (2, 8):
            r = subprocess.run(
                ["taskset", "-c", f"0-{n - 1}", sys.executable, __file__, kind, str(n)],
                capture_output=True, text=True, timeout=180,
            )
            out[f"{kind}_{n}c_gbps"] = json.loads(r.stdout)["gbps"]
        ratio = out[f"{kind}_8c_gbps"] / out[f"{kind}_2c_gbps"]
        out[f"{kind}_bw_ratio_8c_over_2c"] = round(ratio, 3)
        out[f"{kind}_implied_max_2to8_efficiency"] = round(ratio / 4.0, 3)
    print(json.dumps(out))
