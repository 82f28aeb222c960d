"""Two-cluster-size scaling evidence (BASELINE.json north_rule, sandbox
plan per BASELINE.md): run the identical job at local[8] ("N executors")
and local[32] ("4N executors") on the same synthetic input, in separate
JVMs, and report throughput at both plus scaling efficiency
(rate_32 / rate_8) / 4. Writes BENCH_SCALING.json and refreshes the
measured-numbers section in BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000


def run(cpus: int, mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/scaling_job.py", "--cpus", str(cpus),
         "--pages", str(PAGES), "--mode", mode],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[scaling_job cpus={cpus} mode={mode} rc={out.returncode}]\n")
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise RuntimeError("scaling job produced no result line")
    return json.loads(lines[-1])


def main():
    results = {}
    for mode in ("extract", "crawl"):
        lo = run(8, mode)
        hi = run(32, mode)
        eff = round((hi["urls_per_sec"] / lo["urls_per_sec"]) / 4.0, 3)
        results[mode] = {"local8": lo, "local32": hi, "scaling_efficiency": eff}
        print(json.dumps({"mode": mode, "local8": lo["urls_per_sec"],
                          "local32": hi["urls_per_sec"], "efficiency": eff}))
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
