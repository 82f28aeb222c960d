"""Scaling evidence for the TRAINING-DATA tier (same two-cluster-size
methodology as the crawl ladder in tools/bench_scaling.py): run a
representative curation operator at pinned local[2] vs local[8] on the
same on-disk corpus, fresh JVM per invocation, legs alternating,
best-of-all-trials per leg, report throughput at both plus the 2→8
scaling efficiency.

The operator under test is `dup_ngram_coverage` — the shuffle-heaviest
shape in the tier (two gram-keyed aggregations + a (doc_id, pos)
position dedup + a doc-keyed rollup; every exchange fixed-width). A
`--mode lmscore` variant covers the aggregation+broadcast-join shape
(unigram-LM train + score).

Corpus: deterministic synthetic documents (hash-derived tokens over a
bounded vocab) with a per-source shared boilerplate trailer so
cross-document duplicated n-grams actually exist (~the Zipf-headed skew
the operator is built for). Written once as parquet (untimed prep);
every leg reads the same files, so scan parallelism scales with cores.

Usage:
  python tools/curation_scaling.py [docs]          # full ladder -> JSON
  python tools/curation_scaling.py --calibrate     # one quick local[8] leg
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DOCS = 1_200_000
for a in sys.argv[1:]:
    if a.isdigit():
        DOCS = int(a)
LADDER = [2, 8]
# invocations × 3 in-JVM trials = pinned trials per leg; calibration showed
# 10×+ cold-trial inflation (JIT + cold page cache), so best-of-6 with
# alternating legs is the floor for a usable estimate
INVOCATIONS = int(os.environ.get("CURATION_INVOCATIONS", "2"))
MODES = os.environ.get("CURATION_MODES", "dupngram").split(",")
SNAPSHOT = f"/tmp/docs_snapshot_{DOCS}"


def job(argv: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(
        argv, capture_output=True, text=True, cwd="/root/repo", timeout=3600
    )


def prep_snapshot():
    if os.path.exists(SNAPSHOT + "/_SUCCESS"):
        return
    r = job(
        [sys.executable, "tools/curation_scaling_job.py", "--cpus", "24",
         "--docs", str(DOCS), "--write-snapshot", SNAPSHOT]
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:] + "\n")
        raise RuntimeError("snapshot prep failed")


def run(cpus: int, mode: str) -> dict:
    # Pin the whole process tree to exactly `cpus` cores (local[N] alone
    # lets JVM scan threads exceed N and inflate the small-N baseline).
    r = job(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "tools/curation_scaling_job.py", "--cpus", str(cpus),
         "--docs", str(DOCS), "--mode", mode,
         "--read-snapshot", SNAPSHOT, "--repeat", "3"]
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[curation_scaling cpus={cpus} rc={r.returncode}]\n")
        sys.stderr.write(r.stderr[-4000:] + "\n")
        raise RuntimeError("curation scaling job produced no result line")
    return json.loads(lines[-1])


def main():
    if "--calibrate" in sys.argv:
        prep_snapshot()
        print(json.dumps(run(8, "dupngram"), indent=1))
        return
    prep_snapshot()
    out: dict = {}
    for mode in MODES:
        ladder: dict = {}
        walls: dict = {f"local{c}": [] for c in LADDER}
        for inv in range(INVOCATIONS):
            for cpus in LADDER:  # legs alternate so host drift hits both
                r = run(cpus, mode)
                key = f"local{cpus}"
                walls[key].extend(r.get("trial_walls", [r["wall_sec"]]))
                if key not in ladder or r["wall_sec"] < ladder[key]["wall_sec"]:
                    ladder[key] = r
                print(json.dumps({"mode": mode, "invocation": inv,
                                  "cpus": cpus, "wall_sec": r["wall_sec"],
                                  "trial_walls": r.get("trial_walls")}),
                      flush=True)
                # persist after EVERY leg: a killed/timed-out ladder keeps
                # the legs it paid for (a degraded-host run taught this)
                with open("BENCH_SCALING_CURATION.partial.json", "w") as f:
                    json.dump({"mode": mode, "ladder": ladder,
                               "walls": walls, "docs": DOCS,
                               "done": out}, f, indent=1)
        for key in ladder:
            ladder[key]["all_trial_walls"] = walls[key]
        lo, hi = (f"local{LADDER[0]}", f"local{LADDER[1]}")
        eff = (ladder[hi]["docs_per_sec"] / ladder[lo]["docs_per_sec"]) / (
            LADDER[1] / LADDER[0]
        )
        out[mode] = {
            "ladder": ladder,
            "scaling_efficiency": {f"{LADDER[0]}to{LADDER[1]}": round(eff, 3)},
        }
    out["docs"] = DOCS
    with open("BENCH_SCALING_CURATION.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["scaling_efficiency"] for k, v in out.items()
                      if isinstance(v, dict) and "scaling_efficiency" in v}))


if __name__ == "__main__":
    main()
