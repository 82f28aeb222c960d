"""Merge the crawl-trial walls of several SAME-CODE bench_scaling runs
into one BENCH_SCALING.json-shaped crawl section.

The box's run-to-run wall variance is ±15% and per-trial up to 2-3×, so a
single run's best-of-9 ratio is a noisy draw; pooling trials across
identical-code runs (18-27 pinned trials per leg) tightens the best-of
estimate without changing the methodology (fresh JVM per invocation,
taskset pinning, alternating legs — unchanged, just more of them).

Usage: python tools/merge_scaling_runs.py out.json log1 [log2 ...]
Each log is a bench_scaling stdout capture (the per-invocation JSON lines).
"""

from __future__ import annotations

import json
import sys


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    walls: dict[str, list[float]] = {}
    best: dict[str, dict] = {}
    runs_used = []
    urls_seen: set[int] = set()
    for path in logs:
        runs_used.append(path)
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                r = json.loads(line)
                if r.get("mode") != "crawl" or "cpus" not in r or "trial_walls" not in r:
                    continue
                key = f"local{r['cpus']}"
                walls.setdefault(key, []).extend(r["trial_walls"])
                # recover processed_urls from each record (bench_scaling's
                # per-invocation lines carry urls_per_sec × wall_sec, both
                # from the same scaling_job result) — a hardcoded count
                # silently poisons merges of any other config (ADVICE r4)
                urls_seen.add(round(r["urls_per_sec"] * r["wall_sec"]))
                if key not in best or r["wall_sec"] < best[key]["wall_sec"]:
                    best[key] = r
    if not urls_seen:
        raise SystemExit("no crawl records found in the given logs")
    # identical-code runs on one snapshot process the same URL count;
    # tolerate only the ±1 rounding of the urls_per_sec field itself
    if max(urls_seen) - min(urls_seen) > max(2, max(urls_seen) // 10_000):
        raise SystemExit(
            f"logs disagree on processed_urls ({sorted(urls_seen)}): "
            "these are not same-config runs — refusing to merge"
        )
    urls = max(urls_seen)
    ladder = {}
    for key, b in best.items():
        ladder[key] = {
            "cpus": int(key.removeprefix("local")),
            "wall_sec": b["wall_sec"],
            "urls_per_sec": round(urls / b["wall_sec"], 2),
            "all_trial_walls": sorted(walls[key]),
            "n_trials": len(walls[key]),
        }
    eff = {}
    if "local2" in ladder and "local8" in ladder:
        eff["2to8_raw"] = round(
            ladder["local8"]["urls_per_sec"] / ladder["local2"]["urls_per_sec"] / 4.0, 3
        )
    result = {
        "crawl_merged": {
            "ladder": ladder,
            "scaling_efficiency": eff,
            "runs_merged": runs_used,
        }
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["crawl_merged"]["scaling_efficiency"]))


if __name__ == "__main__":
    main()
