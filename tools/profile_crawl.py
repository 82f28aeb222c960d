"""Profile the bench-shaped crawl (local[N], sf-proportional snapshot) with
per-phase timing, to reconcile BENCH_r01 (63 s) vs BENCH_r02 (101 s).

Usage:
    python tools/profile_crawl.py [--cpus 32] [--sf 0.1] [--trials 2]
        [--defer {auto,on,off}] [--pool-parts N]

Prints one JSON line per trial with: total wall, snapshot synth+persist wall,
salt-plan wall, pool-stage wall, per-round (t_build/t_seen/t_stale/wall),
terminal-extract wall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--defer", choices=["auto", "on", "off"], default="auto")
    args = ap.parse_args()

    from politics_crawler_spark.plans.crawl import run_crawl
    from politics_crawler_spark.session import get_spark
    from politics_crawler_spark.sources.synthetic_pages import (
        crawl_boards,
        synthesize_pages,
    )

    spark = get_spark(
        app_name="pcs-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = max(2000, int(4_000_000 * args.sf))
    replicas = max(1, round(n_pages / (19 * 2800)))
    defer = None if args.defer == "auto" else (args.defer == "on")

    for trial in range(args.trials):
        t0 = time.time()
        pages = synthesize_pages(spark, n_pages, replicas=replicas).persist()
        n_rows = pages.count()
        t_synth = time.time() - t0

        t1 = time.time()
        res = run_crawl(
            spark,
            pages,
            n_shards=max(16, args.cpus),
            host_target_rows=2000,
            boards=crawl_boards(replicas),
            pages_per_round=32,
            defer_extraction=defer,
        )
        t_loop = time.time() - t1
        t2 = time.time()
        n_extracted = res.extracted.count()
        t_terminal = time.time() - t2
        crawl_sec = time.time() - t1
        n_lists = sum(m["list_pages"] for m in res.metrics)
        print(
            json.dumps(
                {
                    "trial": trial,
                    "cpus": args.cpus,
                    "snapshot": n_rows,
                    "t_synth": round(t_synth, 2),
                    "t_loop": round(t_loop, 2),
                    "t_terminal": round(t_terminal, 2),
                    "crawl_sec": round(crawl_sec, 2),
                    "urls_per_sec": round((n_extracted + n_lists) / crawl_sec, 1),
                    "extracted": n_extracted,
                    "rounds": res.rounds,
                    "round_metrics": [
                        {
                            k: m[k]
                            for k in ("round", "wall_ms", "t_build_ms", "t_seen_ms", "t_stale_ms")
                        }
                        for m in res.metrics
                    ],
                }
            ),
            flush=True,
        )
        for c in res.caches:
            c.unpersist()
        pages.unpersist()


if __name__ == "__main__":
    main()
