"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl_urls_per_sec": ...}

Each query is forced end-to-end with the noop writer (count() would let
Catalyst prune UDF columns and under-report). The crawl benchmark
synthesizes a pages snapshot scaled to the sf and runs the full frontier
loop; its throughput (list pages + detail posts per second) is the
BASELINE.json primary metric at sandbox scale.

BEST-OF-N ($SPARK_GRAFT_TRIALS, default 3): this host's wall clock varies
±30-50% run-to-run (BENCH_SCALING.json raw trials), so single-shot numbers
are coin flips — BENCH_r02's crawl "regression" (101 s vs 63 s, identical
code paths re-measured at 28-47 s) was exactly that. Reported per-query time
= min over trials; all raw trials ship in "trials" for auditability.

TRIAL DEPTH IS ADAPTIVE (VERDICT r4 #1: q17's best-of-3 was still
descending at trial 3 — JIT/cache warm-up had not converged, flipping the
index-vs-exact comparison): queries whose FIRST trial exceeds
$SPARK_GRAFT_HEAVY_SEC (default 2 s) get $SPARK_GRAFT_TRIALS_HEAVY trials
(default 7); sub-second queries keep the base count. Trials of one query
run CONSECUTIVELY (not round-robin) so its code paths and caches stay warm
across its own trials, and the cache is cleared BETWEEN queries
(catalog.clearCache + GC) so per-query persists cannot accumulate across
the loop (ADVICE r4: q35's corpus / q17's embeddings persisted per trial
with nothing dropping them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
TRIALS_HEAVY = int(os.environ.get("SPARK_GRAFT_TRIALS_HEAVY", "7"))
HEAVY_SEC = float(os.environ.get("SPARK_GRAFT_HEAVY_SEC", "2.0"))

BENCH_QUERIES = [
    "q01_filter_project",
    "q02_agg_lineitem",
    "q03_join_agg",
    "q04_topk_per_group",
    "q06_latest_per_user",
    "q07_exact_dedup",
    "q08_token_count",
    "q09_quality",
    "q11_fingerprint_dups",
    "q13_hourly_rollup",
    "q14_ann_cosine",
    "q15_minhash_pairs",
    "q16_simhash_pairs",
    "q17_lsh_ann",
    "q32_ivf_ann",
    "q33_minhash_dedup",
    "q34_ann_exact_clustered",  # brute-force baseline q17/q32 must beat
    "q35_embedding_neardup_dedup",
    "q36_gopher_repetition",
    "q37_pii_redact",
    "q38_c4_doc_gate",
    "q39_ngram_freq",
    "q40_media_header_decode",
    "q41_decontaminate",
    "q42_line_dedup",
    "q43_mixture_sample",
    "q44_token_shards",
    "q45_curation_pipeline",
    "q46_lm_score_buckets",
    "q47_dup_ngram_coverage",
    "q48_source_quality_gate",
    "q49_drop_dup_spans",
    "q50_bm25_search",
    "q51_cardinality_contract",
]


def sf_of(path: str) -> float:
    tail = os.path.basename(path.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def main():
    import __spark_entry__ as entrymod
    from politics_crawler_spark.plans.crawl import run_crawl
    from politics_crawler_spark.session import get_spark
    from politics_crawler_spark.sources.synthetic_pages import synthesize_pages

    sf = sf_of(SF_DIR)
    spark = get_spark(app_name="pcs-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import gc as _gc

    def _hygiene():
        # drop query-scoped persists + checkpoint blocks between queries
        # (ContextCleaner acts only after GC notices the dead refs)
        spark.catalog.clearCache()
        _gc.collect()
        spark.sparkContext._jvm.System.gc()

    qs = entrymod.queries()
    trials: dict[str, list[float]] = {}
    trials["crawl"] = []
    for name in BENCH_QUERIES:
        ts: list[float] = []
        target = TRIALS
        while len(ts) < target:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            if len(ts) == 1 and ts[0] > HEAVY_SEC:
                target = max(TRIALS, TRIALS_HEAVY)
        trials[name] = ts
        _hygiene()
    times = {name: min(ts) for name, ts in trials.items() if ts}

    # crawl throughput at sf-proportional snapshot size; wide frontier
    # (replicated boards — a web-scale frontier grows in hosts, not depth)
    from politics_crawler_spark.sources.synthetic_pages import crawl_boards

    n_pages = max(2000, int(4_000_000 * sf))
    replicas = max(1, round(n_pages / (19 * 2800)))
    pages = synthesize_pages(spark, n_pages, replicas=replicas).persist()
    n_rows = pages.count()
    best = None
    for _ in range(TRIALS):
        t0 = time.time()
        res = run_crawl(
            spark, pages, n_shards=max(16, CPUS), host_target_rows=2000,
            boards=crawl_boards(replicas), pages_per_round=32,
        )
        n_extracted = res.extracted.count()
        crawl_sec = round(time.time() - t0, 3)
        trials["crawl"].append(crawl_sec)
        if best is None or crawl_sec < best[0]:
            best = (crawl_sec, n_extracted, res.rounds,
                    sum(m["list_pages"] for m in res.metrics))
        for c in res.caches:  # drop per-run caches; pages stays persisted
            c.unpersist()
        # churn hygiene between trials: free checkpoint blocks/broadcasts
        # (no clearCache here — pages must STAY cached across crawl trials)
        del res
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
    crawl_sec, n_extracted, n_rounds, n_lists = best
    times["crawl"] = crawl_sec
    urls_per_sec = round((n_extracted + n_lists) / crawl_sec, 2)

    out = {
        "metric": "headline query wall-clock + crawl URLs/sec (frontier loop, bloom seen-filter, E1-E11 extraction)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "trials": trials,
        "trial_counts": {k: len(v) for k, v in trials.items()},
        "trial_policy": f"base {TRIALS}, {TRIALS_HEAVY} when trial1 > {HEAVY_SEC}s; consecutive per query, clearCache between queries",
        "sf": sf,
        "crawl_pages_snapshot": n_rows,
        "crawl_extracted": n_extracted,
        "crawl_rounds": n_rounds,
        "crawl_urls_per_sec": urls_per_sec,
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
