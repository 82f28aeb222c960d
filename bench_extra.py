"""Side benchmark harness for optimization work (round 6). bench.py is the
FROZEN driver contract; this file exists so per-query isolation runs, plan
captures, and ad-hoc trial counts never touch it (guide §1.4: noop sink,
§1.5: labeled jobs).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q16_simhash_pairs q49_drop_dup_spans
  python bench_extra.py --plans plans/r06 --suffix before q16_simhash_pairs
  python bench_extra.py --all          # the full BENCH_QUERIES list

Prints one JSON line {"queries": {name: best_sec}, "trials": {...}, "sf": ...}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt explain('formatted') captures")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=TRIALS)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES, sf_of
    from politics_crawler_spark.session import get_spark

    names = BENCH_QUERIES if args.all else args.names
    sf = sf_of(SF_DIR)
    spark = get_spark(app_name="pcs-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def hygiene():
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    trials: dict[str, list[float]] = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            hygiene()
        ts = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        trials[name] = ts
        hygiene()

    out = {
        "queries": {k: min(v) for k, v in trials.items()},
        "trials": trials,
        "sf": sf,
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
