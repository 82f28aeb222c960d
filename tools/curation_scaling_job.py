"""One curation-tier scaling job: run a training-data operator at a given
local[N] parallelism on the shared corpus snapshot, print one JSON line.
Invoked by tools/curation_scaling.py in a fresh subprocess per leg.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def synth_docs(spark, docs: int, partitions: int):
    """Deterministic synthetic corpus: ~60 hash-derived tokens per doc
    over a 20k vocab, plus a per-source 8-token boilerplate trailer
    (40 sources ⇒ every source's trailer is massively cross-doc
    duplicated — the Zipf-headed dup-gram skew the operator targets)."""
    from pyspark.sql import functions as F

    d = spark.range(0, docs, 1, partitions)
    n_body = (F.pmod(F.xxhash64("id"), F.lit(41)) + 40).cast("int")  # 40-80
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_body - 1),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(20000))
            ),
        ),
    )
    src = F.pmod(F.col("id"), F.lit(40))
    trailer = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.concat(F.lit("b"), src * 8 + j),
        ),
    )
    return d.select(
        F.col("id").alias("doc_id"),
        F.concat(body, F.lit(" "), trailer).alias("text"),
        F.concat(F.lit("src"), src).alias("source"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--mode", choices=["dupngram", "lmscore"], default="dupngram")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--write-snapshot", default=None, metavar="DIR")
    ap.add_argument("--read-snapshot", default=None, metavar="DIR")
    args = ap.parse_args()

    import os

    os.environ.setdefault("SPARK_DRIVER_MEM", "64g")

    from pyspark.sql import functions as F

    from politics_crawler_spark.session import get_spark

    spark = get_spark(
        app_name=f"curation-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.write_snapshot:
        synth_docs(spark, args.docs, 64).write.mode("overwrite").parquet(
            args.write_snapshot
        )
        print(json.dumps({"wrote": args.write_snapshot, "docs": args.docs}))
        return

    docs = spark.read.parquet(args.read_snapshot)
    n_docs = docs.count()  # warm file listing only; data stays on disk

    from politics_crawler_spark.operators.corpus_quality import (
        dup_ngram_coverage,
        lm_score,
        unigram_lm,
    )

    best = None
    trial_walls = []
    for trial in range(args.repeat):
        t0 = time.time()
        if args.mode == "dupngram":
            out = dup_ngram_coverage(docs, n=5, min_docs=2)
            # force every column end-to-end (count alone would let
            # Catalyst prune the coverage join)
            n_flagged = out.filter(F.col("dup_coverage") > 0.05).count()
        else:
            lm = unigram_lm(docs)
            out = lm_score(docs, lm, oov=0.0)
            n_flagged = out.filter(F.col("bits_per_token") > 0).count()
            spark.catalog.clearCache()  # the persisted LM count table
        wall = time.time() - t0
        trial_walls.append(round(wall, 2))
        print(json.dumps({"trial": trial, "wall": round(wall, 2),
                          "n_flagged": n_flagged}), file=sys.stderr)
        if best is None or wall < best:
            best = wall
        import gc

        spark.sparkContext._jvm.System.gc()
        gc.collect()

    print(json.dumps({
        "cpus": args.cpus, "mode": args.mode, "docs": n_docs,
        "wall_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "trial_walls": trial_walls,
    }))


if __name__ == "__main__":
    main()
