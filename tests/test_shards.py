"""JSONL shard sink (sinks/shards.py): layout, budget accounting, and
round-trip fidelity of the token-budget shard materialization."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def test_write_jsonl_shards_layout_and_budget(spark, tmp_path):
    from politics_crawler_spark.sinks.shards import (
        read_jsonl_shards,
        write_jsonl_shards,
    )

    # 40 docs x 10 tokens = 400 tokens; budget 100 -> 4 shards of 10 docs
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(10))) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    audit = write_jsonl_shards(d, out, budget=100, bucket_docs=8)

    a = {r["shard_id"]: r for r in audit.collect()}
    assert sorted(a) == [0, 1, 2, 3]
    assert all(a[s]["n_docs"] == 10 and a[s]["shard_tokens"] == 100 for s in a)

    # one directory per shard, ONE data file per shard (repartition by id)
    dirs = sorted(
        p for p in os.listdir(out) if p.startswith("shard_id=")
    )
    assert dirs == ["shard_id=0", "shard_id=1", "shard_id=2", "shard_id=3"]
    for sd in dirs:
        files = [
            f
            for f in glob.glob(os.path.join(out, sd, "part-*"))
            if not f.endswith(".crc")
        ]
        assert len(files) == 1

    # round trip: every doc back, in its assigned shard, text intact
    back = read_jsonl_shards(spark, out)
    assert back.count() == 40
    assert back.select("doc_id").distinct().count() == 40
    orig = d.withColumnRenamed("text", "orig_text")
    j = back.join(orig, "doc_id")
    assert j.filter(F.col("text") != F.col("orig_text")).count() == 0
    # shard membership matches the floor(running_total/budget) contract
    got = {r["doc_id"]: r["shard_id"] for r in back.collect()}
    assert all(got[i] == i // 10 for i in range(40))


def test_write_jsonl_shards_oversized_doc_gets_own_shard(spark, tmp_path):
    from politics_crawler_spark.sinks.shards import write_jsonl_shards

    # doc 1 alone exceeds the budget; it must not be split and later
    # docs start new shards after it
    rows = [
        (0, "a b c"),                                 # 3 tokens -> shard 0
        (1, " ".join(f"x{k}" for k in range(25))),    # 25 tokens, budget 10
        (2, "d e f"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    audit = write_jsonl_shards(d, str(tmp_path / "s"), budget=10, bucket_docs=2)
    a = {r["shard_id"]: r for r in audit.collect()}
    # offsets: doc0 starts 0 -> shard 0; doc1 starts 3 -> shard 0 (floor
    # 3/10); doc2 starts 28 -> shard 2
    assert a[0]["n_docs"] == 2 and a[0]["shard_tokens"] == 28
    assert a[2]["n_docs"] == 1 and a[2]["shard_tokens"] == 3
