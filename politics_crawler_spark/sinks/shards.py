"""Shard-layout sink: materialize the token-budget shard assignment
(`operators/curation.py::token_budget_shards`) as the on-disk layout a
pre-training data loader actually consumes — one directory per shard,
JSONL records inside (the interchange format of published LLM data
recipes: The Pile, Dolma, RedPajama all ship JSONL shards).

Scale notes (100 TB):
- The write is `partitionBy(shard_id)` — Spark's native dynamic-partition
  write. One shuffle keyed by the long `shard_id` routes each document to
  its shard's writer; no driver-side loop over shards, no collect.
- `repartition(shard_id)` before the write makes one task own each
  shard's rows, so each shard directory holds ONE file (what a data
  loader wants) instead of one fragment per upstream partition.
  shard_id is derived from a running token sum, so shard populations are
  near-uniform by construction (≈ budget tokens each) — the repartition
  cannot skew.
- Documents larger than the budget land in their own shard (the
  assignment's floor semantics); the sink never splits a document.

The reference appends rows to flat per-site CSVs
(crawler_schedule.py:150-179); a partitioned training-shard layout is
engine-added surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import token_budget_shards


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    budget: int = 2000,
    bucket_docs: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign token-budget shards and write `out_dir/shard_id=N/*.json`
    (JSONL: one record per line with id, token count, and text).

    Returns the per-shard audit table (shard_id, n_docs, shard_tokens) —
    what an operator inspects before launching a training run.
    """
    # localCheckpoint: the partitioned write AND the audit aggregation both
    # consume the assignment (ADVICE r5: two full lineage executions); the
    # checkpointed rows are fixed-width (id, n_tokens, shard_id) and the
    # blocks free with the returned audit frame. (token_budget_shards
    # additionally cuts its own tokenize pass internally — r6.)
    assign = token_budget_shards(
        df, budget=budget, bucket_docs=bucket_docs, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    rows = df.select(id_col, text_col).join(assign, id_col)
    (
        rows.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .json(out_dir)
    )
    return (
        assign.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
        )
        .orderBy("shard_id")
    )


def read_jsonl_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the layout back (partition column `shard_id` is recovered
    from the directory names)."""
    return spark.read.json(out_dir)
