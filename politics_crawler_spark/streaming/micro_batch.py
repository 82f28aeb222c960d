"""Structured-Streaming surface for the engine (SURVEY.md §2.9).

The reference is pure batch on a 4×/day cron (crawler_schedule.py:373-376);
the SURVEY decision is batch-over-snapshots. This module provides the
equivalent streaming entry points for deployments that prefer them:

- ``stream_extract``: readStream over a pages directory → stateless
  extraction (same E1-E11 UDF) → parquet sink with checkpointing,
  ``Trigger.AvailableNow`` = the reference's "run now, drain, stop" cadence.
- ``stream_hourly_rollup``: event-time windowed aggregation with watermark
  (the A2 metrics rollup as a stream; late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import site_expr, with_extraction
from ..schemas import PAGES


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Extract every detail page arriving in ``pages_dir`` (parquet files).

    Returns the StreamingQuery; caller awaits termination. Stateless map —
    scales with input files, no state store.
    """
    src = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )
    detail = src.filter(F.col("text") != "").withColumn(
        "site", site_expr(F.parse_url(F.col("url"), F.lit("HOST")))
    )
    out = with_extraction(detail).select(
        "url", "warc_ts", "site", "content", "images", "status"
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hourly_rollup(
    events: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked hourly rollup (works on a streaming or batch frame)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )
