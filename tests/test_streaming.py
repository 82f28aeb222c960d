"""Structured-Streaming surface tests (AvailableNow drain + watermark agg)."""

from pyspark.sql import functions as F

from politics_crawler_spark.streaming.micro_batch import (
    stream_extract,
    stream_hourly_rollup,
)


def test_stream_extract_available_now(spark, pages_pdf, tmp_path):
    from politics_crawler_spark.schemas import PAGES

    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "pages_out")
    ck = str(tmp_path / "ck")
    sample = pages_pdf.head(300)
    spark.createDataFrame(sample, schema=PAGES).write.parquet(src)

    q = stream_extract(spark, src, out, ck, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    n_detail = int((sample["text"] != "").sum())
    assert got.count() == n_detail
    # streaming path produces the same byte-identical content
    exp = spark.createDataFrame(sample[["url", "text"]])
    j = got.join(exp, on="url")
    assert j.filter(F.col("content") != F.col("text")).count() == 0


def test_stream_hourly_rollup_batch_parity(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (dt.datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (dt.datetime(2024, 1, 1, 11, 5), "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {(r.hour, r.event_type): (r.n, r.total_value)
           for r in stream_hourly_rollup(df).collect()}
    assert out[(dt.datetime(2024, 1, 1, 10, 0), "click")] == (2, 3.0)
    assert out[(dt.datetime(2024, 1, 1, 11, 0), "view")] == (1, 3.0)
