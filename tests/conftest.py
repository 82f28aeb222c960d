from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from politics_crawler_spark.session import get_spark

    s = get_spark(app_name="pcs-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    """Small deterministic pages table as pandas (no Spark needed)."""
    from politics_crawler_spark.sources.synthetic_pages import synthesize_pages_pandas

    return synthesize_pages_pandas(2500)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    from politics_crawler_spark.schemas import PAGES

    df = spark.createDataFrame(pages_pdf, schema=PAGES).cache()
    df.count()
    return df


SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"
