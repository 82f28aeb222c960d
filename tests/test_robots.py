"""robots.txt gating tests (P12)."""

from pyspark.sql import functions as F

from politics_crawler_spark.plans.crawl import run_crawl
from politics_crawler_spark.plans.robots import (
    gate_by_robots,
    parse_rules,
    robots_df,
)


def test_parse_rules():
    txt = """
    # comment
    User-agent: Googlebot
    Disallow: /google-only/

    User-agent: *
    Disallow: /private/
    Disallow: /tmp
    Allow: /tmp/ok
    """
    assert parse_rules(txt) == ["/private/", "/tmp"]


def test_gate_by_robots(spark):
    cand = spark.createDataFrame(
        [
            ("a.com", "https://a.com/private/1"),
            ("a.com", "https://a.com/public/2"),
            ("b.com", "https://b.com/private/3"),  # allow_all host
            ("c.com", "https://c.com/x"),  # unknown host → allowed
        ],
        "host string, link string",
    )
    robots = robots_df(
        spark,
        [
            {"host": "a.com", "rules": "/private/", "fetched_ts": None, "allow_all": False},
            {"host": "b.com", "rules": "", "fetched_ts": None, "allow_all": True},
        ],
    )
    got = {
        r.link
        for r in gate_by_robots(cand, robots, url_col="link").collect()
    }
    assert got == {
        "https://a.com/public/2",
        "https://b.com/private/3",
        "https://c.com/x",
    }


def test_crawl_with_blocking_robots(spark, pages_df):
    """Blocking one site's detail paths removes exactly that site's posts."""
    robots = robots_df(
        spark,
        [
            {
                "host": "theqoo.net",
                "rules": "/hot/",
                "fetched_ts": None,
                "allow_all": False,
            }
        ],
    )
    res = run_crawl(spark, pages_df, n_shards=8, robots=robots)
    assert res.extracted.filter(F.col("url").contains("theqoo.net/hot/")).count() == 0
    assert res.extracted.count() > 0
