"""URL scalar functions: canonicalization, hashing, post-id extraction.

L6/L7 from SURVEY.md §2.7. Everything that can stay JVM-side does
(``regexp_extract``, ``xxhash64``, ``parse_url``); only ``urljoin`` needs an
Arrow-batched pandas UDF (urllib semantics aren't expressible in Spark SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """``urljoin(base, href)`` per row (reference: dcinside_politics.py:164),
    vectorized at the Arrow-batch level."""
    from urllib.parse import urljoin

    return pd.Series(
        [
            urljoin(b, h) if (b is not None and h is not None) else None
            for b, h in zip(base, href)
        ]
    )


def canonical_url(base: Column, href: Column) -> Column:
    """Absolute URL for a discovered href. JVM fast path: hrefs that are
    already absolute skip the UDF entirely (common case at scale)."""
    return F.when(
        href.startswith("http://") | href.startswith("https://"), href
    ).otherwise(canonicalize_udf(base, href))


def url_hash(url: Column) -> Column:
    """64-bit key for the seen-filter / dedup (north_rule: canonicalized-URL
    hash). xxhash64 is a JVM built-in — no Python in the hot path."""
    return F.xxhash64(url)


def host_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def is_valid_post_url(url: Column) -> Column:
    """F1 validity gate (dcinside_politics.py:26-29 + fmkorea variant):
    reject null / javascript: / the dcinside ad host; require http prefix."""
    return (
        url.isNotNull()
        & url.startswith("http")
        & ~url.contains("javascript:")
        & ~url.contains("addc.dcinside.com")
    )


# Per-site post-id extraction patterns (L6). Fallback: trailing /<digits>,
# query string stripped (ruliweb_politics.py:233, fmkorea_politics.py:227).
_SITE_PID_PATTERN = {
    "bobaedream": r"No=(\d+)",  # bobaedream_politics.py:37-41
    "dcinside": r"no=(\d+)",
    "ppomppu": r"no=(\d+)",
    "82cook": r"num=(\d+)",
    "mlbpark": r"id=(\d+)",
}
_DEFAULT_PID_PATTERN = r"/(\d+)(?:[?#][^/]*)?$"  # last path segment, query stripped


def post_id_from_url(site: Column, url: Column) -> Column:
    expr = F.regexp_extract(url, _DEFAULT_PID_PATTERN, 1)
    for s, pat in _SITE_PID_PATTERN.items():
        expr = F.when(site == s, F.regexp_extract(url, pat, 1)).otherwise(expr)
    return expr
