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
    """Absolute URL for a discovered href — pure JVM expressions.

    A pandas UDF here would run for EVERY row even under a ``when`` branch
    (ArrowEvalPython evaluates the whole batch before the projection picks
    branches), putting Python in the hottest path of the engine. The
    urljoin cases that occur in board markup are all expressible JVM-side:

      absolute            -> href
      protocol-relative   -> scheme + href
      root-relative (/x)  -> scheme://host + href
      query-only (?x)     -> base path + href
      relative (x/y)      -> base directory + href

    (:func:`canonicalize_udf` remains available for exotic grammars.)
    """
    scheme = F.regexp_extract(base, r"^(https?):", 1)
    origin = F.regexp_extract(base, r"^(https?://[^/?#]+)", 1)
    basedir = F.regexp_extract(base, r"^(.*/)[^/?#]*(?:[?#].*)?$", 1)
    basepath = F.regexp_extract(base, r"^([^?#]*)", 1)
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(href.startswith("http://") | href.startswith("https://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(href.startswith("?"), F.concat(basepath, href))
        .when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), href)  # other schemes
        .otherwise(F.concat(basedir, href))
    )


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
