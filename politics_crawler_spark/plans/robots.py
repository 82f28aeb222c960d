"""robots.txt gating (P12) — ABSENT in the reference (no robotparser
anywhere; SURVEY.md §2.5), REQUIRED by north_rule.

The ``robots`` table holds one row per host: a serialized rule set (subset
of the robots.txt grammar: newline-separated ``Disallow: <path-prefix>``
lines for ``User-agent: *``) plus an ``allow_all`` fast-path flag. The table
is tiny relative to the frontier (one row per distinct host) → broadcast
join; the path check is a vectorized pandas UDF over (rules, url).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..schemas import ROBOTS


def parse_rules(robots_txt: str) -> list[str]:
    """Extract Disallow prefixes for User-agent: * (minimal, deterministic)."""
    out = []
    applies = False
    for line in robots_txt.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            out.append(val)
    return out


@pandas_udf(T.BooleanType())
def can_fetch_udf(rules: pd.Series, url: pd.Series) -> pd.Series:
    """True when no Disallow prefix matches the URL path."""
    from urllib.parse import urlparse

    out = []
    for r, u in zip(rules, url):
        if not r or u is None:
            out.append(True)
            continue
        path = urlparse(u).path or "/"
        qs = urlparse(u).query
        full = path + ("?" + qs if qs else "")
        out.append(not any(full.startswith(p) for p in r.split("\n")))
    return pd.Series(out)


def robots_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schema=ROBOTS)


def allow_all_robots(spark: SparkSession, hosts: list[str]) -> DataFrame:
    return robots_df(
        spark,
        [
            {"host": h, "rules": "", "fetched_ts": None, "allow_all": True}
            for h in hosts
        ],
    )


def gate_by_robots(candidates: DataFrame, robots: DataFrame,
                   host_col: str = "host", url_col: str = "url") -> DataFrame:
    """Broadcast-join the robots table; drop disallowed URLs.

    Unknown hosts (no robots row) are allowed — the fetch stage would
    populate the table in a live deployment.
    """
    r = robots.select(
        F.col("host").alias(host_col), F.col("rules").alias("_rules"),
        F.col("allow_all").alias("_allow_all"),
    )
    joined = candidates.join(F.broadcast(r), on=host_col, how="left")
    ok = (
        F.col("_allow_all").isNull()
        | F.col("_allow_all")
        | can_fetch_udf(F.col("_rules"), F.col(url_col))
    )
    return joined.filter(ok).drop("_rules", "_allow_all")
