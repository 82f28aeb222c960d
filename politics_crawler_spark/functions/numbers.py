"""Numeric list-field parsing (L4 views, L5 recommend) — pure Spark exprs.

Reference semantics:
- views: ``int(s) if s.isdigit() else 0`` (dcinside_politics.py:193) with
  comma stripping (ruliweb_politics.py:168) and clien's ``"1.2 k"`` →
  1200 scaling (clien_parkboard.py:33-46).
- recommend: ppomppu ``"3 - 0"`` → 3 (ppomppu_freeboard.py:88-101);
  otherwise numeric text, default 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_views(txt: Column) -> Column:
    cleaned = F.regexp_replace(F.trim(txt), ",", "")
    k_num = F.regexp_extract(cleaned, r"^([0-9]+(?:\.[0-9]+)?)\s*[kK]$", 1)
    return (
        F.when(
            k_num != "", (k_num.cast("double") * 1000).cast("long")
        )
        .otherwise(F.coalesce(cleaned.try_cast("long"), F.lit(0)))
        .alias("views")
    )


def parse_recommend(txt: Column) -> Column:
    first = F.split(F.trim(txt), r"\s+-\s+").getItem(0)
    return F.coalesce(
        first.try_cast("long"), F.trim(txt).try_cast("long"), F.lit(0)
    ).alias("recommend")
