"""Politeness / scheduling operators (SURVEY.md §2.5, north_rule).

The reference's sleeps (P3-P5) serialize one site at ~0.1-0.3 posts/s.
Partition-parallel politeness instead means:

- **salted repartition by host with skew splitting** — every host's fetches
  land in its own task(s); a mega-host (dcinside holds ~50% of synthetic
  rows) is split across ``ceil(count/target)`` salted partitions so it can't
  straggle the stage, while per-host budget accounting stays keyed by the
  true host.
- **per-host quota** (P8 page budgets as data): ``row_number() over
  (partition by host order by priority) <= quota``.
- **priority ordering** (north_rule): ``(depth asc, freshness desc,
  quota_rank asc)`` + deterministic tiebreaks ``(site_rank, page_no,
  row_idx)`` reproducing the reference's serial crawl order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_salt_plan(
    df: DataFrame,
    host_col: str = "host",
    target_rows_per_task: int = 5000,
) -> dict[str, int]:
    """One ``groupBy(host).count()`` pre-pass → per-host salt factors.

    Only MEGA-hosts (count > target) are collected; everything else defaults
    to salt_n=1 via the ``coalesce(map[host], 1)`` lookup in
    :func:`salted_repartition_by_host`. At a web-scale frontier (millions of
    hosts, north_rule) collecting every host would be a multi-million-row
    driver collect AND a multi-million-entry Catalyst literal map — the
    filter keeps both O(#mega-hosts), which skew distributions keep tiny
    (the hosts that matter are exactly the heavy tail). Compute ONCE per
    snapshot (host distribution is stable across depth rounds) and reuse.
    """
    rows = (
        df.groupBy(host_col)
        .count()
        .filter(F.col("count") > target_rows_per_task)  # mega-hosts only
        .collect()
    )
    return {
        r[host_col]: max(1, -(-int(r["count"]) // target_rows_per_task)) for r in rows
    }


def salted_repartition_by_host(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    target_rows_per_task: int = 5000,
    num_partitions: int | None = None,
    salt_plan: dict[str, int] | None = None,
) -> DataFrame:
    """Repartition fetch candidates by (host, salt).

    With ``salt_plan`` provided (precomputed via :func:`host_salt_plan`),
    no extra job runs — the factors are inlined as a literal map lookup.
    """
    if salt_plan is None:
        salt_plan = host_salt_plan(df, host_col, target_rows_per_task)
    if salt_plan:
        mapping = F.create_map(
            *[F.lit(x) for kv in salt_plan.items() for x in kv]
        )
        salt_n = F.coalesce(mapping[F.col(host_col)], F.lit(1))
    else:
        salt_n = F.lit(1)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(url_col)), salt_n))
    key = F.concat_ws("#", F.col(host_col), F.col("_salt"))
    if num_partitions:
        out = salted.repartition(num_partitions, key)
    else:
        out = salted.repartition(key)
    return out.drop("_salt")


def with_pace(
    df: DataFrame,
    min_interval_s: float,
    salt_plan: dict[str, int] | None = None,
    host_col: str = "host",
) -> DataFrame:
    """Attach the BUDGET-DIVIDED per-host pacing interval (``_pace_s``)
    the live fetch stage enforces.

    A mega-host split across ``salt_n`` concurrent tasks would otherwise
    multiply its request rate by ``salt_n`` — exactly for the hosts that
    most need politeness (round-3 verdict). Scaling the per-task interval
    by the host's salt factor keeps the AGGREGATE rate across all salted
    tasks at the same ``1 / min_interval_s`` budget an unsalted host gets.
    """
    if salt_plan:
        mapping = F.create_map(*[F.lit(x) for kv in salt_plan.items() for x in kv])
        salt_n = F.coalesce(mapping[F.col(host_col)], F.lit(1))
    else:
        salt_n = F.lit(1)
    return df.withColumn(
        "_pace_s", (F.lit(float(min_interval_s)) * salt_n).cast("double")
    )


def apply_host_quota(
    df: DataFrame,
    quota: int,
    host_col: str = "host",
    order_cols: list | None = None,
) -> DataFrame:
    """Keep at most ``quota`` rows per host, best-priority first (P8/A3)."""
    order = order_cols or [
        F.col("depth").asc(),
        F.col("warc_ts").desc(),
        F.col("url").asc(),
    ]
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def priority_sort(frontier: DataFrame) -> DataFrame:
    """Deterministic frontier priority: (depth, freshness desc, site_rank,
    page_no, row_idx) — north_rule's priority queue as a total order."""
    return frontier.orderBy(
        F.col("depth").asc(),
        F.col("warc_ts").desc_nulls_last(),
        F.col("site_rank").asc(),
        F.col("page_no").asc(),
        F.col("row_idx").asc(),
    )
