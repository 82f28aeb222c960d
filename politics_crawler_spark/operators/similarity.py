"""Similarity search over embedding columns (task directive).

- cosine_topk: brute-force exact top-k — the correctness baseline. Query
  side broadcast; similarity via zip_with/aggregate (JVM, codegen); per-query
  top-k via window. O(Q×N) but embarrassingly parallel — the right baseline
  even at scale when Q is small.
- lsh_topk: random-hyperplane LSH bucketing — the scale path. Vectors only
  meet within matching buckets (equi-join), cutting the candidate set by
  ~2^bits per table; probes several hash tables to keep recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine(a, b) -> "F.Column":
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query ≠ neighbor)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    joined = vectors.alias("v").join(
        F.broadcast(q), on=F.col("query_id") != F.col(id_col)
    )
    sim = F.round(_cosine(F.col("q_vec"), F.col(vec_col)), round_to)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def make_hyperplane_udf(bits: int = 12, seed: int = 11, dim: int | None = None):
    """Random-hyperplane bucketer. The plane matrix is derived lazily from
    the FIRST Arrow batch's vector width (deterministic: seed + dim fix the
    planes), so no driver-side action is needed to sniff the embedding dim
    — the query plan stays action-free until the terminal job."""
    planes_cache: dict[int, np.ndarray] = {}

    def _planes(d: int) -> np.ndarray:
        if d not in planes_cache:
            planes_cache[d] = np.random.default_rng(seed).standard_normal((d, bits))
        return planes_cache[d]

    if dim is not None:
        _planes(dim)

    @pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ _planes(mat.shape[1])) > 0
        vals = (signs * (1 << np.arange(bits))).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    return bucket_udf


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets × several tables.

    At 100 TB the bucket equi-join shuffles each side once on (table,
    bucket); candidate volume ~N/2^bits per table instead of N. ``dim`` is
    optional (plans derive it from the data inside the UDF).
    """
    bucketers = [make_hyperplane_udf(bits, seed=100 + t, dim=dim) for t in range(tables)]

    def bucketize(df, prefix):
        parts = []
        for t, udf in enumerate(bucketers):
            parts.append(
                df.select(
                    F.col(id_col).alias(f"{prefix}_id"),
                    F.col(vec_col).alias(f"{prefix}_vec"),
                    F.lit(t).alias("table"),
                    udf(F.col(vec_col)).alias("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    v = bucketize(vectors, "n")
    q = bucketize(queries, "q")
    cands = (
        v.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    sim = F.round(_cosine(F.col("q_vec"), F.col("n_vec")), 4)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
