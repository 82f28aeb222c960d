"""Deterministic CLUSTERED synthetic embeddings (Gaussian mixture on the
unit sphere) — the honest ANN benchmark surface.

Real embedding corpora cluster (topics, templates, languages); uniform
random vectors are the degenerate worst case where every partition-based
ANN index must probe nearly everything for high recall — grading an index
there demonstrates nothing (round-2 verdict). This generator fixes a
mixture of ``n_clusters`` unit-norm centers and draws each vector as
``normalize(center[i % n_clusters] + sigma * noise_i)``.

Every vector is a pure function of ``(seed, i)`` — numpy on the driver (for
the exact ground-truth oracle, computed INDEPENDENTLY of any Spark
operator) and ``mapInPandas`` over ``spark.range`` (distributed, zero
shuffle, no driver data) produce bit-identical float32 rows.
"""

from __future__ import annotations

import numpy as np

DEFAULT_N = 100_000
DEFAULT_DIM = 32
DEFAULT_CLUSTERS = 20
DEFAULT_SIGMA = 0.04
DEFAULT_SEED = 123
DEFAULT_QUERIES = 100


def _centers(n_clusters: int, dim: int, seed: int) -> np.ndarray:
    c = np.random.default_rng(seed).standard_normal((n_clusters, dim))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).astype(np.float64)


_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _counter_normals(ids: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """Stateless standard normals: splitmix64 of (seed, id, component) →
    two uniforms → Box-Muller. Fully vectorized — no per-row RNG objects —
    so a 20k-row Arrow batch generates in milliseconds, and any worker can
    produce any id slice independently (counter-based, like Philox)."""
    i = np.asarray(ids, dtype=np.int64).view(np.uint64)[:, None]
    j = np.arange(dim, dtype=np.uint64)[None, :]
    # python-int wraparound avoids numpy scalar-overflow warnings
    seed_term = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x = i * np.uint64(dim) + j + seed_term

    def mix(v):
        v = v.copy()
        v ^= v >> np.uint64(30)
        v *= _SM1
        v ^= v >> np.uint64(27)
        v *= _SM2
        v ^= v >> np.uint64(31)
        return v

    h1 = mix(x)
    h2 = mix(x ^ _GOLDEN)
    u1 = ((h1 >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def emb_rows(
    ids: np.ndarray,
    n_clusters: int = DEFAULT_CLUSTERS,
    dim: int = DEFAULT_DIM,
    sigma: float = DEFAULT_SIGMA,
    seed: int = DEFAULT_SEED,
) -> np.ndarray:
    """float32 (len(ids), dim) block; row for id i is reproducible anywhere."""
    cent = _centers(n_clusters, dim, seed)
    idx = np.asarray(ids, dtype=np.int64)
    v = cent[idx % n_clusters] + sigma * _counter_normals(idx, dim, seed)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def embeddings_np(
    n: int = DEFAULT_N, **kw
) -> np.ndarray:
    return emb_rows(np.arange(n), **kw)


def exact_topk_np(
    n: int = DEFAULT_N,
    query_ids: list[int] | None = None,
    k: int = 10,
    round_to: int = 4,
    **kw,
) -> list[tuple[int, int, float, int]]:
    """INDEPENDENT exact ground truth: (query_id, neighbor_id, sim, rank)
    rows by brute-force numpy cosine — never touches the Spark operators, so
    it can oracle them (same non-circularity contract as the crawl
    simulator). Ties broken by ascending neighbor_id on the ROUNDED sim,
    matching cosine_topk's window order."""
    query_ids = (
        query_ids if query_ids is not None else list(range(DEFAULT_QUERIES))
    )
    m = embeddings_np(n, **kw).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims_all = np.round(m[np.asarray(query_ids)] @ m.T, round_to)  # (Q, N)
    rows = []
    ids = np.arange(n)
    for row_i, q in enumerate(query_ids):
        mask = ids != q
        cand_ids = ids[mask]
        # stable sort on ascending id, then stable sort on -sim → exact
        # (-sim, id) order without a python-level comparator
        order = cand_ids[np.argsort(-sims_all[row_i][mask], kind="stable")][:k]
        rows.extend(
            (q, int(i), float(sims_all[row_i][i]), rank + 1)
            for rank, i in enumerate(order)
        )
    return rows


# --------------------------------------------------------------------------
# Near-dup corpus: planted duplicate FAMILIES for the embedding-cosine
# dedup gate (task directive "embedding-cosine near-dup"). The provided
# embeddings tables have no pairs above cos 0.61 at any sf — a dedup gate
# there would grade the empty set — so, like the q17/q32 ANN corpora, the
# gate self-synthesizes: NEARDUP_BASE near-orthogonal base vectors
# (ids 0..B-1), plus NEARDUP_DUPS planted duplicates of each of the first
# NEARDUP_FAMS bases (dup id d >= B belongs to family (d-B) % FAMS and is
# normalize(base + EPS*noise)). Every family pair sits at cos >= ~0.997;
# the closest cross-family pair is far below the 0.99 threshold, so the
# exact component structure — and the survivor set {0..B-1} — is known by
# construction AND recomputed independently in numpy (neardup_survivors_np).
# --------------------------------------------------------------------------

NEARDUP_BASE = 20_000
NEARDUP_FAMS = 1_000
NEARDUP_DUPS = 3  # per family
NEARDUP_EPS = 0.05
NEARDUP_SEED = 777
NEARDUP_TOTAL = NEARDUP_BASE + NEARDUP_FAMS * NEARDUP_DUPS


def neardup_rows(ids: np.ndarray, dim: int = DEFAULT_DIM,
                 seed: int = NEARDUP_SEED) -> np.ndarray:
    """float32 block for the near-dup corpus; pure function of (seed, id)
    — numpy and mapInPandas produce bit-identical rows (same contract as
    emb_rows)."""
    ids = np.asarray(ids, dtype=np.int64)
    base_ids = np.where(ids < NEARDUP_BASE, ids, (ids - NEARDUP_BASE) % NEARDUP_FAMS)
    base = _counter_normals(base_ids, dim, seed)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    out = base
    dup = ids >= NEARDUP_BASE
    if dup.any():
        pert = _counter_normals(ids[dup], dim, seed + 1)
        pert /= np.linalg.norm(pert, axis=1, keepdims=True)
        v = base[dup] + NEARDUP_EPS * pert
        out[dup] = v / np.linalg.norm(v, axis=1, keepdims=True)
    return out.astype(np.float32)


def neardup_embeddings_np(n: int = NEARDUP_TOTAL, **kw) -> np.ndarray:
    return neardup_rows(np.arange(n), **kw)


def neardup_survivors_np(threshold: float = 0.99, n: int = NEARDUP_TOTAL,
                         block: int = 4096, **kw) -> list[int]:
    """INDEPENDENT ground truth for the dedup gate: exact all-pairs cosine
    (blocked numpy matmul), union-find over >=-threshold edges, min-id
    survivor per component — never touches the Spark operators."""
    m = neardup_embeddings_np(n, **kw).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for lo in range(0, n, block):
        s = m[lo : lo + block] @ m.T  # (block, n)
        ii, jj = np.nonzero(s >= threshold)
        for bi, j in zip(ii, jj):
            i = lo + int(bi)
            j = int(j)
            if i >= j:
                continue
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    roots = {find(i) for i in range(n)}
    return sorted(roots)


def synthesize_neardup_embeddings(spark, n: int = NEARDUP_TOTAL,
                                  partitions: int | None = None, **kw):
    """Distributed near-dup corpus: spark.range → mapInPandas, schema
    (vec_id long, embedding array<float>) — zero driver data."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = neardup_rows(ids, **kw)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(_gen, schema=schema)


def synthesize_embeddings(spark, n: int = DEFAULT_N, partitions: int | None = None, **kw):
    """Distributed generation: spark.range → mapInPandas, schema
    (vec_id long, embedding array<float>)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = emb_rows(ids, **kw)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(_gen, schema=schema)
