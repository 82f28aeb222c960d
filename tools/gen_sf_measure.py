"""Generate a LOCAL MEASUREMENT-ONLY dataset at a larger scale factor by
extrapolating the driver's deterministic sf0.1 tables (TESTDATA.md). The
driver's own sf1.0 directory is driver-generated and not present in this
sandbox; optimization work needs walls measured at the scale the driver
benches at (BENCH_r05.json: sf=1.0), so this tool rebuilds a statistically
matching dataset from the sf0.1 distributions:

- documents: same generative process inferred from sf0.1 (30-word uniform
  vocab, doc length uniform 10..100 words, source = src{doc_id % 20},
  lang ~ {en .41, zh .15, es .15, fr .15, de .14}, 5%% near-dups = copy of
  a random doc with one token replaced by "dup", 0.16%% exact-copy rows).
- star tables / events: replicate x(sf/0.1) with per-replica key shifts so
  join fan-outs and group cardinalities scale the way a generator would
  scale them (keys disjoint across replicas; dates/measures untouched).
- embeddings: 10-cluster Gaussian mixture of unit vectors, dim 64.

Output goes under /tmp/sfdata/sf<sf>/ (never /root/testdata, which is
read-only driver data). Correctness is still graded only against the
driver's own sf0.001/0.01/0.1 via tools/check_oracle.py — this data is for
wall-clock measurement, and validated by comparing walls of UNTOUCHED
queries against BENCH_r05.json's sf1.0 numbers.

Usage: python tools/gen_sf_measure.py [sf=1.0] [outroot=/tmp/sfdata]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rng: np.random.Generator, n: int):
    n_near = int(round(n * 0.05))
    n_exact = int(round(n * 0.0016))
    n_base = n - n_near - n_exact
    texts: list[str] = []
    for _ in range(n_base):
        k = int(rng.integers(10, 101))
        texts.append(" ".join(rng.choice(VOCAB, size=k)))
    # near-dups: one token of a random base doc replaced by "dup"
    for _ in range(n_near):
        t = texts[int(rng.integers(0, n_base))].split(" ")
        t[int(rng.integers(0, len(t)))] = "dup"
        texts.append(" ".join(t))
    # exact copies
    for _ in range(n_exact):
        texts.append(texts[int(rng.integers(0, n_base))])
    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]
    doc_id = np.arange(n, dtype=np.int64)
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in range(n)])
    n_chars = np.array([len(t) for t in texts], dtype=np.int32)
    return pa.table({
        "doc_id": doc_id, "text": texts, "lang": lang,
        "source": source, "n_chars": n_chars,
    })


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64, k: int = 10):
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, k, size=n)
    v = centers[label] + 0.35 * rng.normal(size=(n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(v.astype(np.float64))),
        "label": label.astype(np.int64),
    })


def replicate(t: pa.Table, reps: int, shifts: dict[str, int],
              rename: dict[str, str] | None = None) -> pa.Table:
    """Concat `reps` copies, shifting integer key columns per replica so key
    spaces are disjoint; optionally rewrite name columns from the shifted key
    so name-keyed grouping stays 1:1 with the key."""
    parts = []
    for r in range(reps):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in shifts and r > 0:
                col = pa.compute.add(col, shifts[name] * r)
            cols[name] = col
        if rename and r > 0:
            for key_col, fmt in rename.items():
                keys = cols[key_col].to_numpy()
                cols[fmt.split(":")[0]] = pa.array(
                    [fmt.split(":")[1] % k for k in keys])
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outroot = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdata"
    reps = int(round(sf / 0.1))
    out = os.path.join(outroot, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(420)

    def w(name, table):
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(name, table.num_rows)

    w("documents", gen_documents(rng, int(50000 * sf / 1.0)))
    w("embeddings", gen_embeddings(rng, int(20000 * sf / 1.0)))

    for name, shifts, rename in [
        ("lineitem", {"l_orderkey": 150000, "l_partkey": 20000,
                      "l_suppkey": 1000}, None),
        ("orders", {"o_orderkey": 150000, "o_custkey": 15000}, None),
        ("events", {"event_id": 100000, "user_id": 1500}, None),
        ("customer", {"c_custkey": 15000},
         {"c_custkey": "c_name:Customer#%09d"}),
        ("part", {"p_partkey": 20000}, None),
        ("supplier", {"s_suppkey": 1000},
         {"s_suppkey": "s_name:Supplier#%09d"}),
    ]:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        w(name, replicate(t, reps, shifts, rename))

    for name in ["nation", "region"]:
        w(name, pq.read_table(os.path.join(SRC, f"{name}.parquet")))

    open(os.path.join(out, "_DONE"), "w").close()
    print("wrote", out)


if __name__ == "__main__":
    main()
