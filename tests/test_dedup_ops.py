"""Near-dup operator tests: MinHash+LSH recall, SimHash locality, n-gram
Jaccard exactness, ANN brute-force vs LSH recall."""

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the committee "
        "debates the annual budget report in the press room today"
    )
    near = base.replace("annual", "yearly").replace("today", "tonight")
    far = "completely different content about spark query engines and shuffles"
    rows = [
        (1, base),
        (2, near),          # near-dup of 1
        (3, base),          # exact dup of 1
        (4, far),
        (5, far + " with an extra tail sentence appended here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_near_dups(spark):
    from politics_crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_docs(spark), num_perm=64, shingle_k=5)
    pairs = lsh_candidate_pairs(sigs, est_threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard_est for r in pairs.collect()}
    assert (1, 3) in got and got[(1, 3)] == 1.0  # exact dup → all minhashes equal
    assert (1, 2) in got and got[(1, 2)] >= 0.5  # near dup above threshold
    assert (1, 4) not in got and (2, 4) not in got


def test_minhash_dedup_collapses(spark):
    from politics_crawler_spark.operators.dedup import minhash_dedup

    out = minhash_dedup(_docs(spark), threshold=0.9)
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids and 3 not in ids  # exact dup collapsed to min id
    assert 4 in ids


def test_connected_min_reps_chain(spark):
    """Component labeling must be TRANSITIVE: in pairs (10,50),(30,50) the
    min-id single-hop rule would keep 30 (it never appears as id_b), but all
    three are one component — only 10 survives."""
    from politics_crawler_spark.operators.dedup import connected_min_reps

    pairs = spark.createDataFrame(
        [(10, 50), (30, 50), (70, 80), (80, 90)], "id_a long, id_b long"
    )
    reps = {r.node: r.rep for r in connected_min_reps(pairs).collect()}
    assert reps == {10: 10, 50: 10, 30: 10, 70: 70, 80: 70, 90: 70}


def test_minhash_dedup_transitive_chain(spark):
    """A~B~C with A≁C (overlapping word windows): the connected-component
    collapse keeps only A; the old single-hop rule would have kept C too
    whenever C only paired 'upward'."""
    from politics_crawler_spark.operators.dedup import minhash_dedup

    words = [f"tok{i:03d}" for i in range(60)]
    a = " ".join(words[0:40])
    b = " ".join(words[10:50])   # J(a,b) ≈ 0.6 by word overlap
    c = " ".join(words[20:60])   # J(b,c) ≈ 0.6, J(a,c) ≈ 0.33 < 0.5
    far = "entirely unrelated content words xylophone quartz bumblebee"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, far)], "doc_id long, text string"
    )
    out = {r.doc_id for r in minhash_dedup(df, threshold=0.5).collect()}
    assert out == {1, 9}, f"expected component collapse to min id, got {out}"


def test_simhash_locality(spark):
    from politics_crawler_spark.operators.dedup import make_simhash_udf

    udf = make_simhash_udf()
    sigs = {r.doc_id: r.s for r in _docs(spark).select("doc_id", udf("text").alias("s")).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert sigs[1] == sigs[3]
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[4])


def test_ngram_jaccard_exact_values(spark):
    from politics_crawler_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c x y")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # grams(1) = {abc,bcd,cde}, grams(3) = {abc,bcx,cxy}: 1 of 5
    assert abs(pairs[(1, 3)] - 0.2) < 1e-9


def test_lsh_ann_recall_vs_bruteforce(spark):
    from politics_crawler_spark.operators.similarity import cosine_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    dim = len(emb.select("embedding").first()[0])
    exact = cosine_topk(emb, queries, k=5)
    # random embeddings are the worst case for LSH (no cluster structure);
    # low bits + many tables trades candidate volume for recall
    approx = lsh_topk(emb, queries, dim=dim, k=5, bits=3, tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
