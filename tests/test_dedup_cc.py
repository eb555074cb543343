"""Scale-shape tests for the large-star/small-star connected-components
core: a chain-shaped component (diameter ≫ any fixed round bound) must
converge in O(log n) rounds — the case diameter-bounded min-label
propagation silently mis-clusters — and exhaustion must raise, never
return a wrong clustering."""

import math

import pytest

from scrapelect_spark.operators.dedup import ConvergenceError, connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_chain_200_converges_in_log_rounds(spark):
    """A 200-node chain has diameter 199: min-label propagation needs
    199 rounds (and a 32-round bound returns WRONG labels).  The
    star-contraction must finish within ~2·⌈log2 n⌉ + 2 rounds."""
    n = 200
    chain = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    bound = 2 * math.ceil(math.log2(n)) + 2  # 18 rounds
    labels = {
        r.doc_id: r.cluster
        for r in connected_components(
            chain, max_rounds=bound, local_threshold=0
        ).collect()
    }
    assert len(labels) == n
    assert set(labels.values()) == {0}


def test_convergence_error_raised_not_silent(spark):
    chain = _edges(spark, [(i, i + 1) for i in range(199)])
    with pytest.raises(ConvergenceError):
        connected_components(chain, max_rounds=1, local_threshold=0)


def test_local_solve_matches_distributed(spark):
    """The size-gated driver-local union-find must produce the exact
    clustering the distributed star contraction does."""
    pairs = (
        [(i, i + 1) for i in range(40)]
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(200, 201), (300, 300)]
    )
    e = _edges(spark, pairs)
    local = {
        (r.doc_id, r.cluster)
        for r in connected_components(e).collect()  # takes the local path
    }
    dist = {
        (r.doc_id, r.cluster)
        for r in connected_components(e, local_threshold=0).collect()
    }
    assert local == dist


def test_mixed_components(spark):
    pairs = (
        [(i, i + 1) for i in range(10)]  # chain 0..10 → cluster 0
        + [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]  # clique
        + [(31, 30), (30, 31), (40, 40)]  # dup/reversed pair + self-loop
    )
    labels = {
        r.doc_id: r.cluster
        for r in connected_components(
            _edges(spark, pairs), local_threshold=0
        ).collect()
    }
    for i in range(11):
        assert labels[i] == 0
    for i in range(20, 25):
        assert labels[i] == 20
    assert labels[30] == 30 and labels[31] == 30
    assert labels[40] == 40  # self-loop node survives as a singleton


def test_empty_graph(spark):
    empty = _edges(spark, []).limit(0)
    assert connected_components(empty).count() == 0


# --- MinHash band-join skew guard -----------------------------------


def _skewed_bands(spark):
    """500 docs; docs 0..49 all share ONE (band, band_val) bucket (the
    boilerplate-page scenario), plus two cold 3-doc buckets; the rest
    are singletons that pair with nothing."""
    rows = [(d, 0, "HOT") for d in range(50)]
    rows += [(d, 1, "c1") for d in (100, 101, 102)]
    rows += [(d, 2, "c2") for d in (200, 201, 202)]
    rows += [(d, 3, f"u{d}") for d in range(300, 500)]
    return spark.createDataFrame(rows, "doc_id long, band int, band_val string")


def test_band_pairs_hot_band_exact(spark):
    """The salted hot path must emit EXACTLY the naive all-pairs set —
    skew handling changes task placement, never the answer."""
    from scrapelect_spark.operators.dedup import band_pairs

    bands = _skewed_bands(spark)
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in band_pairs(bands, hot_threshold=10, salt_buckets=8).collect()
    )
    expect = sorted(
        [(a, b) for a in range(50) for b in range(a + 1, 50)]
        + [(100, 101), (100, 102), (101, 102)]
        + [(200, 201), (200, 202), (201, 202)]
    )
    assert got == expect


def test_band_pairs_hot_path_joins_on_salt(spark):
    """The hot bucket's self-join must include the salt in its join
    keys — that is what spreads an m²-pair bucket over many tasks."""
    from scrapelect_spark.operators.dedup import band_pairs

    df = band_pairs(_skewed_bands(spark), hot_threshold=10, salt_buckets=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert any("salt" in l for l in join_lines), plan


def test_band_pairs_all_cold_matches_naive(spark):
    """With no hot buckets the guard is pure equi-join passthrough."""
    from scrapelect_spark.operators.dedup import band_pairs

    bands = _skewed_bands(spark)
    # threshold above the hot bucket size -> everything cold
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in band_pairs(bands, hot_threshold=10_000).collect()
    )
    ref = sorted(
        (r.doc_a, r.doc_b)
        for r in band_pairs(bands, hot_threshold=10, salt_buckets=4).collect()
    )
    assert got == ref


def test_band_pairs_negative_ids_hot_path(spark):
    """pmod salting: negative doc_ids in a hot bucket must still emit
    every pair (sign-preserving % would drop them silently)."""
    from scrapelect_spark.operators.dedup import band_pairs

    rows = [(d, 0, "HOT") for d in range(-10, 10)]
    bands = spark.createDataFrame(rows, "doc_id long, band int, band_val string")
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in band_pairs(bands, hot_threshold=5, salt_buckets=8).collect()
    )
    ids = list(range(-10, 10))
    expect = sorted(
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
    )
    assert got == expect


def test_power_iteration_matches_numpy(spark):
    """The distributed power iteration must match the same fixed-round
    iteration computed densely in numpy (float tolerance — numpy sums
    are not DECIMAL-exact, the per-engine determinism is what the
    DuckDB gate hashes)."""
    import numpy as np

    from scrapelect_spark.operators.simsearch import (
        _POWER_ITERS,
        embedding_power_iteration,
    )

    sf = "/root/testdata/sf0.001"
    X = np.array(
        [r.embedding for r in
         spark.read.parquet(f"{sf}/embeddings.parquet")
         .orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    v = np.ones(X.shape[1])
    for _ in range(_POWER_ITERS):
        w = X.T @ (X @ v)
        v = w / np.abs(w).max()
    if v[0] < 0:
        v = -v
    got = np.array(
        [r.component for r in embedding_power_iteration(spark, sf).collect()]
    )
    assert np.allclose(got, v, atol=1e-5)
    # genuinely converging: the Rayleigh quotient after 10 rounds sits
    # ≥ 90% of λ_max (random data has a tiny eigengap, so direction
    # cosine converges slowly — the energy captured is the right
    # measure; measured 0.913 at 10 rounds vs 0.546 at the start)
    G = X.T @ X
    lam_max = np.linalg.eigvalsh(G)[-1]
    rayleigh = (v @ G @ v) / (v @ v)
    assert rayleigh / lam_max > 0.9
    v0 = np.ones(X.shape[1])
    assert rayleigh > (v0 @ G @ v0) / (v0 @ v0)


# ------------------------------------------------------------ decontaminate


def test_decontaminate_flags_shared_ngrams(spark):
    from scrapelect_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words here with no overlap at all"),
            (3, "again the quick brown fox appears in this sentence"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_shared for r in decontaminate(corpus, bench).collect()}
    # "the quick brown fox" is the only shared 4-gram
    assert got == {1: 1, 3: 1}


def test_decontaminate_no_overlap_empty(spark):
    from scrapelect_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "v w x y z")], "doc_id long, text string")
    assert decontaminate(corpus, bench).count() == 0


def test_decontaminate_short_docs_never_flagged(spark):
    """Documents shorter than n tokens produce no n-grams (and must not
    crash the sequence() expression with a descending range)."""
    from scrapelect_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(1, "too short"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "too short"), (8, "two three four five six")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared for r in decontaminate(corpus, bench).collect()}
    assert got == {2: 1}  # only "two three four five" is shared


def test_decontaminate_custom_n(spark):
    from scrapelect_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "beta gamma delta")], "doc_id long, text string")
    assert decontaminate(corpus, bench, n=2).count() == 1
    assert decontaminate(corpus, bench, n=3).count() == 0
