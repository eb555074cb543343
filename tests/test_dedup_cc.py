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
        for r in connected_components(chain, max_rounds=bound).collect()
    }
    assert len(labels) == n
    assert set(labels.values()) == {0}


def test_convergence_error_raised_not_silent(spark):
    chain = _edges(spark, [(i, i + 1) for i in range(199)])
    with pytest.raises(ConvergenceError):
        connected_components(chain, max_rounds=1)


def test_mixed_components(spark):
    pairs = (
        [(i, i + 1) for i in range(10)]  # chain 0..10 → cluster 0
        + [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]  # clique
        + [(31, 30), (30, 31), (40, 40)]  # dup/reversed pair + self-loop
    )
    labels = {
        r.doc_id: r.cluster
        for r in connected_components(_edges(spark, pairs)).collect()
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
