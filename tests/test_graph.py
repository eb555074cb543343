"""PageRank over the deterministic document link graph
(operators/graph.py): mathematical invariants + determinism.

Oracle parity (hash-exact vs the DuckDB MATERIALIZED-CTE twin) runs in
tests/test_oracle_parity.py like every other gate; here we check the
properties the oracle can't see."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ranks(spark):
    from scrapelect_spark.operators.graph import graph_pagerank

    return {
        int(r.node): float(r.rank)
        for r in graph_pagerank(spark, SF).collect()
    }


def test_edges_deterministic_and_in_range(spark):
    from scrapelect_spark.operators.graph import _link_edges
    from scrapelect_spark.operators.tables import load

    d = load(spark, SF, "documents")
    n = int(d.agg(F.max("doc_id")).first()[0]) + 1
    rows = _link_edges(d, n).collect()
    # out-degree of src i is 2 + i%4; every dst in [0, n)
    from collections import Counter

    deg = Counter(int(r.src) for r in rows)
    for i in range(n):
        assert deg[i] == 2 + i % 4
    assert all(0 <= int(r.dst) < n for r in rows)
    # exact formula: the dst multiset of src i is {(i*31+j*97+7)%n}
    by_src: dict[int, list[int]] = {}
    for r in rows:
        by_src.setdefault(int(r.src), []).append(int(r.dst))
    for i in range(n):
        want = sorted((i * 31 + j * 97 + 7) % n for j in range(2 + i % 4))
        assert sorted(by_src[i]) == want, i
    # second run identical
    rows2 = _link_edges(d, n).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pagerank_is_a_distribution(ranks):
    # damped PageRank with no dangling nodes conserves mass
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=0, abs_tol=1e-6)
    assert all(v > 0 for v in ranks.values())


def test_pagerank_floor_is_base_rank(ranks):
    # nodes with no in-links sit exactly at 0.15/N (mod rounding)
    n = len(ranks)
    base = round(0.15 / n, 12)
    assert min(ranks.values()) >= base - 1e-12


def test_pagerank_matches_local_reference(spark, ranks):
    """Independent plain-Python fixed-point check: same graph, same
    8 damped rounds in float arithmetic — agree to float tolerance
    (the gate's DECIMAL quantization differs at ~1e-12)."""
    n = len(ranks)
    edges = []
    for i in range(n):
        d = 2 + i % 4
        for j in range(d):
            edges.append((i, (i * 31 + j * 97 + 7) % n, d))
    r = [1.0 / n] * n
    for _ in range(8):
        s = [0.0] * n
        for src, dst, deg in edges:
            s[dst] += r[src] / deg
        r = [0.15 / n + 0.85 * x for x in s]
    for i in range(n):
        assert math.isclose(ranks[i], r[i], rel_tol=0, abs_tol=1e-9), (
            i,
            ranks[i],
            r[i],
        )
