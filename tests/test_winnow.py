"""Winnowing fingerprints (operators/textstats.py): the
shared-run guarantee and the short-document branches."""

from scrapelect_spark.operators.textstats import (
    _WIN_K,
    _WIN_W,
    winnow_fingerprints,
)


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = (
        winnow_fingerprints(df)
        .orderBy("doc_id")
        .collect()
    )
    return out


def _fp_sets(spark, texts):
    """Recompute the fingerprint SETS locally (mirroring the operator)
    to check set-level properties the md5 summary hides."""
    import hashlib

    sets = []
    for t in texts:
        ws = t.split()
        hs = [
            hashlib.md5(
                " ".join(ws[i : i + _WIN_K]).encode()
            ).hexdigest()
            for i in range(len(ws) - _WIN_K + 1)
        ]
        if not hs:
            sets.append(set())
        elif len(hs) < _WIN_W:
            sets.append({min(hs)})
        else:
            sets.append(
                {min(hs[i : i + _WIN_W]) for i in range(len(hs) - _WIN_W + 1)}
            )
    return sets


def test_shared_run_guarantees_shared_fingerprint(spark):
    # any shared run of w+k-1 tokens must share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 tokens
    a = "one two " + shared + " three four five six"
    b = "nine eight seven " + shared + " zero"
    sa, sb = _fp_sets(spark, [a, b])
    assert sa & sb
    rows = _fps(spark, [a, b])
    assert rows[0].n_fingerprints == len(sa)
    assert rows[1].n_fingerprints == len(sb)


def test_short_doc_branches(spark):
    rows = _fps(
        spark,
        [
            "a b",            # fewer than k tokens: no grams
            "a b c d",        # k<=n<w+k-1: single min fingerprint
            "a b c d e f g h i j",  # full windowed path
        ],
    )
    assert rows[0].n_grams == 0 and rows[0].n_fingerprints == 0
    assert rows[1].n_grams == 2 and rows[1].n_fingerprints == 1
    assert rows[2].n_grams == 8 and rows[2].n_fingerprints >= 1


def test_identical_docs_identical_summary(spark):
    t = "q w e r t y u i o p a s d f"
    rows = _fps(spark, [t, t])
    assert rows[0].fp_md5 == rows[1].fp_md5
