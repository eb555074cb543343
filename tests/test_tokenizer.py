"""Driver-side BPE merge learning (the Spark path is gated by
``corpus_bpe_tokenize`` in tests/test_oracle_parity.py)."""

from scrapelect_spark.operators.tokenizer import (
    _merge_word,
    learn_bpe_merges,
)


def test_hand_derived_merge_sequence():
    merges, tok = learn_bpe_merges(
        [("aaab", 900), ("abab", 600), ("bbb", 450)], 5
    )
    assert merges == [
        ("a", "b"),
        ("a", "a"),
        ("aa", "ab"),
        ("b", "b"),
        ("ab", "ab"),
    ]
    assert tok == {
        "aaab": ("aaab",),
        "abab": ("abab",),
        "bbb": ("bb", "b"),
    }


def test_tie_breaks_lexicographic():
    # "xy" and "yx" pairs tie at freq 1 each; ("x","y") < ("y","x")
    merges, _ = learn_bpe_merges([("xy", 1), ("yx", 1)], 1)
    assert merges == [("x", "y")]


def test_tokens_reconcatenate_to_word():
    merges, tok = learn_bpe_merges(
        [("banana", 10), ("bandana", 5), ("nab", 7)], 4
    )
    assert len(merges) == 4
    for word, syms in tok.items():
        assert "".join(syms) == word


def test_stops_when_no_pairs_remain():
    merges, tok = learn_bpe_merges([("ab", 3)], 10)
    assert merges == [("a", "b")]
    assert tok == {"ab": ("ab",)}


def test_merge_word_non_overlapping_left_to_right():
    # aaa with merge (a,a): left-to-right non-overlap -> (aa, a)
    assert _merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
