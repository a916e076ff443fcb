"""Distributed BPE training (operators/bpe.py)."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.operators import bpe


def test_train_merges_hand_computed():
    """The classic Sennrich corpus (sans end-marker), merges derived by
    hand: iter0 pair counts peak at 9 for both (e,s) and (s,t) — the
    lexicographic tie-break picks (e,s); then (es,t) at 9; then the 7-count
    tie between (l,o)/(o,w) picks (l,o)."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, before, after = bpe.train_merges(freqs, 3)
    assert merges == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7)]
    assert before == 5 * 3 + 2 * 5 + 6 * 6 + 3 * 6
    # each merge at count c removes c tokens
    assert after == before - 9 - 9 - 7


def test_train_merges_stops_when_dry():
    merges, before, after = bpe.train_merges({"ab": 4}, 10)
    assert merges == [("a", "b", 4)]
    assert (before, after) == (8, 4)


def test_bpe_train_and_apply_roundtrip(spark):
    rows = [("low low lower newest newest widest",), ("newest low widest newest",)]
    df = spark.createDataFrame(rows, ["text"])
    result = bpe.bpe_train(df, "text", n_merges=3)
    assert result["vocab_words"] == 4
    assert result["merges"][0][:2] == ("e", "s")
    # distributed re-tokenization with the trained merges agrees with the
    # trainer's own token accounting
    toks = bpe.apply_merges(df, result["merges"], "text").collect()
    assert sum(r.n_tokens for r in toks) == result["tokens_after"]
    flat = [t for r in toks for t in r.tokens]
    # freqs: low 3, lower 1, newest 4, widest 2 → merges (e,s,6), (es,t,6),
    # then the 4-count tie (e,w)/(l,o)/(n,e)/(o,w)/(w,est) resolves to (e,w)
    assert result["merges"][2][:2] == ("e", "w")
    assert "est" in flat and "ew" in flat  # learned symbols in use


def test_bpe_train_vocab_guard(spark):
    df = spark.createDataFrame([("a b c d e f g h",)], ["text"])
    with pytest.raises(ValueError, match="frequency"):
        bpe.bpe_train(df, "text", max_vocab_rows=3)
