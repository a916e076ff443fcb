"""Distributed BPE tokenizer training — the standard two-phase recipe.

Byte-pair-encoding training at corpus scale does NOT iterate over the raw
text: every production trainer (the original Sennrich et al. 2016 script,
HuggingFace tokenizers) first aggregates a word→frequency dictionary and
runs the merge loop on the dictionary.  At 100 TB that split is exactly
Spark-shaped:

1. **word_counts** — regex pre-tokenize + explode + hash-aggregate.  This
   is the only pass over the corpus; it shuffles (word, partial_count)
   pairs with map-side combine, and its output is bounded by the DISTINCT
   vocabulary (millions of rows), not the corpus (billions).
2. **train_merges** — the merge loop on the collected dictionary, pure
   Python on the driver.  Driver memory is O(vocab), the same bounded-
   collect pattern as IVF centroid training (similarity.py) — the collect
   is ``limit(max_vocab_rows+1)``-bounded, never blind, and overflow
   raises instead of OOMing.

The reference engine has no tokenizer training; this extends the
LLM-data-pipeline family (brief: "token counting (whitespace + a BPE-ish
regex)") from counting to actual vocabulary learning.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: GPT-2-flavored pre-tokenizer, simplified to the corpus alphabet
WORD_RE = "[a-z]+"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the single distributed pass of BPE training.

    explode + groupBy compiles to a hash aggregate with map-side partial
    combine: the shuffle carries one row per distinct word per partition,
    so a 100 TB corpus with a 10M-word vocabulary shuffles megabytes."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def train_merges(
    freqs: dict[str, int], n_merges: int
) -> tuple[list[tuple[str, str, int]], int, int]:
    """The dictionary merge loop (Sennrich alg. 1): repeatedly merge the
    most frequent adjacent symbol pair (ties broken by smallest pair,
    lexicographically — deterministic across runs and partitionings).

    Returns (merges [(left, right, count)], tokens_before, tokens_after).
    """
    syms: dict[str, list[str]] = {w: list(w) for w in freqs}
    tokens_before = sum(len(w) * f for w, f in freqs.items())
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += f
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        a, b = min(p for p, c in pair_counts.items() if c == best_n)
        merges.append((a, b, best_n))
        ab = a + b
        for w, s in syms.items():
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    tokens_after = sum(len(s) * freqs[w] for w, s in syms.items())
    return merges, tokens_before, tokens_after


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    max_vocab_rows: int = 5_000_000,
) -> dict:
    """End-to-end BPE training: distributed dictionary + driver merge loop.

    Raises when the distinct vocabulary exceeds ``max_vocab_rows`` — at
    that point the corpus needs a frequency floor (``HAVING cnt >= k``)
    before training, which is also what production trainers do.  The guard
    and the collect are ONE job: ``limit(max+1).collect()`` bounds driver
    memory AND detects overflow without a second corpus aggregation (a
    separate probe + collect would run the explode/groupBy twice)."""
    wc = word_counts(df, text_col)
    rows = wc.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds {max_vocab_rows} words; apply a frequency "
            "floor (filter cnt >= k) before bpe_train"
        )
    freqs = {r["word"]: r["cnt"] for r in rows}
    merges, before, after = train_merges(freqs, n_merges)
    return {
        "merges": merges,
        "vocab_words": len(freqs),
        "total_words": sum(freqs.values()),
        "tokens_before": before,
        "tokens_after": after,
    }


def apply_merges(df: DataFrame, merges: list[tuple[str, str, int]],
                 text_col: str = "text") -> DataFrame:
    """Tokenize a corpus with a trained merge list — distributed, one
    mapInPandas pass with the merge table broadcast in the closure.
    Output: (tokens array<string>, n_tokens) per row."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    import re

    rx = re.compile(WORD_RE)

    def encode_word(w: str) -> list[str]:
        s = list(w)
        while len(s) > 1:
            best_i, best_r = -1, len(ranks)
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]), len(ranks))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(ranks):
                break
            s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
        return s

    schema = T.StructType(
        [
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in rx.findall(str(text).lower()):
                    out.extend(encode_word(w))
                toks.append(out)
            yield pd.DataFrame({"tokens": toks, "n_tokens": [len(t) for t in toks]})

    return df.select(text_col).mapInPandas(batches, schema)
