"""Deduplication operators: exact, fingerprint, n-gram Jaccard, MinHash-LSH,
SimHash, embedding-cosine — the LLM-pipeline surface beyond the reference.

Scale design (100 TB):
- exact/fingerprint dedup shuffle on a 128-bit digest, never on the document
  body (tiny shuffle keys, body stays columnar until the final join).
- pairwise operators NEVER do an unblocked cross join: n-gram Jaccard blocks
  on a length bucket; MinHash blocks on LSH band buckets; SimHash blocks on
  16-bit signature bands (pigeonhole: hamming ≤3 ⇒ ≥1 identical band).
- every primitive is a built-in column expression (xxhash64, pmod,
  array_*, bit ops) — zero Python in the distributed path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, shingles, tokens

# Mersenne prime + deterministic affine constants for MinHash permutations.
_MERSENNE = (1 << 61) - 1


def _perm_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — splitmix64-style mixing of the index so
    runs are reproducible with no RNG state."""
    out = []
    for i in range(num_hashes):
        z = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        a = z % (_MERSENNE - 1) + 1
        b = (z >> 13) % _MERSENNE
        out.append((a, b))
    return out


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per distinct value of ``cols``.

    GroupBy on the digest of the key columns → map-side combine, one shuffle
    of (digest, id) pairs; the winning rows are fetched back with a
    broadcast-able semi join at typical dup rates.
    """
    key = F.md5(F.concat_ws("\x00", *cols))
    winners = (
        df.select(key.alias("_k"), F.col(id_col))
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col))
        .drop("_k")
    )
    return df.join(winners, id_col, "left_semi")


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two arrays (exact, JVM-side)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    ngram: int = 3,
    length_block: int = 64,
) -> DataFrame:
    """Exact near-dup pairs by word-``ngram`` shingle Jaccard ≥ threshold.

    Blocking: only pairs whose lengths fall in the same or adjacent
    ``length_block``-char bucket are compared (each doc is exploded into its
    own bucket and its successor, then equi-joined on bucket — turning the
    O(n²) cross join into a shuffle join; near-dups at threshold ≥0.5 cannot
    differ by more than a bucket at sane block sizes).
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(tokens(F.col(text_col)), ngram).alias("_sh"),
        (F.length(text_col) / length_block).cast("long").alias("_bkt"),
    ).filter(F.size("_sh") > 0)
    # explode each doc into (own bucket, next bucket) so adjacent buckets meet
    blocked = base.select(
        "_id", "_sh", "_bkt", F.explode(F.array(F.col("_bkt"), F.col("_bkt") + 1)).alias("_blk")
    )
    left = blocked.select(
        F.col("_id").alias("a_id"), F.col("_sh").alias("a_sh"),
        F.col("_bkt").alias("a_bkt"), F.col("_blk").alias("_blk"),
    )
    right = blocked.select(
        F.col("_id").alias("b_id"), F.col("_sh").alias("b_sh"),
        F.col("_bkt").alias("b_bkt"), F.col("_blk").alias("_blk"),
    )
    pairs = (
        left.join(right, "_blk")
        .filter(F.col("a_id") < F.col("b_id"))
        # dedupe the two bucket copies: a (k,k) pair meets at blocks k and
        # k+1, a (k,k+1) pair only at k+1 — keeping _blk == max(buckets)
        # keeps exactly one copy of each
        .filter(F.col("_blk") == F.greatest(F.col("a_bkt"), F.col("b_bkt")))
        .filter(F.abs(F.col("a_bkt") - F.col("b_bkt")) <= 1)
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("a_id", "b_id")
    )


def minhash_signature(
    tokens_or_shingles: Column, num_hashes: int = 64
) -> Column:
    """MinHash signature (array<long>) of a token/shingle array.

    h_i(x) = (a_i * xxhash64(x) + b_i) mod M  over a Mersenne prime, min per
    row — all built-ins, fully codegen'd, deterministic across runs."""
    def perm_hash(a: int, b: int):
        # closure factory: transform() inspects lambda arity, so the lambda
        # must take exactly one parameter
        return lambda s: F.pmod(
            F.pmod(F.xxhash64(s), F.lit(_MERSENNE)) * F.lit(a) + F.lit(b), F.lit(_MERSENNE)
        )

    sigs = []
    for a, b in _perm_constants(num_hashes):
        sigs.append(F.array_min(F.transform(tokens_or_shingles, perm_hash(a, b))))
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + banded LSH, verified exactly.

    Pipeline: shingle → signature → split into ``bands`` bands of
    ``num_hashes/bands`` rows → hash each band → candidates share ≥1 band
    bucket (equi-join on (band_idx, band_hash) — a plain shuffle join, no
    cross product) → exact shingle-Jaccard verification ≥ threshold.
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(tokens(F.col(text_col)), ngram).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    sig = base.select("_id", "_sh", minhash_signature(F.col("_sh"), num_hashes).alias("_sig"))
    band_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.element_at("_sig", i * rows + j + 1) for j in range(rows)])).alias("bh"),
            )
            for i in range(bands)
        ]
    )
    buckets = sig.select("_id", "_sh", F.explode(band_cols).alias("_b")).select(
        "_id", "_sh", F.col("_b.band").alias("_band"), F.col("_b.bh").alias("_bh")
    )
    left = buckets.select(
        F.col("_id").alias("a_id"), F.col("_sh").alias("a_sh"), "_band", "_bh"
    )
    right = buckets.select(
        F.col("_id").alias("b_id"), F.col("_sh").alias("b_sh"), "_band", "_bh"
    )
    cand = (
        left.join(right, ["_band", "_bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.select(
            "a_id", "b_id", F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 4).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("a_id", "b_id")
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array as a signed long.

    For each bit b: sum over tokens of ±1 by the token hash's bit b; bit set
    iff the sum is positive.  Expressed as 64 aggregate folds over the token
    array — heavy but branch-free and fully JVM-side; for very wide docs a
    Pandas-UDF variant would batch better, at the cost of leaving codegen.
    """
    hashed = F.transform(tokens_col, lambda t: F.xxhash64(t))

    def vote(b: int):
        # closure factory: aggregate() merge lambda must take exactly two params
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(64):
        votes = F.aggregate(hashed, F.lit(0).cast("long"), vote(b))
        out = out.bitwiseOR(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 7
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Candidate blocking by the 8 8-bit bands of the signature: hamming ≤ 7
    ⇒ at least one band identical (pigeonhole), so candidates come from 8
    equi-joins, not a cross join.  Verification via bit_count(xor).
    Short documents have thin bit-vote margins, so the hamming budget is
    wider than the classic 3.
    """
    base = df.select(
        F.col(id_col).alias("_id"), simhash64(tokens(F.col(text_col))).alias("_sim")
    )
    bands = base.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("_sim", 8 * i)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("bh"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sim", F.col("_b.band").alias("_band"), F.col("_b.bh").alias("_bh"))
    left = bands.select(F.col("_id").alias("a_id"), F.col("_sim").alias("a_sim"), "_band", "_bh")
    right = bands.select(F.col("_id").alias("b_id"), F.col("_sim").alias("b_sim"), "_band", "_bh")
    return (
        left.join(right, ["_band", "_bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("a_id", "b_id")
    )


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (exact, norm-blocked).

    Scale path: pairs are blocked by sign-LSH bucket (similarity.py) before
    the exact cosine; here the exact all-pairs form is kept for oracle
    verification at test scale.
    """
    from .similarity import cosine

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    left = base.select(F.col("_id").alias("a_id"), F.col("_v").alias("a_v"))
    right = base.select(F.col("_id").alias("b_id"), F.col("_v").alias("b_v"))
    return (
        left.crossJoin(right)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(cosine(F.col("a_v"), F.col("b_v")), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("a_id", "b_id")
    )
