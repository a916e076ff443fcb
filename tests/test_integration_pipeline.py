"""End-to-end training-data pipeline: every stage is an engine operator and
the stages COMPOSE — the artifact a user of this engine actually ships.

raw JSONL (with corrupt lines) → quarantine split → quality filter →
language ID → MinHash near-dup removal → deterministic train/val/test
split → sequence packing stats → Z-order clustered parquet write →
read-back validation.  Runs at sf0.001 corpus scale; every stage's row
accounting is asserted so a silently-lossy stage fails loudly.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from native_sql_engine_spark import sources as S
from native_sql_engine_spark.catalog import load_table
from native_sql_engine_spark.operators import dedup as D
from native_sql_engine_spark.operators import text as X
from native_sql_engine_spark.operators.layout import write_parquet_zordered


def test_training_corpus_pipeline_end_to_end(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    n_raw = docs.count()

    # 1. raw JSONL ingestion with quarantine (simulate a shard with breakage)
    shard = tmp_path / "shard.jsonl"
    lines = [
        r.text for r in docs.select(F.to_json(F.struct("doc_id", "text")).alias("text")).collect()
    ]
    lines.insert(3, "{truncated json")
    lines.insert(17, '{"doc_id": "bad-type", "text": 1}')
    shard.write_text("\n".join(lines) + "\n")
    raw = S.read_jsonl_corpus(spark, str(shard), "doc_id bigint, text string").cache()
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == n_raw
    assert bad.count() == 2

    # 2. quality filter + language ID (all per-row codegen — no shuffle yet)
    scored = X.quality_metrics(good, "text").filter(F.col("quality_score") >= 0.9)
    tagged = X.language_id(scored, "text")
    n_scored = tagged.count()
    assert 0 < n_scored <= n_raw

    # 3. near-dup removal: MinHash-LSH pairs → cluster → keep canonical docs
    pairs = D.minhash_lsh_pairs(tagged, "doc_id", "text", threshold=0.8)
    clusters = D.dedup_clusters(tagged, "doc_id", pairs)
    keep_ids = clusters.filter(F.col("is_canonical")).select("doc_id")
    deduped = tagged.join(keep_ids, "doc_id", "left_semi")
    n_dedup = deduped.count()
    n_dupes = n_scored - n_dedup
    assert 0 <= n_dupes < n_scored  # dupes removed, corpus not wiped

    # 4. deterministic split: md5-bucket, reproducible across runs/cluster sizes
    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(digit.between("0", "9") | digit.isin("a", "b"), "train")
        .when(digit.isin("c", "d"), "val")
        .otherwise("test")
    )
    splitdf = deduped.withColumn("split", split)
    counts = {r["split"]: r["n"] for r in splitdf.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n_dedup
    assert counts.get("train", 0) > counts.get("val", 0)

    # 5. sequence packing stats: every doc lands in exactly one bin
    packed = X.pack_sequences(
        splitdf, "doc_id", "split", X.token_count(F.col("text")), capacity=512
    )
    assert packed.count() == n_dedup

    # 6. Z-order clustered write on (doc_id, n_tokens) + read-back accounting
    out = str(tmp_path / "corpus")
    final = splitdf.select("doc_id", "split", "lang_guess", "n_tokens", "quality_score")
    write_parquet_zordered(final, out, ["doc_id", "n_tokens"], num_files=4)
    assert len(glob.glob(out + "/part-*.parquet")) == 4
    back = spark.read.parquet(out)
    assert back.count() == n_dedup
    assert set(back.columns) == set(final.columns)
    # determinism: the same pipeline re-run selects the same document set
    again = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == again
