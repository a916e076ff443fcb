"""Pipeline operator battery: oracle checks + approximate-op ground truth."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.compare import assert_matches_oracle
from native_sql_engine_spark.queries import pipeline


@pytest.mark.parametrize("name", sorted(pipeline.ORACLE))
def test_pipeline_matches_duckdb(spark, sf_small, name):
    df = pipeline.QUERIES[name](spark, sf_small)
    assert_matches_oracle(df, pipeline.ORACLE[name], sf_small, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(pipeline.ORACLE))
def test_pipeline_matches_duckdb_sf001(spark, sf_oracle, name):
    df = pipeline.QUERIES[name](spark, sf_oracle)
    assert_matches_oracle(df, pipeline.ORACLE[name], sf_oracle, name)


def test_simhash_finds_neardups(spark, sf_small):
    """SimHash (hamming ≤ 3) must recover the high-jaccard near-dup pairs."""
    exact = {
        (r.a_id, r.b_id)
        for r in pipeline.QUERIES["dedup_ngram_jaccard"](spark, sf_small).collect()
        if r.jaccard >= 0.95
    }
    sim = {
        (r.a_id, r.b_id)
        for r in pipeline.QUERIES["dedup_simhash"](spark, sf_small).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    missed = exact - sim
    assert len(missed) <= max(1, len(exact) // 10), f"simhash missed {missed}"


def test_lsh_ann_recall(spark, sf_small):
    """LSH ANN top-10 must overlap heavily with brute-force top-10."""
    exact = [r.vec_id for r in pipeline.QUERIES["sim_cosine_topk"](spark, sf_small).collect()]
    approx = [
        r.vec_id for r in pipeline.QUERIES["sim_cosine_topk_lsh"](spark, sf_small).collect()
    ]
    assert exact[0] == 0  # query vector itself
    overlap = len(set(exact) & set(approx))
    assert overlap >= 4, f"LSH recall too low: {overlap}/10"


def test_ivf_ann_recall(spark, sf_small):
    """IVF ANN top-10 must overlap heavily with brute-force top-10 (nprobe=6
    of 16 lists scans ~3/8 of the corpus; neighbors of the query cluster
    into the probed lists, so recall should be near-perfect)."""
    exact = [r.vec_id for r in pipeline.QUERIES["sim_cosine_topk"](spark, sf_small).collect()]
    approx = [
        r.vec_id for r in pipeline.QUERIES["sim_cosine_topk_ivf"](spark, sf_small).collect()
    ]
    assert approx[0] == 0  # query vector itself lives in the nearest list
    overlap = len(set(exact) & set(approx))
    assert overlap >= 6, f"IVF recall too low: {overlap}/10"


def test_knn_join_lsh_recall(spark, sf_small):
    """LSH k-NN join must recover most of the exact join's (left, right)
    edges — and every one of its cosines is exact."""
    exact = {
        (r.left_id, r.right_id)
        for r in pipeline.QUERIES["sim_knn_join"](spark, sf_small).collect()
    }
    approx = {
        (r.left_id, r.right_id)
        for r in pipeline.QUERIES["sim_knn_join_lsh"](spark, sf_small).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"kNN-join LSH recall too low: {recall:.2f}"


def test_knn_join_exact_enforces_right_bound(spark, sf_small):
    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_small, "embeddings")
    left = emb.limit(2).select(F.col("vec_id").alias("left_id"), "embedding")
    right = emb.select(F.col("vec_id").alias("right_id"), "embedding")
    with pytest.raises(ValueError, match="knn_join_lsh"):
        S.knn_join_exact(left, right, 3, "left_id", "right_id", max_right_rows=5)


def test_embedding_lsh_recall_and_precision(spark, sf_small):
    """The distributed LSH path must recover nearly all exact pairs at the
    operator's design threshold band, and every pair it emits must be a
    true pair (cosines are exactly verified inside the bucket kernel)."""
    exact = {
        (r.a_id, r.b_id): r.cos
        for r in pipeline.QUERIES["dedup_embedding"](spark, sf_small).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.cos
        for r in pipeline.QUERIES["dedup_embedding_lsh"](spark, sf_small).collect()
    }
    assert exact, "fixture should contain embedding near-dup pairs"
    # precision = 1.0: every emitted pair is in the exact set, same cosine
    for pair, cos in approx.items():
        assert pair in exact and abs(cos - exact[pair]) < 1e-9, pair
    # high-threshold pairs (the dedup design point) must essentially all be found
    strong = {p for p, c in exact.items() if c >= 0.8}
    if strong:
        found = len(strong & set(approx))
        assert found / len(strong) >= 0.9, f"LSH missed strong pairs: {found}/{len(strong)}"


def test_embedding_dispatch_uses_lsh_above_bound(spark, sf_small):
    """Above the broadcast guard the operator must route to the LSH path
    (no corpus collect) — proven by forcing a tiny bound."""
    from native_sql_engine_spark.catalog import load_table
    from native_sql_engine_spark.operators import dedup as D

    emb = load_table(spark, sf_small, "embeddings")
    out = D.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.45, max_broadcast_rows=1
    )
    # LSH plan contains FlatMapGroupsInPandas (bucket kernel); broadcast path doesn't
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" in plan
    rows = out.collect()
    assert rows  # finds pairs without any driver-side corpus materialization


def test_multimodal_features_deterministic(spark, sf_small):
    a = pipeline.QUERIES["multimodal_features"](spark, sf_small).collect()
    b = pipeline.QUERIES["multimodal_features"](spark, sf_small).collect()
    assert a == b
    assert all(abs(r.fsum - 1.0) < 1e-6 for r in a)  # histogram sums to 1


def test_multimodal_stubs_are_marked(spark, sf_small):
    from native_sql_engine_spark.operators import multimodal as M
    from native_sql_engine_spark.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    for stub in (M.decode_image, lambda d: M.resize_image(d, 2, 2), M.sample_frames):
        with pytest.raises(NotImplementedError):
            stub(docs)


@pytest.mark.parametrize("small_graph_cutoff", [5_000_000, 0])
def test_connected_components_chain(spark, small_graph_cutoff, monkeypatch):
    """Worst-case diameter: a 12-node chain must collapse to one component
    (exercises multi-round label propagation), plus an isolated pair.
    Parametrized over both execution paths: driver union-find (default at
    this size) and the distributed path-halving rounds (cutoff forced to 0)."""
    from native_sql_engine_spark.operators import dedup

    monkeypatch.setattr(dedup, "SMALL_GRAPH_EDGES", small_graph_cutoff)
    chain = [(i, i + 1) for i in range(100, 111)] + [(500, 501)]
    pairs = spark.createDataFrame(chain, ["a_id", "b_id"])
    got = {
        (r.node, r.component) for r in dedup.connected_components(pairs).collect()
    }
    want = {(n, 100) for n in range(100, 112)} | {(500, 500), (501, 500)}
    assert got == want


def test_dedup_clusters_canonicals_cover_corpus(spark, sf_small):
    """Every cluster has exactly one canonical doc, and cluster_id is the
    min doc_id of the cluster."""
    rows = pipeline.QUERIES["dedup_clusters"](spark, sf_small).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        assert sum(m.is_canonical for m in members) == 1
    assert any(len(m) > 1 for m in by_cluster.values()), "expected real clusters"


def test_pack_sequences_bin_assignment(spark):
    """Concat-then-chunk semantics: a doc's bin is where its FIRST token
    lands; docs may straddle bins (fixed 10-token windows here)."""
    from pyspark.sql import functions as F
    from native_sql_engine_spark.operators.text import pack_sequences

    rows = [("s", 1, 4), ("s", 2, 4), ("s", 3, 4), ("s", 4, 9), ("t", 5, 25)]
    df = spark.createDataFrame(rows, ["src", "doc_id", "n"])
    out = pack_sequences(df, "doc_id", "src", F.col("n"), capacity=10)
    got = {(r.doc_id, r.bin) for r in out.collect()}
    # cum-before: d1=0→bin0, d2=4→bin0, d3=8→bin0 (straddles), d4=12→bin1
    assert got == {(1, 0), (2, 0), (3, 0), (4, 1), (5, 0)}


def test_quantize_int8_known_values(spark):
    """Min maps to 0, max to 255, midpoint to floor(0.5*255)=127; constant
    dimensions quantize to 0."""
    from native_sql_engine_spark.operators.similarity import quantize_int8

    rows = [(1, [0.0, 5.0]), (2, [10.0, 5.0]), (3, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {r.vec_id: (r.code_sum, r.code_min, r.code_max, r.dims)
           for r in quantize_int8(df, "vec_id", "embedding").collect()}
    # dim0 spans [0,10] → codes 0, 255, 127; dim1 constant → always 0
    assert got == {1: (0, 0, 0, 2), 2: (255, 0, 255, 2), 3: (127, 0, 127, 2)}
