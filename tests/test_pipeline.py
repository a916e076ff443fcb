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
