"""materialize() — the cluster-safe plan-truncation helper.

Pins the three mode paths (local / reliable / persist) on live DataFrames:
identical results, the promised plan shape (truncated leaf vs lineage kept),
and the release contract.  The cluster-mode paths (reliable/persist) cannot
be exercised on a cluster here, so these tests force the mode via the
session conf — the exact switch a cluster submit would flip.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from native_sql_engine_spark.materialize import (
    CKPT_DIR_CONF,
    MODE_CONF,
    materialize,
    release,
    release_materialized,
)


def _small_df(spark):
    return (
        spark.range(100)
        .select(F.col("id"), (F.col("id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
    )


def _logical_plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


@pytest.fixture()
def clean_mode(spark):
    yield
    spark.conf.unset(MODE_CONF)
    spark.conf.unset(CKPT_DIR_CONF)


def test_local_mode_is_default_on_local_master_and_truncates(spark):
    out = materialize(_small_df(spark))
    # plan truncated to a scan leaf — no Aggregate/Range left to re-analyze
    plan = _logical_plan(out)
    assert "Aggregate" not in plan and "Range" not in plan
    assert sorted(r.k for r in out.collect()) == list(range(7))


def test_reliable_mode_truncates_and_uses_checkpoint_dir(spark, clean_mode):
    ckpt = tempfile.mkdtemp(prefix="graft_reliable_ckpt_")
    spark.conf.set(MODE_CONF, "reliable")
    spark.conf.set(CKPT_DIR_CONF, ckpt)
    base = _small_df(spark)
    expected = {(r.k, r.n, r.s) for r in base.collect()}
    out = materialize(base)
    assert {(r.k, r.n, r.s) for r in out.collect()} == expected
    plan = _logical_plan(out)
    assert "Aggregate" not in plan and "Range" not in plan
    # the reliable checkpoint actually wrote to the configured dir
    rdd = out._jdf.queryExecution().analyzed().rdd()
    assert rdd.getCheckpointFile().isDefined()
    assert ckpt in rdd.getCheckpointFile().get()


def test_persist_mode_keeps_lineage(spark, clean_mode):
    spark.conf.set(MODE_CONF, "persist")
    base = _small_df(spark)
    expected = {(r.k, r.n, r.s) for r in base.collect()}
    out = materialize(base)
    try:
        assert {(r.k, r.n, r.s) for r in out.collect()} == expected
        # persist mode trades plan truncation for full lineage: an executor
        # loss recomputes instead of failing, so the plan must keep the tree
        assert "Aggregate" in _logical_plan(out)
        assert out.storageLevel.useMemory
    finally:
        out.unpersist()


def test_mode_conf_rejects_unknown_value(spark, clean_mode):
    spark.conf.set(MODE_CONF, "bogus")
    with pytest.raises(ValueError, match="bogus"):
        materialize(_small_df(spark))


def test_release_materialized_frees_local_checkpoint_blocks(spark):
    out = materialize(_small_df(spark), mode="local")
    out.collect()
    assert release_materialized(spark) >= 1
    # all RDD-level persistent blocks are gone (SQL cache untouched by design)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_release_frees_only_the_given_dataframe(spark):
    # the iterative-loop contract (connected components): release the
    # superseded round without touching the live one
    release_materialized(spark)  # clean slate
    kept = materialize(_small_df(spark), mode="local")
    superseded = materialize(_small_df(spark), mode="local")
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() == 2
    assert release(superseded) == 1
    assert jsc.getPersistentRDDs().size() == 1
    # the survivor is still collectable
    assert sorted(r.k for r in kept.collect()) == list(range(7))
    release(kept)
    assert jsc.getPersistentRDDs().size() == 0


def test_release_persist_mode_keeps_lineage_and_recomputes(spark, clean_mode):
    spark.conf.set(MODE_CONF, "persist")
    out = materialize(_small_df(spark))
    out.collect()
    release(out)  # drops cache blocks only; lineage intact
    assert sorted(r.k for r in out.collect()) == list(range(7))
