"""Connected-components dedup clustering: chain propagation, multi-
component graphs, representative selection, empty/degenerate edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_datalake_spark.operators.dedup_cluster import (
    connected_components,
    dedup_representatives,
    symmetric_edges,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_propagates_min_label(spark):
    # path 1-2-3-...-10: diameter 9 forces many propagation rounds
    out = connected_components(_pairs(spark, [(i, i + 1) for i in range(1, 10)]))
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == {i: 1 for i in range(1, 11)}


def test_multiple_components_and_reversed_edges(spark):
    # {1,2,3} triangle, {7,8} given dst<src, singleton edge 5-5 dropped
    out = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 1), (8, 7), (5, 5)])
    )
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_symmetric_edges_dedup_and_no_self_loops(spark):
    e = symmetric_edges(_pairs(spark, [(1, 2), (2, 1), (3, 3)]))
    assert sorted((r.src, r.dst) for r in e.collect()) == [(1, 2), (2, 1)]


def test_empty_pairs_yield_empty_components(spark):
    out = connected_components(_pairs(spark, []))
    assert out.count() == 0
    assert out.columns == ["node", "cluster_id"]


def test_max_iter_exhaustion_raises(spark):
    with pytest.raises(RuntimeError, match="no fixed point"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(1, 10)]), max_iter=2
        )


def test_dedup_representatives_keeps_min_and_singletons(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 8, 99)], "doc_id long, text string"
    )
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (8, 7)]))
    kept = sorted(
        r.doc_id for r in dedup_representatives(corpus, comp).collect()
    )
    # cluster {1,2,3} -> 1, cluster {7,8} -> 7, singleton 99 survives
    assert kept == [1, 7, 99]


def test_reliable_checkpoint_mode(spark, tmp_path):
    """With a checkpoint dir configured, lineage truncation rides
    reliable checkpoint (executor-loss-safe) and results are
    unchanged; the dir is restored so other tests keep the
    localCheckpoint fast path."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        got = {
            (r.node, r.cluster_id)
            for r in connected_components(pairs).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
        import os
        assert os.listdir(str(tmp_path / "ckpt"))  # actually checkpointed
    finally:
        # unset so other tests keep the localCheckpoint fast path
        # (the scala setter name needs getattr: `$` is not Python)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )
        assert sc.getCheckpointDir() is None
