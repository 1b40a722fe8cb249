"""connected_components: propagation correctness + convergence behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.operators.graph import connected_components


def _cc(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(ndf, edf, **kw)
    return dict(out.collect())


def test_chain_converges_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4 forces several propagation rounds.
    got = _cc(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singletons(spark):
    got = _cc(
        spark,
        [1, 2, 3, 10, 11, 99],
        [(2, 1), (2, 3), (11, 10)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_cycle_and_duplicate_edges(spark):
    got = _cc(spark, [7, 8, 9], [(7, 8), (8, 9), (9, 7), (7, 8)])
    assert got == {7: 7, 8: 7, 9: 7}


def test_max_iter_raises_before_convergence(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)], max_iter=1)


def test_empty_edges_all_singletons(spark):
    ndf = spark.createDataFrame([(n,) for n in (3, 1, 2)], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    out = connected_components(ndf, edf)
    assert dict(out.collect()) == {1: 1, 2: 2, 3: 3}
    assert out.columns == ["node", "component"]
