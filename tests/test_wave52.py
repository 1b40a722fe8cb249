"""Round-10 pins: the knn_*_recall decision-hash graduation (VERDICT r9
item 5). The five recall twins now hash their exact-twin counts against
DuckDB and assert a measured-floor boolean; these tests pin that the
boolean actually trips on a collapsed approximate path (the failure mode
the graduation exists to catch) and that the floors hold with margin on
the real fixtures."""

from __future__ import annotations

from etl_cotrip_signs_spark.operators import similarity

from .conftest import SF_SMALL


def test_recall_floor_trips_on_collapsed_ann(spark):
    """An ANN path returning zero candidates must read recall_ge_floor =
    FALSE (a driver hash mismatch), not a null or a vacuous TRUE."""
    exact = similarity.knn_exact_cosine(spark, SF_SMALL).select(
        "query_id", "neighbor_id"
    )
    empty_ann = exact.filter("query_id < 0")
    row = similarity._recall_vs_exact(
        exact, empty_ann, similarity._RECALL_FLOOR_PQ
    ).collect()[0]
    assert row.recall_ge_floor is False
    assert row.n_exact > 0


def test_recall_floor_trips_on_empty_exact(spark):
    """An empty exact set is a collapse (FALSE), never a divide-by-zero."""
    exact = similarity.knn_exact_cosine(spark, SF_SMALL).select(
        "query_id", "neighbor_id"
    )
    none = exact.filter("query_id < 0")
    row = similarity._recall_vs_exact(
        none, none, similarity._RECALL_FLOOR_PQ
    ).collect()[0]
    assert row.recall_ge_floor is False
    assert row.n_exact == 0


def test_recall_decisions_true_on_fixture(spark):
    """All five graduated rows must clear their floors on the small
    fixture (measured r10: LSH 0.99, IVF 0.64, PQ 0.22, OPQ 0.22,
    IVF-PQ 0.21 — each comfortably above its floor)."""
    for fn in [
        similarity.knn_lsh_recall,
        similarity.knn_ivf_recall,
        similarity.knn_pq_recall,
        similarity.knn_opq_recall,
        similarity.knn_ivfpq_recall,
    ]:
        row = fn(spark, SF_SMALL).collect()[0]
        assert row.recall_ge_floor is True, fn.__name__
        assert row.n_queries == 20 and row.n_exact == 100, fn.__name__
