from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

# VERIFY fast lane (VERDICT r10 item 2): node ids marked `slow` and
# deselected by the default `-m "not slow"` lane (pytest.ini) so the
# driver's `python -m pytest tests/ -x -q` fits its window. Criteria for
# membership: measured call time > 10 s in the r11 full run AND the
# coverage is redundant with a faster artifact —
#   * oracle_parity[...] rows here are re-verified by every round's
#     full-catalog sweep (CORRECTNESS_LOCAL_rNN.json, same oracle path);
#   * the xxh64 macro property/fuzz marathons keep a fast sibling in the
#     default lane (test_macros_match_spark_xxhash64 + the per-class
#     spot checks);
#   * test_registered_oracles_emit_no_hugeint is a whole-catalog SQL
#     lint re-run implicitly by the sweep's oracle replays;
#   * the numpy/pandas replay fuzz tests (bpe rank unroll, item-item
#     cosine, merge_asof, wave52 recall) pin third formulations that do
#     not change unless their operator changes — the slow lane is run
#     and recorded at every round close (STATUS.md).
SLOW_TESTS = {
    "test_rehearsal_guard.py::test_registered_oracles_emit_no_hugeint",
    "test_bpe_sql.py::test_rank_unroll_equals_python_loop_fuzz",
    "test_oracle_parity.py::test_oracle_parity[dedup_minhash_band_tuning]",
    "test_xxh64_sql.py::test_macros_match_reference_all_tail_classes",
    "test_oracle_parity.py::test_oracle_parity[dedup_minhash_recall]",
    "test_misc_ops.py::test_item_item_cosine_matches_pandas",
    "test_xxh64_sql.py::test_macros_match_reference_property",
    "test_oracle_parity.py::test_oracle_parity[dedup_minhash_docs]",
    "test_xxh64_sql.py::test_long_hash_matches_reference_and_spark",
    "test_asof.py::test_merge_asof_matches_bruteforce",
    "test_oracle_parity.py::test_oracle_parity[orders_lttb_downsample]",
    "test_wave52.py::test_recall_decisions_true_on_fixture",
    "test_oracle_parity.py::test_oracle_parity[dedup_components_ngram]",
    "test_oracle_parity.py::test_oracle_parity[dedup_survivors_quality]",
    "test_oracle_parity.py::test_oracle_parity[sketch_iblt_diff]",
    "test_oracle_parity.py::test_oracle_parity[signs_rest_stream_pipeline]",
    "test_llm_ops.py::test_simhash_derived_threshold_in_range",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid is like "tests/test_x.py::test_y[param]"; compare on the
        # basename form so invocation directory does not matter.
        nid = item.nodeid.split("/")[-1]
        if nid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_cotrip_signs_spark.session import get_spark

    s = get_spark("etl-cotrip-signs-tests")
    yield s
    s.stop()
