"""Sweep-artifact / registry lock-step + oracle-cache busting.

VERDICT r6 items 2 and 6: the full-catalog sweep artifact
(CORRECTNESS_LOCAL_r*.json) trailed the registry by two queries in round 6
because they were registered after the final sweep snapshot; nothing forced
the two to agree. The lock test makes a stale artifact a test failure, so
the close-out sweep MUST be regenerated after any registry change. The
cache tests pin the oracle-result cache's safety rules (digest busting,
scratch exclusion) so a cache hit can never reuse a stale oracle verdict.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.driver_rehearsal import oracle_cache_lookup

from etl_cotrip_signs_spark import registry

registry.load_all()


def latest_sweep_path() -> str | None:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_LOCAL_r*.json"))
    if not paths:
        return None
    return max(
        paths,
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )


def test_sweep_artifact_rowset_equals_registry():
    """The latest CORRECTNESS_LOCAL artifact must carry exactly one row per
    registered query — no more (ghost queries), no fewer (post-sweep
    registrations shipped without sweep evidence)."""
    path = latest_sweep_path()
    assert path is not None, "no CORRECTNESS_LOCAL_r*.json artifact exists"
    artifact = set(json.load(open(path)))
    reg = set(registry.QUERIES)
    missing = sorted(reg - artifact)
    ghosts = sorted(artifact - reg)
    assert not missing and not ghosts, (
        f"{os.path.basename(path)} out of lock-step with the registry: "
        f"missing={missing} ghosts={ghosts} — regenerate the sweep "
        f"(python tools/driver_rehearsal.py /root/testdata/sf0.01 "
        f"{os.path.basename(path)})"
    )


def _entry(sql: str) -> dict:
    return {
        "sql_sha": hashlib.sha256(sql.encode()).hexdigest(),
        "sf_sha": "fix1",
        "oracle_rows": 1,
        "columns": ["a"],
        "dtype_kinds": {"a": "i"},
        "otypes": {"a": "BIGINT"},
        "canon_sha": "x",
    }


def test_oracle_cache_hit_requires_exact_sql_digest():
    sql = "SELECT 1 AS a"
    cache = {"q@/sf": _entry(sql)}
    assert oracle_cache_lookup(cache, "q", "/sf", sql, sql, "fix1") is not None
    # any oracle edit (even whitespace) busts the entry
    edited = sql + " "
    assert oracle_cache_lookup(cache, "q", "/sf", edited, edited, "fix1") is None


def test_oracle_cache_hit_requires_fixture_digest():
    """Regenerated testdata under the SAME path must bust every entry
    (ADVICE r7 item 2): the SQL digest cannot see the data changing."""
    sql = "SELECT 1 AS a"
    cache = {"q@/sf": _entry(sql)}
    assert oracle_cache_lookup(cache, "q", "/sf", sql, sql, "fix1") is not None
    assert oracle_cache_lookup(cache, "q", "/sf", sql, sql, "fix2") is None


def test_oracle_cache_is_per_query_and_per_sf():
    sql = "SELECT 1 AS a"
    cache = {"q@/sf": _entry(sql)}
    assert oracle_cache_lookup(cache, "q2", "/sf", sql, sql, "fix1") is None
    assert oracle_cache_lookup(cache, "q", "/sf2", sql, sql, "fix1") is None


def test_oracle_cache_never_serves_scratch_oracles():
    """Scratch-reading oracles consume files the Spark query just staged —
    their inputs are not the immutable sf tables, so they must re-run."""
    template = "SELECT * FROM read_parquet('{SCRATCH:tag}/f.parquet')"
    rendered = "SELECT * FROM read_parquet('/tmp/x/f.parquet')"
    cache = {"q@/sf": _entry(rendered)}
    assert oracle_cache_lookup(cache, "q", "/sf", rendered, template, "fix1") is None
