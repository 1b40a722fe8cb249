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


def test_oracle_cache_unreadable_fixture_never_matches():
    """ADVICE r8 item 2: an unreadable fixture dir digests to the constant
    '<unreadable>' — that sentinel must never MATCH a cached entry (even one
    saved under the same sentinel), forcing a live oracle run."""
    sql = "SELECT 1 AS a"
    ent = _entry(sql)
    ent["sf_sha"] = "<unreadable>"
    cache = {"q@/sf": ent}
    assert (
        oracle_cache_lookup(cache, "q", "/sf", sql, sql, "<unreadable>") is None
    )


def test_sf_digest_sees_content_not_just_stat(tmp_path):
    """ADVICE r8 item 2: equal-size same-mtime rewrites must change the
    fixture digest — the digest now folds head/tail content bytes in."""
    from tools.driver_rehearsal import sf_digest

    p = tmp_path / "t.parquet"
    p.write_bytes(b"A" * 128)
    st = os.stat(p)
    d1 = sf_digest(str(tmp_path))
    p.write_bytes(b"B" * 128)  # same size
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # same mtime
    d2 = sf_digest(str(tmp_path))
    assert d1 != d2


def test_save_oracle_cache_writes_delta_only(tmp_path, monkeypatch):
    """ADVICE r8 item 1: a later-exiting shard must not write back its
    startup snapshot of sibling-shard keys — save_oracle_cache persists only
    the entries the caller computed, overlaid on a fresh re-read."""
    import tools.driver_rehearsal as dr

    path = str(tmp_path / "cache.json")
    monkeypatch.setattr(dr, "ORACLE_CACHE_PATH", path)
    json.dump({"shared@sf": {"canon_sha": "stale"}}, open(path, "w"))
    # shard A starts (snapshots the file), shard B refreshes the shared key
    json.dump({"shared@sf": {"canon_sha": "fresh"}}, open(path, "w"))
    # shard A exits, saving only ITS new entry — B's refresh must survive
    dr.save_oracle_cache({"mine@sf": {"canon_sha": "new"}})
    final = json.load(open(path))
    assert final["shared@sf"]["canon_sha"] == "fresh"
    assert final["mine@sf"]["canon_sha"] == "new"


def test_shard_merge_preserves_registry_order_and_partition():
    """VERDICT r8 item 7: the index-mod shard partition assigns every
    registry index to exactly one shard, and the merged artifact is written
    in registry order (the merge comprehension iterates registry.QUERIES)."""
    names = list(registry.QUERIES)
    for n_shards in (2, 3):
        seen: dict[str, int] = {}
        for k in range(n_shards):
            for i, name in enumerate(names):
                if i % n_shards == k:
                    assert name not in seen, (
                        f"{name} assigned to shards {seen[name]} and {k}"
                    )
                    seen[name] = k
        assert len(seen) == len(names)
