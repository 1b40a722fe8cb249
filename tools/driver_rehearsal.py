"""Full-catalog rehearsal of the driver's CORRECTNESS protocol.

Runs EVERY registered query at the given sf dir, canonicalizes the output
exactly the way the driver does (pandas ``sort_values`` over all columns —
the step that rejected array-typed cells in round 1), runs the DuckDB
oracle when one exists, and writes a CORRECTNESS-shaped JSON.

Usage:  python tools/driver_rehearsal.py [sf_dir] [out.json]
Defaults: /root/testdata/sf0.01, CORRECTNESS_rehearsal.json
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.io import TABLES
from etl_cotrip_signs_spark.session import get_spark

# Oracle-result cache (VERDICT r6 task 6): the sf0.01 sweep is dominated by
# unrolled iterative DuckDB oracles (the Kruskal recursive CTE alone ~50s),
# which re-prove the same SQL against the same immutable parquet every
# round. Cache the ORACLE side keyed by (query, sf_dir, sha256 of the
# rendered SQL): a hit skips the DuckDB replay and compares the live Spark
# canon hash against the cached oracle canon hash — the Spark side still
# runs every sweep, so an engine regression (or a staging change feeding a
# {SCRATCH:} oracle) surfaces as a hash FAIL rather than being hidden.
# Scratch-reading oracles are NOT cached: their inputs are files the Spark
# query just staged, not the immutable sf tables. Disable wholesale with
# SPARK_GRAFT_ORACLE_CACHE=0.
ORACLE_CACHE_PATH = os.path.join(REPO, "tools", "oracle_cache.json")


def canon_sha(canon: list[tuple]) -> str:
    """Stable digest of the driver-canonicalized rows."""
    return hashlib.sha256(
        json.dumps([list(t) for t in canon]).encode()
    ).hexdigest()


def sf_digest(sf_dir: str) -> str:
    """Fingerprint of the fixture parquet files under ``sf_dir``.

    Folded into every cache entry (ADVICE r7 item 2): the SQL digest alone
    cannot see the DATA changing — regenerating testdata under the same
    path would otherwise silently replay stale oracle canon hashes.
    Per file: (name, size, mtime_ns, head/tail content hash). The content
    bytes close the ADVICE r8 hole where a fixture regenerated with
    preserved timestamps (cp -p / rsync -a) or an equal-size rewrite would
    replay stale hashes — parquet stores row-group metadata + a footer
    checksum in the tail, so any data change perturbs these bytes."""
    try:
        names = sorted(
            f for f in os.listdir(sf_dir) if f.endswith(".parquet")
        )
        sig = []
        for f in names:
            p = os.path.join(sf_dir, f)
            st = os.stat(p)
            h = hashlib.sha256()
            with open(p, "rb") as fh:
                h.update(fh.read(65536))
                if st.st_size > 65536:
                    fh.seek(max(0, st.st_size - 65536))
                    h.update(fh.read(65536))
            sig.append((f, st.st_size, st.st_mtime_ns, h.hexdigest()))
    except OSError:
        return "<unreadable>"
    return hashlib.sha256(json.dumps(sig).encode()).hexdigest()


def load_oracle_cache() -> dict:
    if os.environ.get("SPARK_GRAFT_ORACLE_CACHE", "1") == "0":
        return {}
    try:
        with open(ORACLE_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_oracle_cache(new_entries: dict) -> None:
    """Persist only entries THIS process computed or refreshed.

    ADVICE r8 item 1: overlaying the process's full startup snapshot (as
    the r8 merge did) wrote sibling-shard keys back at their stale startup
    values, clobbering entries the sibling just refreshed. Callers now pass
    the newly-computed delta only; it is overlaid on a fresh re-read of the
    file, so concurrent shards compose regardless of exit order."""
    if os.environ.get("SPARK_GRAFT_ORACLE_CACHE", "1") == "0":
        return
    if not new_entries:
        return
    merged: dict = {}
    try:
        with open(ORACLE_CACHE_PATH) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        pass
    merged.update(new_entries)
    tmp = ORACLE_CACHE_PATH + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    os.replace(tmp, ORACLE_CACHE_PATH)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    """Driver-style canonicalization: sort columns by name, sort_values over
    all columns (this is where list cells explode), then normalize cells."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)

    def norm(v):
        import datetime

        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            if v == 0.0:  # -0.0 and 0.0 hash alike (ADVICE r7 item 2)
                return "0"
            return f"{v:.6g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return pd.Timestamp(v).isoformat()
        return str(v)

    return [tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)]


def run_oracle(sql: str, sf_dir: str) -> tuple[pd.DataFrame, dict[str, str]]:
    """Run the oracle; also return DuckDB's declared column types.

    The types matter: ``sum(BIGINT)`` yields HUGEINT, which pandas
    materializes as float64 while Spark returns int64 — values print the
    same under %.6g but the driver hashes the dtypes apart. Round 2 shipped
    exactly that FAIL, so the rehearsal now surfaces it instead of
    normalizing it away."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(sql)
    types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    return rel.df(), types


def dtype_skew(spdf: pd.DataFrame, opdf: pd.DataFrame, otypes: dict[str, str]) -> list[str]:
    """Columns whose numeric kind differs between Spark and the oracle
    (int-vs-float), plus any oracle column DuckDB types as HUGEINT.
    Either one means the driver's hash will diverge even when every value
    renders identically — treat as a mismatch, not a cosmetic detail."""
    bad: list[str] = []
    for c in spdf.columns:
        if c not in opdf.columns:
            continue
        if "HUGEINT" in otypes.get(c, "").upper():
            bad.append(f"{c}: oracle type {otypes[c]} (HUGEINT) — cast the SQL to BIGINT")
            continue
        sk, ok = spdf[c].dtype.kind, opdf[c].dtype.kind
        if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
            bad.append(f"{c}: spark dtype {spdf[c].dtype} vs oracle dtype {opdf[c].dtype}")
    return bad


def oracle_cache_lookup(
    cache: dict, name: str, sf_dir: str, sql: str, template: str,
    fixture_sha: str,
) -> dict | None:
    """Return the cached oracle entry iff it is safe to reuse: the oracle
    must not read Spark-staged scratch files, the rendered SQL's digest
    must equal the cached digest (any oracle edit busts the entry), and
    the fixture parquet fingerprint must match (regenerated testdata under
    the same path busts every entry — ADVICE r7 item 2)."""
    if "{SCRATCH:" in template:
        return None
    if fixture_sha == "<unreadable>":
        # ADVICE r8 item 2: an unreadable fixture dir must never MATCH
        # another '<unreadable>' sentinel — force a live oracle run.
        return None
    ent = cache.get(f"{name}@{sf_dir}")
    if ent is None:
        return None
    if ent.get("sql_sha") != hashlib.sha256(sql.encode()).hexdigest():
        return None
    if ent.get("sf_sha") != fixture_sha:
        return None
    return ent


def cached_dtype_skew(
    spdf: pd.DataFrame, okinds: dict[str, str], otypes: dict[str, str]
) -> list[str]:
    """dtype_skew against a cached oracle's dtype kinds + declared types."""
    bad: list[str] = []
    for c in spdf.columns:
        if c not in okinds:
            continue
        if "HUGEINT" in otypes.get(c, "").upper():
            bad.append(f"{c}: oracle type {otypes[c]} (HUGEINT) — cast the SQL to BIGINT")
            continue
        sk, ok = spdf[c].dtype.kind, okinds[c]
        if {sk, ok} == {"i", "f"} or {sk, ok} == {"u", "f"}:
            bad.append(f"{c}: spark dtype {spdf[c].dtype} vs cached oracle kind {ok}")
    return bad


def main() -> int:
    # --shard=k/n: process only queries whose registry index % n == k.
    # The sweep's wall clock is dominated by per-query fixed overhead
    # (planning, job scheduling, DuckDB setup) that a single local[32]
    # session cannot parallelize across queries; two 16-thread shards
    # overlap it (VERDICT r7 item 6). tools/sweep_shards.py launches the
    # shards and merges their outputs back into registry order.
    shard_k, shard_n = 0, 1
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            shard_k, shard_n = (int(x) for x in a.split("=", 1)[1].split("/"))
        else:
            argv.append(a)
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else os.path.join(REPO, "CORRECTNESS_rehearsal.json")
    # The sweep re-derives the shared deterministic intermediates (radius
    # edge list x5 consumers, del1 name pairs x6) dozens of times — opt in
    # to the parquet stage cache for the Spark side. Oracles are unaffected
    # (they build their own edges in SQL), so a cache bug would surface as
    # a hash FAIL here, not hide one.
    os.environ.setdefault("SPARK_GRAFT_STAGE_CACHE", "1")
    registry.load_all()
    spark = get_spark()
    results: dict[str, dict] = {}
    cache = load_oracle_cache()
    new_cache_entries: dict[str, dict] = {}
    fixture_sha = sf_digest(sf_dir)
    n_cache_hits = 0
    t_start = time.time()
    qi = 0
    for ri, (name, fn) in enumerate(registry.QUERIES.items()):
        if ri % shard_n != shard_k:
            continue
        qi += 1
        # Session hygiene: 331 queries in one session accumulate dead
        # localCheckpoint blocks + codegen/AQE caches that inflate later
        # queries 2-5x (bench.py measured this in round 5; the r6 sweep
        # saw isotonic_regression_daily at 25s in-sweep vs 6s in r5).
        # A periodic restart reclaims everything for ~3s each.
        if qi > 1 and qi % 40 == 1:
            spark.stop()
            spark = get_spark()
        t0 = time.time()
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "secs": None,
            "spark_secs": None,
        }
        try:
            spdf = fn(spark, sf_dir).toPandas()
            row["spark_secs"] = round(time.time() - t0, 2)
            row["spark_rows"] = len(spdf)
            spark_canon = _canon(spdf)
            sql = registry.ORACLES.get(name)
            if sql is not None:
                # {SCRATCH:tag} templates are pre-rendered for the driver's
                # sf0.01; re-render for the sf this rehearsal runs at
                sql = registry.oracle_for(name, sf_dir)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                ck = f"{name}@{sf_dir}"
                template = registry.ORACLE_TEMPLATES.get(name, registry.ORACLES[name])
                cacheable = "{SCRATCH:" not in template
                ent = oracle_cache_lookup(
                    cache, name, sf_dir, sql, template, fixture_sha
                )
                if ent is not None:
                    n_cache_hits += 1
                    row["oracle_rows"] = ent["oracle_rows"]
                    row["rows_match"] = len(spdf) == ent["oracle_rows"]
                    row["schema_match"] = sorted(spdf.columns) == ent["columns"]
                    skew = cached_dtype_skew(spdf, ent["dtype_kinds"], ent["otypes"])
                    if skew:
                        row["hash_match"] = False
                        row["err"] = "dtype_skew: " + "; ".join(skew)
                    else:
                        row["hash_match"] = canon_sha(spark_canon) == ent["canon_sha"]
                else:
                    opdf, otypes = run_oracle(sql, sf_dir)
                    row["oracle_rows"] = len(opdf)
                    row["rows_match"] = len(spdf) == len(opdf)
                    row["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                    skew = dtype_skew(spdf, opdf, otypes)
                    if skew:
                        row["hash_match"] = False
                        row["err"] = "dtype_skew: " + "; ".join(skew)
                    else:
                        # Same canonical serialization as the cached path
                        # (ADVICE r7 item 2): both compare canon_sha, so a
                        # verdict can never flip on cache hit vs miss.
                        row["hash_match"] = (
                            canon_sha(spark_canon) == canon_sha(_canon(opdf))
                        )
                    if cacheable and not skew:
                        new_cache_entries[ck] = cache[ck] = {
                            "sql_sha": hashlib.sha256(sql.encode()).hexdigest(),
                            "sf_sha": fixture_sha,
                            "oracle_rows": len(opdf),
                            "columns": sorted(opdf.columns),
                            "dtype_kinds": {c: opdf[c].dtype.kind for c in opdf.columns},
                            "otypes": otypes,
                            "canon_sha": canon_sha(_canon(opdf)),
                        }
        except Exception:
            row["err"] = traceback.format_exc(limit=5)
        row["secs"] = round(time.time() - t0, 2)
        results[name] = row
        status = (
            "PASS" if row["hash_match"]
            else ("rows" if row["err"] == "no_oracle" and row["spark_rows"] is not None else "FAIL")
        )
        print(f"{status:5s} {name:40s} {row['secs']:6.2f}s rows={row['spark_rows']}")
    total = time.time() - t_start
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    save_oracle_cache(new_cache_entries)
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_rows = sum(1 for r in results.values() if r["err"] == "no_oracle" and r["spark_rows"] is not None)
    n_fail = len(results) - n_pass - n_rows
    print(
        f"\n{len(results)} queries: {n_pass} pass, {n_rows} rows-only, "
        f"{n_fail} FAIL; {total:.1f}s total; {n_cache_hits} oracle cache hits"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
