"""Parallel full-catalog sweep: N driver_rehearsal shards, merged.

VERDICT r7 item 6 (sweep wall < 500 s): the sweep's wall clock is
per-query fixed overhead (plan/compile/schedule + DuckDB setup) that one
local session cannot overlap across queries. Two shard processes, each a
16-thread Spark session, run the odd/even halves of the registry
concurrently and their CORRECTNESS rows are merged back into registry
order — verdicts are computed by the exact same code path as the serial
sweep (driver_rehearsal.main), only the process layout changes. The
oracle cache is shared; save_oracle_cache merges on write, and the query
partition guarantees shards never write the same cache key.

Usage: python tools/sweep_shards.py [sf_dir] [out.json] [n_shards]
Defaults: /root/testdata/sf0.01, CORRECTNESS_LOCAL_current.json, 2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "CORRECTNESS_LOCAL_current.json")
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    per_shard_cpus = str(max(4, (int(cpus) if cpus else os.cpu_count() or 32) // n))
    t0 = time.time()
    procs = []
    shard_outs = []
    for k in range(n):
        so = f"{out_path}.shard{k}"
        shard_outs.append(so)
        env = dict(os.environ, SPARK_GRAFT_CPUS=per_shard_cpus)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "driver_rehearsal.py"),
                    sf_dir,
                    so,
                    f"--shard={k}/{n}",
                ],
                env=env,
            )
        )
    # ADVICE r8 item 4: surface a crashed shard by IDENTITY before merging —
    # a missing shard output otherwise raises an unrelated FileNotFoundError
    # that masks the real failure.
    failed = []
    for k, p in enumerate(procs):
        src = p.wait()
        if src not in (0, 1):  # 1 = ran fine, some queries FAILed
            failed.append(f"shard {k}/{n} exited {src}")
        elif not os.path.exists(shard_outs[k]):
            failed.append(f"shard {k}/{n} exited {src} but wrote no output file")
    if failed:
        raise SystemExit("sweep shard failure: " + "; ".join(failed))
    rc = max(p.returncode for p in procs)
    # merge back into registry order so the artifact is diffable across
    # rounds regardless of shard layout
    from etl_cotrip_signs_spark import registry

    registry.load_all()
    rows: dict[str, dict] = {}
    n_rows_before = 0
    for so in shard_outs:
        shard_rows = json.load(open(so))
        n_rows_before += len(shard_rows)
        rows.update(shard_rows)
    # The index-mod partition means no query can run in two shards; assert
    # it (a dict.update would silently keep the later shard's row).
    assert n_rows_before == len(rows), "a query ran in more than one shard"
    merged = {name: rows[name] for name in registry.QUERIES if name in rows}
    missing = [name for name in registry.QUERIES if name not in rows]
    # Assert BEFORE deleting shard outputs: queries registered after the
    # shards started (a mid-sweep wave landing) must fail the merge without
    # destroying the shards' row data.
    assert not missing, f"shards dropped queries: {missing}"
    for so in shard_outs:
        os.remove(so)
    assert list(merged) == [n for n in registry.QUERIES if n in merged], (
        "merged artifact not in registry order"
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    total = time.time() - t0
    n_pass = sum(1 for r in merged.values() if r["hash_match"])
    n_rows = sum(
        1
        for r in merged.values()
        if r["err"] == "no_oracle" and r["spark_rows"] is not None
    )
    n_fail = len(merged) - n_pass - n_rows
    print(
        f"\nMERGED {len(merged)} queries: {n_pass} pass, {n_rows} rows-only, "
        f"{n_fail} FAIL; {total:.1f}s wall ({n} shards)"
    )
    return 1 if (rc or n_fail) else 0


if __name__ == "__main__":
    sys.exit(main())
