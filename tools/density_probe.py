"""10x-density probe for named queries: fresh session, replicated tables.

Replicates sf0.001 10x (bench.build_probe_dir) and times the named
queries against it — the decisive instrument for join-strategy and
materialization changes (r10: two checkpoint experiments looked flat solo
but regressed 3-4x here and were reverted).

Usage: python tools/density_probe.py name1 [name2 ...] [--n=2]
Prints wall_best, calibration, normalized-to-0.10, rows per query.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n_runs = int(a.split("=", 1)[1])

    from bench import build_probe_dir, run_calibration, _release_session_state

    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.session import get_spark

    registry.load_all()
    spark = get_spark("density-probe")
    probe_dir = build_probe_dir(spark)
    cal = run_calibration(spark)
    for name in names:
        _release_session_state(spark)
        best, rows = None, None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            rows = registry.QUERIES[name](spark, probe_dir).count()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        print(
            f"{name}: best-of-{n_runs} {best:.2f}s @ calibration {cal:.3f}"
            f" -> normalized {best * 0.10 / cal:.2f} (rows={rows})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
