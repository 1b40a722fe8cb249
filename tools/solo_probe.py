"""Solo perf probe: fresh session, calibration, best-of-2 wall per query.

The STATUS close-outs' binding perf rule measures each target query SOLO
(no cross-query interference from a shared session) and normalizes by the
same constant-work calibration bench.py uses, so readings are comparable
across rounds on a shared host whose throughput swings 2-4x.

Usage: python tools/solo_probe.py name1 [name2 ...] [--sf=DIR] [--n=2]
Prints one line per query: wall_best, calibration, normalized-to-0.10.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    n_runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--n="):
            n_runs = int(a.split("=", 1)[1])

    from bench import run_calibration

    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.session import get_spark

    registry.load_all()
    for name in names:
        spark = get_spark()
        cal = run_calibration(spark)
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            n = registry.QUERIES[name](spark, sf_dir).count()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        norm = best * 0.10 / cal
        print(
            f"{name}: best-of-{n_runs} {best:.2f}s @ calibration {cal:.3f}"
            f" -> normalized {norm:.2f} (rows={n})"
        )
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
