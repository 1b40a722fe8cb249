"""Run the driver-rehearsal parity check for a named subset of queries.

Usage: python tools/quick_parity.py name1 name2 ... [--sf SF_DIR]
Same canonicalizer/oracle path as tools/driver_rehearsal.py, but only the
named queries — the edit-loop companion to the full-catalog sweep.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.driver_rehearsal import _canon, dtype_skew, get_spark, run_oracle  # noqa: E402

from etl_cotrip_signs_spark import registry  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    registry.load_all()
    spark = get_spark()
    rc = 0
    for name in args:
        t0 = time.time()
        try:
            spdf = registry.QUERIES[name](spark, sf_dir).toPandas()
            sql = registry.oracle_for(name, sf_dir) if name in registry.ORACLES else None
            if sql is None:
                print(f"rows  {name}: {len(spdf)} rows (no oracle) {time.time()-t0:.1f}s")
                continue
            opdf, otypes = run_oracle(sql, sf_dir)
            skew = dtype_skew(spdf, opdf, otypes)
            ok = (
                len(spdf) == len(opdf)
                and sorted(spdf.columns) == sorted(opdf.columns)
                and not skew
                and _canon(spdf) == _canon(opdf)
            )
            print(
                f"{'PASS' if ok else 'FAIL'}  {name}: spark={len(spdf)} "
                f"oracle={len(opdf)} skew={skew} {time.time()-t0:.1f}s"
            )
            if not ok:
                rc = 1
                print("  spark head:", spdf.sort_values(list(spdf.columns)).head(3).to_dict("records"))
                print("  oracle head:", opdf.sort_values(list(opdf.columns)).head(3).to_dict("records"))
        except Exception as e:  # noqa: BLE001
            rc = 1
            import traceback

            traceback.print_exc(limit=8)
            print(f"ERR   {name}: {type(e).__name__}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
