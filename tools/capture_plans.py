"""Capture `.explain("formatted")` for named queries into plans/<ROUND>/.

Usage: python tools/capture_plans.py SUFFIX name1 [name2 ...] [--sf=DIR]
       python tools/capture_plans.py SUFFIX --headline [--sf=DIR]
       python tools/capture_plans.py SUFFIX ... [--round=r11]

Writes plans/<ROUND>/<query>_<SUFFIX>.txt for each query (default round:
r11). Plan capture is driver-side only for lazy queries; queries that run
eager build jobs (checkpoints, collected sketches) execute those while the
plan is taken.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_cotrip_signs_spark import registry  # noqa: E402
from etl_cotrip_signs_spark.plans.explain import formatted_plan  # noqa: E402
from etl_cotrip_signs_spark.session import get_spark  # noqa: E402


USAGE = (
    "usage: python tools/capture_plans.py SUFFIX [name ...]"
    " [--headline] [--sf=DIR] [--round=rNN]"
)


def main() -> int:
    # ADVICE r10: validate argc and reject a flag-shaped suffix instead of
    # silently consuming '--headline'/'--sf=...' as the file suffix.
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        print(USAGE, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    round_dir = "r11"
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--round="):
            round_dir = a.split("=", 1)[1]
    if "--headline" in sys.argv:
        from bench import HEADLINE

        names = list(HEADLINE) + names
    if not names:
        print(USAGE, file=sys.stderr)
        return 2

    registry.load_all()
    spark = get_spark("plan-capture")
    out_dir = os.path.join(REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            if df.isStreaming:
                txt = "(streaming query - no batch plan)\n"
            else:
                txt = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            txt = f"(plan capture failed: {type(e).__name__}: {e})\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
