"""Driver-slot coverage ledger (VERDICT r4 task 8).

Which of the registered queries have hard driver history? Diffs every
CORRECTNESS_r*.json in the repo root and emits one markdown table:
query name, current driver position (first-50 = will be checked next
round), per-round result (hash-green / rows-only / FAIL), and a summary
header. Paste the output into STATUS.md after each rotation (the round
close-out does this).

Usage: python tools/driver_ledger.py [--summary-only]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rounds[int(m.group(1))] = json.load(open(path))
    return rounds


def cell(row: dict) -> str:
    if row.get("hash_match"):
        return "pass"
    if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
        return "rows"
    return "FAIL"


def main() -> int:
    from etl_cotrip_signs_spark import registry

    registry.load_all()
    rounds = load_rounds()
    order = list(registry.QUERIES)
    lines: list[str] = []
    n_hash_ever = n_rows_only_ever = n_never = 0
    per_query: list[tuple[str, str, str]] = []
    for i, name in enumerate(order):
        hist = {r: cell(rows[name]) for r, rows in rounds.items() if name in rows}
        if any(v == "pass" for v in hist.values()):
            n_hash_ever += 1
        elif hist:
            n_rows_only_ever += 1
        else:
            n_never += 1
        hist_str = " ".join(f"r{r}:{v}" for r, v in sorted(hist.items())) or "—"
        slot = str(i + 1) if i < 50 else "tail"
        per_query.append((name, slot, hist_str))

    lines.append(
        f"Driver-slot ledger over {len(order)} registered queries and "
        f"rounds {sorted(rounds)}: **{n_hash_ever} hash-green at least once**, "
        f"{n_rows_only_ever} rows-only history, {n_never} never driver-checked "
        f"({50 - sum(1 for _, s, h in per_query if s != 'tail' and h != '—')} "
        f"of the current first-50 are first-timers next round)."
    )
    if "--summary-only" in sys.argv:
        print("\n".join(lines))
        return 0
    lines.append("")
    lines.append("| query | slot | driver history |")
    lines.append("| --- | --- | --- |")
    for name, slot, hist in per_query:
        lines.append(f"| {name} | {slot} | {hist} |")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
