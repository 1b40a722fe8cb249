"""Third-formulation pins for the lakehouse read paths and the Poisson
bootstrap (DuckDB oracle = second engine; these = independent python
replays of the contracts)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64
from etl_cotrip_signs_spark.functions.xxh64_sql import chain_seed
from etl_cotrip_signs_spark.operators.lakehouse import (
    deletion_vector_read,
    table_time_travel,
)
from etl_cotrip_signs_spark.operators.stats3 import stat_bootstrap_ci

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF_SMALL}/orders.parquet")


def _slice_counts(orders: pd.DataFrame) -> dict[str, int]:
    sub = orders[orders.o_orderkey % 7 == 0]
    return {
        f"f{i + 1}": int((sub.o_orderkey % 4 == i).sum()) for i in range(4)
    }


def test_time_travel_visibility(spark, orders_pdf):
    out = (
        table_time_travel(spark, SF_SMALL)
        .toPandas()
        .set_index("version")
        .sort_index()
    )
    c = _slice_counts(orders_pdf)
    # v1 = {f1, f2}; v2 = {f2, f3} (f1 removed at v2); v3 = {f2, f3, f4}
    assert out.loc[1, "n_files_live"] == 2
    assert out.loc[1, "n_rows"] == c["f1"] + c["f2"]
    assert out.loc[2, "n_files_live"] == 2
    assert out.loc[2, "n_rows"] == c["f2"] + c["f3"]
    assert out.loc[3, "n_files_live"] == 3
    assert out.loc[3, "n_rows"] == c["f2"] + c["f3"] + c["f4"]
    # snapshots are monotone only in commits, not rows: the v2 remove
    # genuinely shrank the table if f1 outweighs f3
    sub = orders_pdf[orders_pdf.o_orderkey % 7 == 0]
    cents = (
        (sub.o_totalprice.astype("float64") * 100).round().astype("int64")
    )
    v3_mask = sub.o_orderkey % 4 != 0
    assert out.loc[3, "sum_cents"] == int(cents[v3_mask].sum())


def test_deletion_vector_suppression(spark, orders_pdf):
    out = deletion_vector_read(spark, SF_SMALL).toPandas()
    sub = orders_pdf[orders_pdf.o_orderkey % 5 == 0]
    assert out.n_rows_total.sum() == len(sub)
    # every file suppresses exactly the positions p % 10 == 3 it has
    for _, r in out.iterrows():
        n = int(r["n_rows_total"])
        expected_deleted = len([p for p in range(n) if p % 10 == 3])
        assert r["n_rows_live"] == n - expected_deleted
    # global: live rows = total - sum of per-file position hits
    assert out.n_rows_live.sum() == len(sub) - sum(
        len([p for p in range(int(n)) if p % 10 == 3])
        for n in out.n_rows_total
    )


def test_bootstrap_ci_python_replay(spark):
    """Replay the Poisson bootstrap in plain python from the same hash
    stream and check the exact integer outputs."""
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    p = ev[ev.event_type == "purchase"]
    per_user = {}
    for uid, x in zip(p.user_id.to_numpy(), np.floor(p.value.to_numpy() * 1000).astype(np.int64)):
        per_user[int(uid)] = per_user.get(int(uid), 0) + int(x)

    seed = chain_seed("boot")
    thresholds = [
        math.exp(-1) * sum(1.0 / math.factorial(j) for j in range(k + 1))
        for k in range(8)
    ]

    def weight(uid: int, b: int) -> int:
        h = xxh64((uid * 64 + b).to_bytes(8, "little", signed=True), seed)
        if h >= 1 << 63:
            h -= 1 << 64
        u = (float(h) + 9.223372036854775808e18) / 1.8446744073709551616e19
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return 8

    reps = []
    for b in range(64):
        num = sum(weight(u, b) * x for u, x in per_user.items())
        den = sum(weight(u, b) for u in per_user)
        reps.append((num, den, b))
    reps.sort(key=lambda t: (t[0] / t[1] if t[1] else 0.0, t[2]))
    lo_num, lo_den, _ = reps[3]
    hi_num, hi_den, _ = reps[60]

    row = stat_bootstrap_ci(spark, SF_SMALL).toPandas().iloc[0]
    assert row["n_users"] == len(per_user)
    assert row["point_mean_milli"] == sum(per_user.values()) // len(per_user)
    assert row["lo_mean_milli"] == lo_num // lo_den
    assert row["hi_mean_milli"] == hi_num // hi_den
    assert row["lo_mean_milli"] <= row["point_mean_milli"] <= row["hi_mean_milli"]
