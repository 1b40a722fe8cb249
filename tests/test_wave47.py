"""Pins for wave 47: PMI vs a pure-pandas recomputation, chunk-boilerplate
accounting identities, seasonal-MK S recomputed brute-force, and the schema
drift report's exact status set."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.lakehouse import dq_schema_drift_report
from etl_cotrip_signs_spark.operators.text import (
    _CHUNK_W,
    _PMI_MIN_CO,
    _PMI_MIN_DF,
    text_chunk_boilerplate,
    text_pmi_cooccurrence,
)
from etl_cotrip_signs_spark.operators.timeseries import (
    trend_seasonal_mann_kendall,
)

from .conftest import SF_SMALL


def _doc_tokens() -> pd.DataFrame:
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    docs["toks"] = docs.text.str.strip().str.split(" ").map(
        lambda ts: sorted({t for t in ts if t})
    )
    return docs


def test_pmi_matches_pandas(spark):
    out = text_pmi_cooccurrence(spark, SF_SMALL).toPandas()
    docs = _doc_tokens()
    n_docs = len(docs)
    df_counts: dict[str, int] = {}
    for ts in docs.toks:
        for t in ts:
            df_counts[t] = df_counts.get(t, 0) + 1
    vocab = {t for t, c in df_counts.items() if c >= _PMI_MIN_DF}
    co: dict[tuple[str, str], int] = {}
    for ts in docs.toks:
        kept = sorted(t for t in ts if t in vocab)
        for i, t1 in enumerate(kept):
            for t2 in kept[i + 1 :]:
                co[(t1, t2)] = co.get((t1, t2), 0) + 1
    rows = [
        (t1, t2, c, df_counts[t1], df_counts[t2],
         round(math.log(n_docs * c / (df_counts[t1] * df_counts[t2])), 6))
        for (t1, t2), c in co.items()
        if c >= _PMI_MIN_CO
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    expect = rows[: len(out)]
    got = list(
        out[["t1", "t2", "c_xy", "c_x", "c_y", "pmi"]].itertuples(
            index=False, name=None
        )
    )
    assert [
        (a, b, int(c), int(x), int(y), round(p, 6)) for a, b, c, x, y, p in got
    ] == expect


def test_chunk_boilerplate_accounting(spark):
    out = text_chunk_boilerplate(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    per: dict[str, dict[str, int]] = {}
    for _, d in docs.iterrows():
        ts = d.text.strip().split(" ")
        for i in range(len(ts) // _CHUNK_W):
            ch = hashlib.md5(
                " ".join(ts[i * _CHUNK_W : (i + 1) * _CHUNK_W]).encode()
            ).hexdigest()
            per.setdefault(d.source, {})
            per[d.source][ch] = per[d.source].get(ch, 0) + 1
    for _, r in out.iterrows():
        counts = per[r.source]
        assert r.n_chunks == sum(counts.values())
        assert r.n_distinct_chunks == len(counts)
        assert r.n_dup_chunks == r.n_chunks - r.n_distinct_chunks
        assert r.dup_ratio_ppm == r.n_dup_chunks * 1_000_000 // r.n_chunks
        assert r.top_chunk_count == max(counts.values())


def test_seasonal_mk_matches_bruteforce(spark):
    row = trend_seasonal_mann_kendall(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    od = pd.to_datetime(orders.o_orderdate)
    cents = np.floor(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
    m = pd.DataFrame({"season": od.dt.month, "y": od.dt.year, "c": cents})
    monthly = m.groupby(["season", "y"]).c.sum()
    s_total, var18, n_points, n_seasons = 0, 0, 0, 0
    for season, grp in monthly.groupby(level=0):
        xs = grp.droplevel(0).sort_index()
        n = len(xs)
        n_seasons += 1
        n_points += n
        vals = xs.to_numpy()
        for i in range(n):
            for j in range(i + 1, n):
                s_total += int(np.sign(vals[j] - vals[i]))
        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in pd.Series(vals).value_counts()
            if t > 1
        )
        var18 += n * (n - 1) * (2 * n + 5) - tie
    assert row.s_stat == s_total
    assert row.var18 == var18
    assert row.n_points == n_points and row.n_seasons == n_seasons
    z = (
        0.0
        if s_total == 0
        else (s_total - (1 if s_total > 0 else -1)) / math.sqrt(var18 / 18.0)
    )
    assert math.isclose(row.z_smk, round(z, 6), abs_tol=1e-9)


def test_schema_drift_statuses(spark):
    out = dq_schema_drift_report(spark, SF_SMALL).toPandas()
    by = dict(zip(out.column_name, out.status))
    assert by == {
        "o_orderkey": "unchanged",
        "o_custkey": "type_changed",
        "o_totalprice": "unchanged",
        "o_orderpriority": "removed",
        "o_orderdate": "added",
    }
    # flags are consistent with statuses
    for _, r in out.iterrows():
        assert r.in_v1 == (r.status != "added")
        assert r.in_v2 == (r.status != "removed")
        assert r.type_changed == (r.status == "type_changed")


def test_chunk_boilerplate_short_docs_emit_no_chunks(spark, tmp_path):
    """ADVICE r9 pin: a document shorter than one chunk must contribute
    ZERO chunks (DuckDB's range(0, len//W) is empty), not the two spurious
    chunks Spark's descending sequence(0, -1) used to emit."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c",                       # 3 tokens < _CHUNK_W -> 0 chunks
                " ".join(["t"] * _CHUNK_W),    # exactly one chunk
                "",                            # empty -> 0 chunks
            ],
            "lang": ["en"] * 3,
            "source": ["s_short", "s_exact", "s_short"],
            "n_chars": [5, 15, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    out = text_chunk_boilerplate(spark, str(tmp_path)).toPandas()
    # only the exactly-one-chunk source appears; short/empty docs vanish
    assert list(out.source) == ["s_exact"]
    assert list(out.n_chunks) == [1]
    assert list(out.n_distinct_chunks) == [1]
