"""Property test for the merge-asof join: the union+last formulation must
agree with a brute-force per-event reference on random micro-data,
including ties (order exactly at event time, multiple orders same date).
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

import etl_cotrip_signs_spark.operators.relational as rel

BASE = datetime.datetime(2020, 1, 1)

orders_strategy = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 20)),  # (custkey, day)
    min_size=0,
    max_size=12,
)
events_strategy = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 20)),  # (user, day)
    min_size=1,
    max_size=10,
)


@given(orders_strategy, events_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_asof_matches_bruteforce(spark, orders_raw, events_raw):
    orders = [
        (i + 1, ck, datetime.datetime(2020, 1, 1) + datetime.timedelta(days=d))
        for i, (ck, d) in enumerate(orders_raw)
    ]
    events = [
        (100 + i, u, datetime.datetime(2020, 1, 1) + datetime.timedelta(days=d, hours=1))
        for i, (u, d) in enumerate(events_raw)
    ]
    # exact-time tie case: first event sits exactly on an order date
    if orders:
        ok, ck, od = orders[0]
        events.append((999, ck, od))

    o_df = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz"
    )
    e_df = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp_ntz"
    )

    import etl_cotrip_signs_spark.io as io

    orig = io.load_table

    def fake_load(spark_, sf_dir_, name):
        return {"orders": o_df, "events": e_df}[name]

    rel.load_table = fake_load
    try:
        got = {
            r["event_id"]: (r["asof_orderkey"], r["asof_orderdate"])
            for r in rel.join_asof_latest_order(spark, "ignored").collect()
        }
    finally:
        rel.load_table = orig

    # brute force: per event, max (orderdate, orderkey) among user's orders <= ts
    expect = {}
    for eid, u, ts in events:
        cands = [(od, ok) for ok, ck, od in orders if ck == u and od <= ts]
        if cands:
            od, ok = max(cands)
            expect[eid] = (ok, od.date())
    assert got == expect
