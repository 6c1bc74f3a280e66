"""Relational pipelines vs DuckDB oracles at sf0.001 (same comparison the
driver performs at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from pyf_aggregator_ray.pipelines import relational as rel

SF = "/root/testdata/sf0.001"
TABLES = ["customer", "orders", "lineitem", "events", "part"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


CASES = [
    ("q1_pricing_summary", rel.q1_pricing_summary, rel.Q1_SQL),
    ("newest_order", rel.newest_order_per_customer, rel.NEWEST_ORDER_SQL),
    ("top5", rel.top5_orders_per_status, rel.TOP5_SQL),
    ("revenue_by_segment", rel.revenue_by_segment, rel.REVENUE_BY_SEGMENT_SQL),
    ("registry_union", rel.registry_union, rel.REGISTRY_UNION_SQL),
    ("tumbling", rel.tumbling_window, rel.TUMBLING_SQL),
    ("sessionize", rel.sessionize, rel.SESSIONIZE_SQL),
    (
        "anti_join",
        rel.customers_without_recent_orders,
        rel.CUSTOMERS_WITHOUT_ORDERS_SQL,
    ),
    ("versions", rel.version_sortable_table, rel.version_sortable_sql()),
]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_matches_oracle(con, name, fn, sql):
    res = fn(SF)
    res = res.to_pandas() if hasattr(res, "to_pandas") else res
    oracle = con.execute(sql).fetchdf()
    cols = sorted(res.columns)
    assert cols == sorted(oracle.columns)
    r1 = res[cols].sort_values(cols).reset_index(drop=True)
    r2 = oracle[cols].sort_values(cols).reset_index(drop=True)
    assert len(r1) == len(r2), name
    for c in cols:
        if pd.api.types.is_float_dtype(r1[c]) or pd.api.types.is_float_dtype(r2[c]):
            assert ((r1[c].astype(float) - r2[c].astype(float)).abs() < 1e-9).all(), c
        else:
            assert (r1[c].astype(str) == r2[c].astype(str)).all(), c


def test_sessionize_gap_semantics():
    """Events within 30 min stay in one session; >30 min splits."""
    df = rel.sessionize(SF).to_pandas()
    assert (df["n_events"] >= 1).all()
    assert (df["duration_s"] >= 0).all()
    # session ids are dense per user starting at 1
    for _, g in df.groupby("user_id"):
        assert sorted(g["session_id"]) == list(range(1, len(g) + 1))


def test_tumbling_window_routes_null_ts_to_catch_all(tmp_path, ray_session):
    """Late-data rule (reference fetcher.py:444-447): events with null
    timestamps are INCLUDED, routed to the -1 catch-all window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyf_aggregator_ray.pipelines.relational import tumbling_window

    tbl = pa.table(
        {
            "event_type": pa.array(["click", "click", "view", "click"]),
            "ts": pa.array(
                [1_700_000_000_000_000, None, 1_700_000_100_000_000, None],
                type=pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    sf = str(tmp_path / "late_sf")
    import os

    os.makedirs(sf, exist_ok=True)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"))
    out = tumbling_window(sf)
    catch_all = out[out["window_start"] == -1]
    assert len(catch_all) == 1
    assert catch_all.iloc[0]["event_type"] == "click"
    assert catch_all.iloc[0]["n"] == 2
    assert catch_all.iloc[0]["sum_value"] == 6.0
    # the dated rows still aggregate normally
    assert (out["n"].sum()) == 4

    # the ORACLES agree with the null policy on null-bearing data too
    import duckdb

    from pyf_aggregator_ray.pipelines.relational import (
        RUNNING_TOTAL_SQL,
        SESSIONIZE_SQL,
        SLIDING_SQL,
        TUMBLING_SQL,
        sessionize,
        sliding_window,
        user_running_total,
    )

    full = pa.table(
        {
            "event_type": tbl["event_type"],
            "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
            "event_id": pa.array([10, 11, 12, 13], type=pa.int64()),
            "ts": tbl["ts"],
            "value": tbl["value"],
            "props": pa.array(
                ['{"k": 7}', '{"k": 8}', '{"k": 9}', '{"k": 10}']
            ),
        }
    )
    pq.write_table(full, os.path.join(sf, "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    got_t = tumbling_window(sf).sort_values(["event_type", "window_start"]).reset_index(drop=True)
    exp_t = con.execute(TUMBLING_SQL).fetchdf().reset_index(drop=True)
    assert got_t.equals(exp_t.astype(got_t.dtypes.to_dict()))
    got_r = (
        user_running_total(sf).to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    exp_r = con.execute(RUNNING_TOTAL_SQL).fetchdf().reset_index(drop=True)
    assert got_r.reset_index(drop=True).equals(exp_r.astype(got_r.dtypes.to_dict()))
    got_s = (
        sessionize(sf).to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    exp_s = con.execute(SESSIONIZE_SQL).fetchdf().reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    got_w = sliding_window(sf)
    exp_w = con.execute(SLIDING_SQL).fetchdf()
    assert len(got_w) == len(exp_w)
