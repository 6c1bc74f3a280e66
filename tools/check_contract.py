#!/usr/bin/env python
"""Driver-contract simulator: runs every queries() entry against its
oracle_sql() via DuckDB (sorted-column, value-level compare), mirroring
what the graft driver does at sf0.01.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import importlib.util
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf)
            res = res.to_pandas() if hasattr(res, "to_pandas") else res
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ENGINE ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(res)} rows)")
            continue
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        cols = sorted(res.columns)
        ok = cols == sorted(o.columns) and len(res) == len(o)
        if not ok:
            print(
                f"{name}: SHAPE MISMATCH engine {len(res)}x{sorted(res.columns)} "
                f"vs oracle {len(o)}x{sorted(o.columns)}"
            )
            failures += 1
            continue
        r1 = res[cols].sort_values(cols).reset_index(drop=True)
        r2 = o[cols].sort_values(cols).reset_index(drop=True)
        bad_cols = []
        for c in cols:
            if pd.api.types.is_float_dtype(r1[c]) or pd.api.types.is_float_dtype(r2[c]):
                if not ((r1[c].astype(float) - r2[c].astype(float)).abs() < 1e-9).all():
                    bad_cols.append(c)
            elif not (r1[c].astype(str) == r2[c].astype(str)).all():
                bad_cols.append(c)
        if bad_cols:
            print(f"{name}: VALUE MISMATCH in {bad_cols} ({len(r1)} rows)")
            for c in bad_cols[:2]:
                diff = r1[r1[c].astype(str) != r2[c].astype(str)] if not pd.api.types.is_float_dtype(r1[c]) else r1[(r1[c]-r2[c]).abs()>=1e-9]
                print("  engine:", diff.head(3).to_dict("records"))
                print("  oracle:", r2.loc[diff.index[:3]].to_dict("records"))
            failures += 1
        else:
            print(f"{name}: MATCH ({len(r1)} rows)")
    print("FAILURES:", failures)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
