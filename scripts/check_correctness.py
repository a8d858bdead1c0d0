"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf, run the matching oracle_sql() through
DuckDB on the same parquet views, compare row count + schema + an
order-insensitive value hash.  Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    import pyarrow as pa
    if isinstance(res, pa.Table):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> int:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    row_strs = df.apply(lambda r: "\x1f".join(r.values), axis=1)
    h = pd.util.hash_array(row_strs.to_numpy(dtype=object))
    return int(np.bitwise_xor.reduce(h)) if len(h) else 0


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:22s} ERROR running query: {exc}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(got):7d} rows   ({dt:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:22s} ERROR in oracle SQL: {exc}")
            failures.append(name)
            continue
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(f"{name:22s} {status}  rows {len(got)}/{len(want)} "
              f"schema={'ok' if ok_schema else sorted(got.columns)} "
              f"hash={'ok' if ok_hash else 'MISMATCH'}   ({dt:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if ok_schema and ok_rows:
                merged = got.merge(want, how="outer", indicator=True,
                                   on=list(sorted(set(got.columns)
                                                  & set(want.columns))))
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
