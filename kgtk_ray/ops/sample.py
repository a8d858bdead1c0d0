"""Sampling operators — the reference's reader sampling knobs
(`initial_skip_count`, `every_nth_record`, `record_limit`, `tail_count`,
/root/reference/kgtk/io/kgtkreader.py:83-86, applied :832-877) re-expressed
for a distributed setting.

The reference's variants are positional (line numbers in one file).  At
100 TB "the 17th record" is meaningless — block order is
non-deterministic — so the deterministic variants here key on a column
(hash-based systematic sampling), which is also what makes re-runs
reproducible.  Positional limit/tail are provided for parity and use
Dataset.limit / sort+limit.
"""
from __future__ import annotations

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def every_nth(ds: Dataset, n: int, *, key: str) -> Dataset:
    """Deterministic systematic sample: keep rows where
    ``hash(key) % n == 0``.  For integer-like keys the value itself is
    used (transparent, SQL-checkable); otherwise a stable string hash."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key]
        try:
            idx = pd.to_numeric(k, errors="raise").astype("int64")
        except (ValueError, TypeError):
            # stable (non-salted) string hash: sum of bytes * 31^i mod 2^31
            idx = k.astype(str).map(
                lambda s: sum(b * pow(31, i, 2**31) for i, b in
                              enumerate(s.encode())) % (2**31))
        return df[(idx % n) == 0]

    return ds.map_batches(f, batch_format="pandas")


def record_limit(ds: Dataset, limit: int) -> Dataset:
    """First ``limit`` rows in block order (reference record_limit)."""
    return ds.limit(limit)


def tail(ds: Dataset, count: int, *, key: str) -> Dataset:
    """Last ``count`` rows by ``key`` order (reference tail_count is
    positional; here order is made explicit by the sort key)."""
    return ds.sort(key, descending=True).limit(count)


def initial_skip(ds: Dataset, count: int, *, key: str) -> Dataset:
    """Skip the first ``count`` rows by ``key`` order."""
    import ray

    head = ds.sort(key).limit(count).select_columns([key])
    skip = set(head.to_pandas()[key])
    ref = ray.put(skip)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return df[~df[key].isin(s)]

    return ds.map_batches(f, batch_format="pandas")
