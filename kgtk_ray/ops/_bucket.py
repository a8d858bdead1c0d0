"""Bucketed grouped-apply: the workhorse behind every fine-grained
grouped operator here.

``Dataset.groupby(keys).map_groups(fn)`` dispatches the UDF once per
DISTINCT KEY.  For operators whose keys are near-unique (dedup,
compact, per-entity merges) that is millions of Python calls per block
— the dispatch dominates the useful work.  Instead we hash the key
into a bounded number of buckets, shuffle once on the bucket id, and
call a VECTORIZED fn once per bucket; the fn does a pandas groupby
over the many keys inside its bucket at C speed.

All rows of a key always share a bucket, so any per-key-group
computation is preserved exactly.  ``num_buckets`` bounds both the
task count and the skew: with B buckets over a uniform key hash, each
bucket holds ~1/B of the data regardless of per-key skew (a hot key
concentrates in one bucket, which is why callers should pre-combine
hot keys in a map_batches pass first — see compact's phase 1).
"""
from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
import ray.data

Dataset = ray.data.Dataset

BUCKET_COL = "__bucket__"
DEFAULT_NUM_BUCKETS = 64


def bucket_ids(df: pd.DataFrame, keys: Sequence[str], num_buckets: int) -> pd.Series:
    """Deterministic (cross-process stable) bucket id per row."""
    h = pd.util.hash_pandas_object(
        df[list(keys)].astype(str), index=False)
    return (h % num_buckets).astype("int64")


def bucketed_group_apply(
    ds: Dataset,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> Dataset:
    """Hash-partition on ``keys`` and run ``fn`` once per bucket.

    ``fn`` receives a DataFrame holding EVERY row of the keys that fall
    in its bucket (and nothing else) and must itself group on ``keys``
    (pandas groupby / drop_duplicates / merge) — that inner grouping is
    the vectorized replacement for per-key UDF dispatch.
    """
    keys = list(keys)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[BUCKET_COL] = bucket_ids(df, keys, num_buckets)
        return df

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=[BUCKET_COL]))

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby(BUCKET_COL)
            .map_groups(apply, batch_format="pandas"))
