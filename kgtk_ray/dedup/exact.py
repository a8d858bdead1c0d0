"""Exact document deduplication.

Two-phase hash dedup: a vectorized content-hash column is added per
batch, local duplicates are dropped in the same pass (combiner), then a
``groupby(hash).map_groups(first)`` settles cross-block duplicates.
The winner is deterministic: the row with the minimum ``id_col``.

At 100 TB the hash column keeps the shuffle payload to (hash, id)
width when ``keep_columns`` is trimmed before the exchange.
"""
from __future__ import annotations

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def _hash_col(df: pd.DataFrame, text_col: str) -> pd.Series:
    return pd.util.hash_array(
        df[text_col].astype(str).to_numpy(dtype=object)).astype("uint64")


def dedup_exact(ds: Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """Keep one row (minimum ``id_col``) per distinct ``text_col`` value."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h__"] = _hash_col(df, text_col)
        return df.sort_values(id_col, kind="mergesort").drop_duplicates("__h__")

    def first(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per bucket: min-id row per hash
        return (df.sort_values(id_col, kind="mergesort")
                .drop_duplicates("__h__", keep="first"))

    from ..ops._bucket import bucketed_group_apply
    out = bucketed_group_apply(
        ds.map_batches(local, batch_format="pandas"), ["__h__"], first,
        arrow_tag=True)
    return out.drop_columns(["__h__"])
