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

# batch_size for the pre-shuffle tag passes: Ray bundles input blocks
# into tasks of at least this many rows, so a fragmented upstream (a
# union of many small reads can arrive as hundreds of tiny blocks)
# coalesces here instead of paying per-block task overhead through the
# whole shuffle.  Large blocks are unaffected (one task per block).
# 32k measured best on the headline pipeline: halving it to widen the
# combiner stage from 15 to 30 tasks LOST ~0.8s — the larger local
# combine ratio beats raw task width.
MIN_BUNDLE_ROWS = 32768


def bucket_ids(df: pd.DataFrame, keys: Sequence[str], num_buckets: int) -> pd.Series:
    """Deterministic (cross-process stable) bucket id per row."""
    h = pd.util.hash_pandas_object(
        df[list(keys)].astype(str), index=False)
    return (h % num_buckets).astype("int64")


def schema_pa_fields(ds: Dataset) -> dict:
    """Map a Dataset's schema (Arrow or pandas-block) to the explicit
    ``{name: pyarrow type}`` dict :func:`bucketed_join` needs, casting
    unknown/object columns to string."""
    import numpy as np
    import pyarrow as pa

    out: dict = {}
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            out[name] = pa.string() if pa.types.is_null(typ) else typ
            continue
        t = np.dtype(typ) if not isinstance(typ, np.dtype) else typ
        if t == np.bool_:
            out[name] = pa.bool_()
        elif np.issubdtype(t, np.integer):
            out[name] = pa.int64()
        elif np.issubdtype(t, np.floating):
            out[name] = pa.float64()
        else:
            out[name] = pa.string()
    return out


def bucketed_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    left_fields: dict,
    right_fields: dict,
    how: str = "inner",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> Dataset:
    """Distributed hash join built on the bucketed groupby shuffle.

    Exists because ``Dataset.join`` in Ray 2.49 crashes whenever a hash
    partition receives zero rows on either side: the join aggregator's
    ``ArrowBlockBuilder().build()`` emits a schema-less empty table and
    pyarrow's ``Table.join`` then fails with "No match ... for key field
    reference" (ray/data/_internal/execution/operators/join.py:102-127).
    Iterative graph loops over arbitrary graphs cannot guarantee
    non-empty partitions, so they join here instead: both sides are
    aligned to one explicit Arrow schema (missing columns = typed
    nulls), tagged, bucket-shuffled once on the key hash, and merged
    per bucket with a vectorized pandas merge.

    ``left_fields`` / ``right_fields`` map column name -> pyarrow type
    for each side; the join key ``on`` must appear in both with the
    same type.  ``how`` is ``inner`` or ``left`` (unmatched left rows
    keep typed-null right columns).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    all_fields = {**left_fields, **right_fields}
    lcols, rcols = list(left_fields), list(right_fields)

    def tagger(side: int, fields: dict):
        def f(t: "pa.Table") -> "pa.Table":
            cols = {}
            for name, typ in all_fields.items():
                if name in fields and name in t.column_names:
                    cols[name] = pc.cast(t[name], typ)
                else:
                    cols[name] = pa.nulls(t.num_rows, typ)
            key = pd.Series(cols[on].to_pandas()).astype(str)
            bucket = (pd.util.hash_pandas_object(key, index=False)
                      % num_buckets).astype("int64")
            cols["__side__"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            cols[BUCKET_COL] = pa.array(bucket.to_numpy())
            return pa.table(cols)
        return f

    tagged = left.map_batches(tagger(0, left_fields),
                              batch_format="pyarrow",
                              batch_size=MIN_BUNDLE_ROWS).union(
        right.map_batches(tagger(1, right_fields), batch_format="pyarrow",
                          batch_size=MIN_BUNDLE_ROWS))

    pd_how = {"inner": "inner", "left": "left"}[how]

    def restore(side_df: pd.DataFrame, fields: dict) -> pd.DataFrame:
        # The other side's rows carry typed nulls in this side's
        # columns, so Arrow->pandas promotes ints to float64 for the
        # whole bucket frame; cast this side's own (non-null) values
        # back so keys hash/merge consistently downstream.
        for c, typ in fields.items():
            if (pa.types.is_integer(typ)
                    and side_df[c].dtype != typ.to_pandas_dtype()
                    and side_df[c].notna().all()):
                side_df[c] = side_df[c].astype(typ.to_pandas_dtype())
        return side_df

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lhs = restore(df.loc[df["__side__"] == 0, lcols].copy(), left_fields)
        rhs = restore(df.loc[df["__side__"] == 1, rcols].copy(), right_fields)
        return lhs.merge(rhs, on=on, how=pd_how)

    return (tagged.groupby(BUCKET_COL)
            .map_groups(lambda df: merge(df.drop(columns=[BUCKET_COL])),
                        batch_format="pandas"))


def bucketed_semi_anti(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    left_fields: dict,
    anti: bool = False,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> Dataset:
    """Distributed semi (``anti=False``) / anti (``anti=True``) join on
    the bucketed shuffle: keep left rows whose ``on`` value does (not)
    appear anywhere in ``right``.  Same motivation as
    :func:`bucketed_join` — ``Dataset.join``'s left_semi/left_anti modes
    crash whenever a hash partition receives zero rows on either side,
    which a small input against a large filter set produces routinely.
    ``right`` needs only the ``on`` column (other columns are ignored);
    duplicate right keys are fine (per-bucket set semantics).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    key_type = left_fields[on]
    lcols = list(left_fields)

    def tagger(side: int):
        def f(t: "pa.Table") -> "pa.Table":
            cols = {}
            for name, typ in left_fields.items():
                if side == 0 and name in t.column_names:
                    cols[name] = pc.cast(t[name], typ)
                elif side == 1 and name == on:
                    cols[name] = pc.cast(t[on], typ)
                else:
                    cols[name] = pa.nulls(t.num_rows, typ)
            key = pd.Series(cols[on].to_pandas()).astype(str)
            bucket = (pd.util.hash_pandas_object(key, index=False)
                      % num_buckets).astype("int64")
            cols["__side__"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            cols[BUCKET_COL] = pa.array(bucket.to_numpy())
            return pa.table(cols)
        return f

    tagged = left.map_batches(tagger(0), batch_format="pyarrow",
                              batch_size=MIN_BUNDLE_ROWS).union(
        right.map_batches(tagger(1), batch_format="pyarrow",
                          batch_size=MIN_BUNDLE_ROWS))
    _ = key_type  # key column already cast side-consistently above

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df.loc[df["__side__"] == 0, lcols]
        rkeys = df.loc[df["__side__"] == 1, on].unique()
        mask = lhs[on].isin(rkeys)
        if anti:
            mask = ~mask
        return lhs[mask]

    return (tagged.groupby(BUCKET_COL)
            .map_groups(lambda df: merge(df.drop(columns=[BUCKET_COL])),
                        batch_format="pandas"))


def bucketed_group_apply(
    ds: Dataset,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    arrow_tag: bool = False,
) -> Dataset:
    """Hash-partition on ``keys`` and run ``fn`` once per bucket.

    ``fn`` receives a DataFrame holding EVERY row of the keys that fall
    in its bucket (and nothing else) and must itself group on ``keys``
    (pandas groupby / drop_duplicates / merge) — that inner grouping is
    the vectorized replacement for per-key UDF dispatch.

    ``arrow_tag=True`` appends the bucket column to zero-copy Arrow
    blocks (only the key columns are converted for hashing), so blocks
    stay Arrow through the all-to-all — cheaper to serialize than
    object-dtype pandas at scale.  Leave it off for inputs whose cells
    don't survive a pandas->Arrow round-trip (ndarray cells become
    tensor-extension columns).
    """
    keys = list(keys)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=[BUCKET_COL]))

    if arrow_tag:
        import pyarrow as pa

        def tag_a(t: "pa.Table") -> "pa.Table":
            kdf = t.select(keys).to_pandas().astype(str)
            h = pd.util.hash_pandas_object(kdf, index=False)
            bucket = (h.to_numpy() % num_buckets).astype("int64")
            return t.append_column(BUCKET_COL, pa.array(bucket))

        tagged = ds.map_batches(tag_a, batch_format="pyarrow",
                                batch_size=MIN_BUNDLE_ROWS)
    else:
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[BUCKET_COL] = bucket_ids(df, keys, num_buckets)
            return df

        tagged = ds.map_batches(tag, batch_format="pandas",
                                batch_size=MIN_BUNDLE_ROWS)

    return (tagged.groupby(BUCKET_COL)
            .map_groups(apply, batch_format="pandas"))
