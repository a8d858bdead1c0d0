"""Two-phase grouped aggregation (partial/combiner + bucketed merge).

``Dataset.groupby(keys).aggregate(...)`` in Ray dispatches per distinct
key during the reduce, which dominates wall time once groups number in
the thousands (measured: 25s for a 100k-row / 95k-group window
aggregate at sf0.1 vs 1.5s for this implementation).  This helper runs
the classic combiner pattern instead:

  1. partial: a pandas ``groupby().agg`` INSIDE each ``map_batches``
     task collapses every batch to one row per (key, batch) — this is
     also the skew guard: a hot key leaves each batch as a single
     partial row, so the shuffle never concentrates raw rows;
  2. merge: one hash-bucketed shuffle
     (:func:`kgtk_ray.ops._bucket.bucketed_group_apply`) and a
     vectorized pandas merge per bucket at C speed.

Supported ops: sum, count, min, max, mean (mean decomposes into
sum+count partials and is finalized after the merge).
"""
from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd
import ray.data

from ._bucket import bucketed_group_apply

Dataset = ray.data.Dataset

_MERGE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str | None, str]],
    *,
    num_buckets: int = 32,
) -> Dataset:
    """Group ``ds`` on ``keys`` and aggregate per ``specs``.

    ``specs`` maps output column -> (input column, op) with op one of
    ``sum | count | min | max | mean`` (input column may be None for
    ``count``).  Output columns appear in spec order after the keys.
    """
    keys = list(keys)
    out_order = list(specs)

    # translate to partial specs: mean -> hidden sum + per-column
    # non-null count (NOT the row count: a group [1.0, NaN] must mean
    # to 1.0, matching SQL AVG / Ray's own Mean on null inputs)
    partial_aggs: dict[str, tuple[str, str]] = {}
    for out, (col, op) in specs.items():
        if op == "count":
            partial_aggs[out] = (col or keys[0], "size")
        elif op == "mean":
            partial_aggs["__sum_" + out] = (col, "sum")
            partial_aggs["__cnt_" + out] = (col, "count")
        elif op in ("sum", "min", "max"):
            partial_aggs[out] = (col, op)
        else:
            raise ValueError(f"unsupported op {op!r} for {out!r}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: Ray/SQL groupbys keep the null-key group
        return df.groupby(keys, as_index=False, sort=False,
                          dropna=False).agg(
            **{o: (c, a) for o, (c, a) in partial_aggs.items()})

    merge_aggs = {}
    for o, (_, a) in partial_aggs.items():
        merge_aggs[o] = (o, "sum" if a in ("size", "count") else _MERGE_OP.get(a, a))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False, sort=False, dropna=False).agg(
            **{o: spec for o, spec in merge_aggs.items()})
        for out, (col, op) in specs.items():
            if op == "mean":
                g[out] = g["__sum_" + out] / g["__cnt_" + out]
        drop = [c for c in g.columns if c.startswith("__")]
        return g.drop(columns=drop)[keys + out_order]

    from ._bucket import MIN_BUNDLE_ROWS
    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=MIN_BUNDLE_ROWS)
    return bucketed_group_apply(partials, keys, merge,
                                num_buckets=num_buckets, arrow_tag=True)
