"""Grouped corpus profiling: count / sum / mean / min / max / exact
discrete quantiles of a numeric column per group, in two bounded
shuffle phases.

Corpus analysis ("what does the length distribution per source look
like?") is the first step of every training-data curation run.  Exact
quantiles normally need a sort; for discrete-valued columns (lengths,
token counts, scores quantized at write time) the value histogram is
tiny compared to the data, so the op reduces to:

1. a two-phase grouped count on ``(group, value)``
   (:func:`kgtk_ray.ops.agg.grouped_aggregate` — per-batch combiner,
   one bucketed shuffle of histogram rows, never raw rows);
2. one bucketed pass per group over its histogram: cumulative counts
   give every order statistic exactly.

The shuffled state is bounded by ``#groups x #distinct values``
— independent of row count, so the op holds at 100 TB.  For
continuous float columns, quantize first (e.g. ``round(x, 3)``) or the
histogram degenerates to the row count.

Quantile definition matches SQL ``quantile_disc``: the value whose
1-based rank in the sorted multiset is ``ceil(q * n)``.
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import ray.data

from ._bucket import bucketed_group_apply
from .agg import grouped_aggregate

Dataset = ray.data.Dataset


def grouped_profile(ds: Dataset, *, group_col: str, value_col: str,
                    quantiles: Sequence[float] = (0.5, 0.9),
                    num_buckets: int = 16) -> Dataset:
    """Profile ``value_col`` per ``group_col``.

    Returns one row per group: ``(group_col, n, total, mean, vmin,
    vmax, p<q1>, p<q2>, ...)`` where quantile columns are named
    ``p50``, ``p90``, ... from the requested fractions.
    """
    qnames = [f"p{round(q * 100):d}" for q in quantiles]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"quantile fractions collide after naming: {qnames}")

    hist = grouped_aggregate(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col], {"cnt": (None, "count")},
        num_buckets=num_buckets)

    out_cols = [group_col, "n", "total", "mean", "vmin", "vmax", *qnames]

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        int_values = pd.api.types.is_integer_dtype(df[value_col])
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="mergesort")
            v = sub[value_col].to_numpy()
            c = sub["cnt"].to_numpy()
            n = int(c.sum())
            # Truncating to int is only lossless for integer value
            # columns; quantized floats (round(x, 3) per the module
            # docstring) must keep the exact float sum.
            total = float((v * c).sum())
            if int_values:
                total = int(total)
            cum = np.cumsum(c)
            row = {group_col: g, "n": n, "total": total,
                   "mean": total / n, "vmin": v[0], "vmax": v[-1]}
            for q, name in zip(quantiles, qnames):
                rank = max(1, math.ceil(q * n))
                row[name] = v[int(np.searchsorted(cum, rank))]
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    return bucketed_group_apply(hist, [group_col], per_group,
                                num_buckets=num_buckets)
