"""Windowed aggregates over event streams.

The reference has no streaming windows (SURVEY §2.11); these are the
training-pipeline extensions: tumbling-window aggregation expressed as
a vectorized bucket column + two-phase groupby (no per-row Python).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .agg import grouped_aggregate

Dataset = ray.data.Dataset


def tumbling_window(events: Dataset, *, ts_col: str = "ts", key_col: str = "user_id",
                    value_col: str = "value", window_s: int = 3600) -> Dataset:
    """Tumbling-window aggregate: floor the timestamp to the window,
    then a two-phase grouped aggregate on (key, window) — the partial
    collapses each batch before the shuffle, so a hot key never
    concentrates raw events on one reducer.

    Returns columns: ``<key_col>, window_start, n, total, vmin, vmax``.
    """
    def bucket(t: pa.Table) -> pa.Table:
        # zero-copy Arrow floor: no pandas conversion in the assignment
        w = pc.floor_temporal(t[ts_col], multiple=window_s, unit="second")
        return pa.table({key_col: t[key_col], "window_start": w,
                         value_col: t[value_col]})

    b = events.map_batches(bucket, batch_format="pyarrow")
    return grouped_aggregate(b, [key_col, "window_start"], {
        "n": (None, "count"),
        "total": (value_col, "sum"),
        "vmin": (value_col, "min"),
        "vmax": (value_col, "max"),
    })


def sliding_window(events: Dataset, *, ts_col: str = "ts",
                   key_col: str = "user_id", value_col: str = "value",
                   window_s: int = 3600, slide_s: int = 1800) -> Dataset:
    """Sliding (overlapping) window aggregate.  Windows start at every
    multiple of ``slide_s``; an event at ``ts`` belongs to each window
    whose start satisfies ``start <= ts < start + window_s`` — i.e.
    ``ceil(window_s / slide_s)`` windows, one fewer for events whose
    in-slide offset pushes the oldest candidate window out of range
    when ``slide_s`` does not divide ``window_s``.  Vectorized: the
    batch is replicated once per overlap position with shifted window
    starts (no per-row Python); only the oldest replica can overshoot
    and only in the non-divisor case, so only it is mask-filtered.
    Then the same two-phase grouped aggregate as tumbling.

    Returns columns: ``<key_col>, window_start, n, total, vmin, vmax``.
    """
    if slide_s <= 0 or window_s <= 0:
        raise ValueError("window_s and slide_s must be positive")
    k = -(-window_s // slide_s)  # ceil

    def assign(t: pa.Table) -> pa.Table:
        # candidate starts: floor(ts/slide) - j*slide for j in 0..k-1
        base = pc.floor_temporal(t[ts_col], multiple=slide_s, unit="second")
        tables = []
        for j in range(k):
            start = pc.subtract(
                base, pa.scalar(pd.Timedelta(seconds=j * slide_s)))
            sub = pa.table({key_col: t[key_col], "window_start": start,
                            value_col: t[value_col]})
            if j == k - 1 and window_s % slide_s:
                # oldest replica: keep only ts < start + window_s
                keep = pc.less(pc.subtract(t[ts_col], start),
                               pa.scalar(pd.Timedelta(seconds=window_s)))
                sub = sub.filter(keep)
            tables.append(sub)
        return pa.concat_tables(tables)

    b = events.map_batches(assign, batch_format="pyarrow")
    return grouped_aggregate(b, [key_col, "window_start"], {
        "n": (None, "count"),
        "total": (value_col, "sum"),
        "vmin": (value_col, "min"),
        "vmax": (value_col, "max"),
    })


def session_window(events: Dataset, *, ts_col: str = "ts", key_col: str = "user_id",
                   gap_s: int = 1800) -> Dataset:
    """Session windows: per key, sort by ts and split where the gap to the
    previous event exceeds ``gap_s``.  Implemented as
    ``groupby(key).map_groups`` with a vectorized cumsum over the sorted
    group (ordering assumption: all events of one key fit one group —
    they were hash-partitioned there by the shuffle).

    Returns one row per session: ``<key_col>, session_start, session_end,
    n_events``.
    """
    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL keys in the bucket: sort (key, ts), per-key
        # diff via groupby, session id = cumsum of gap breaks
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        gap = df.groupby(key_col, sort=False)[ts_col].diff().dt.total_seconds()
        brk = gap.isna() | (gap > gap_s)
        sid = brk.cumsum()  # strictly increasing across keys: safe global id
        agg = df.groupby([key_col, sid], sort=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        ).reset_index(level=0).reset_index(drop=True)
        return agg[[key_col, "session_start", "session_end", "n_events"]]

    from ._bucket import bucketed_group_apply
    return bucketed_group_apply(events, [key_col], sessions, num_buckets=32)
