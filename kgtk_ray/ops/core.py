"""Row-wise (embarrassingly parallel) KGTK operators.

Every function is ``Dataset -> Dataset`` and runs as a vectorized
``map_batches`` over Arrow or pandas batches — no Python loop touches
individual rows on the hot path.  Semantics mirror the reference CLI
commands cited per function; implementation is Ray-Data-first.
"""
from __future__ import annotations

from typing import Iterable, Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..format import (
    expand_column_ranges,
    resolve_column_aliases,
    split_list,
)

Dataset = ray.data.Dataset


def _as_set(v) -> set[str] | None:
    if v is None:
        return None
    if isinstance(v, str):
        return set(v.split(","))
    return set(v)


def kgtk_filter(
    ds: Dataset,
    *,
    subj: Iterable[str] | str | None = None,
    pred: Iterable[str] | str | None = None,
    obj: Iterable[str] | str | None = None,
    invert: bool = False,
    or_mode: bool = False,
    subj_col: str = "node1",
    pred_col: str = "label",
    obj_col: str = "node2",
) -> Dataset:
    """Keep rows where node1∈subj ∧ label∈pred ∧ node2∈obj (``--or`` makes
    it a disjunction; ``--invert`` complements).  Reference semantics:
    kgtk/cli/filter.py:124-330 (pattern ``subj;pred;obj`` with comma
    sets).  Vectorized with pyarrow.compute.is_in per batch."""
    s, p, o = _as_set(subj), _as_set(pred), _as_set(obj)

    def f(t: pa.Table) -> pa.Table:
        masks = []
        for col, vals in ((subj_col, s), (pred_col, p), (obj_col, o)):
            if vals is not None:
                masks.append(pc.is_in(pc.cast(t[col], pa.string()),
                                      value_set=pa.array(sorted(vals), pa.string())))
        if not masks:
            mask = pa.array(np.ones(t.num_rows, dtype=bool))
        else:
            mask = masks[0]
            for m in masks[1:]:
                mask = pc.or_(mask, m) if or_mode else pc.and_(mask, m)
        if invert:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def _empty_mask(t: pa.Table, columns: Sequence[str]) -> pa.ChunkedArray:
    masks = [pc.or_kleene(pc.is_null(t[c]),
                          pc.equal(pc.cast(t[c], pa.string()), ""))
             for c in columns]
    out = masks[0]
    for m in masks[1:]:
        out = pc.and_kleene(out, m)
    return pc.fill_null(out, True)


def ifempty(ds: Dataset, columns: Sequence[str], *, all_are: bool = False) -> Dataset:
    """Keep rows where any (default, matching the reference's
    ``--all=False``) or all (``all_are=True``) of ``columns`` are
    empty/null.  Reference: kgtk/iff/kgtkifempty.py,
    kgtk/cli/ifempty.py:43-45."""
    def f(t: pa.Table) -> pa.Table:
        per = [pc.fill_null(pc.or_kleene(pc.is_null(t[c]),
                                         pc.equal(pc.cast(t[c], pa.string()), "")), True)
               for c in columns]
        mask = per[0]
        for m in per[1:]:
            mask = pc.and_(mask, m) if all_are else pc.or_(mask, m)
        return t.filter(mask)
    return ds.map_batches(f, batch_format="pyarrow")


def ifnotempty(ds: Dataset, columns: Sequence[str], *, all_are: bool = False) -> Dataset:
    """Keep rows where any (default, matching the reference's
    ``--all=False``) or all of ``columns`` are non-empty.
    Reference: kgtk/cli/ifnotempty.py:43-54."""
    def f(t: pa.Table) -> pa.Table:
        per = [pc.fill_null(pc.and_kleene(pc.is_valid(t[c]),
                                          pc.not_equal(pc.cast(t[c], pa.string()), "")),
                            False)
               for c in columns]
        mask = per[0]
        for m in per[1:]:
            mask = pc.and_(mask, m) if all_are else pc.or_(mask, m)
        return t.filter(mask)
    return ds.map_batches(f, batch_format="pyarrow")


def calc_percentage(ds: Dataset, value_col: str, total_col: str,
                    into: str = "result", fmt: str = "%5.2f") -> Dataset:
    """The reference's ``calc --do percentage`` (kgtk/cli/calc.py:244-249):
    into = 100 * value / total, formatted with ``fmt``."""
    def f(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        tot = pc.cast(t[total_col], pa.float64())
        pct = pc.multiply(pc.divide(v, tot), pa.scalar(100.0))
        null_mask = np.asarray(pc.is_null(pct))
        vals = np.asarray(pct.combine_chunks().fill_null(0.0))
        formatted_np = np.char.mod(fmt, vals)  # vectorized printf at C speed
        if null_mask.any():
            formatted_np = np.where(null_mask, "", formatted_np)
        return t.append_column(into, pa.array(formatted_np.tolist(), pa.string()))
    return ds.map_batches(f, batch_format="pyarrow")


def expand_lists(ds: Dataset, columns: Sequence[str] | None = None, *,
                 key_columns: Sequence[str] | None = None) -> Dataset:
    """Expand ``|``-separated list cells into multiple rows, key columns
    repeated (reference kgtk/reshape/kgtkexpand.py:121-139).  Expansion
    is POSITIONAL across columns, exactly as the reference's row loop:
    output row j takes item j from every expanded column's list, with
    empty once a list is exhausted — NOT a cross-product (a row with
    ``home|cabin`` and ``5|6`` yields (home,5),(cabin,6)).

    ``columns`` names the columns to expand directly (library
    convenience; every other column is a key).  ``key_columns`` is the
    reference's convention (kgtk/cli/expand.py:34-36): the named columns
    are HELD FIXED and every other column expands.  The required columns
    — (node1, label, node2) for an edge file, (id) for a node file — are
    ALWAYS keys in that mode, silently unioned with ``key_columns``
    exactly as kgtkexpand.py:56-77 appends them before the user's list,
    so ``key_columns=[]`` equals the no-argument default."""
    names = ds.schema().names
    if columns is not None:
        if key_columns is not None:
            raise ValueError("pass either columns or key_columns, not both")
        cols = list(columns)
    else:
        keys = ({"node1", "label", "node2"} if "node1" in names
                else {"id"} if "id" in names else set())
        for c in key_columns or ():
            if c not in names:
                raise ValueError(f"Column {c} is not in the input file")
            keys.add(c)
        cols = [c for c in names if c not in keys]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or not cols:
            return df
        lists = {c: [split_list(v) if v else [""]
                     for v in df[c].fillna("").astype(str)] for c in cols}
        counts = np.maximum.reduce(
            [np.fromiter((len(lc) for lc in lists[c]), np.int64, len(df))
             for c in cols])
        idx = np.repeat(np.arange(len(df)), counts)
        pos = np.concatenate([np.arange(k) for k in counts])
        out = df.iloc[idx].reset_index(drop=True)
        for c in cols:
            lc = lists[c]
            out[c] = [lc[i][p] if p < len(lc[i]) else ""
                      for i, p in zip(idx, pos)]
        return out

    return ds.map_batches(f, batch_format="pandas")


def normalize_nodes(ds: Dataset, *, id_col: str = "id",
                    labels: Mapping[str, str] | None = None) -> Dataset:
    """Node file -> edge file: one edge ``(id, column, value)`` per
    non-empty non-id cell (reference kgtk/cli/normalize_nodes.py).
    ``labels`` optionally renames column names to edge labels."""
    labels = dict(labels or {})

    def f(df: pd.DataFrame) -> pd.DataFrame:
        value_cols = [c for c in df.columns if c != id_col]
        out = df.melt(id_vars=[id_col], value_vars=value_cols,
                      var_name="label", value_name="node2")
        out = out.rename(columns={id_col: "node1"})
        if labels:
            # dict-map + fillna: C-level hash lookups, no per-row lambda,
            # and two columns may legally share one output label.
            lab = out["label"]
            out["label"] = lab.map(labels).fillna(lab)
        out = out[out["node2"].notna() & (out["node2"].astype(str) != "")]
        return out[["node1", "label", "node2"]].astype(str)

    return ds.map_batches(f, batch_format="pandas")


def lower_labels(ds: Dataset, *, suffix: str = ";label") -> tuple[Dataset, Dataset]:
    """Inverse of lift (reference kgtk/cli/lower.py): strip ``X;label``
    columns from the edge file and emit their contents as a separate
    label-edge dataset ``(node1=value-of-X, label='label', node2=the label)``.

    Returns (edges_without_label_columns, label_edges)."""
    schema_cols = ds.schema().names
    lifted = [c for c in schema_cols if c.endswith(suffix)]
    base_of = {c: c[: -len(suffix)] for c in lifted}

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns(lifted)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in lifted:
            base = base_of[c]
            sub = df[[base, c]].rename(columns={base: "node1", c: "node2"})
            sub = sub[sub["node2"].notna() & (sub["node2"].astype(str) != "")]
            sub = sub.assign(label="label")
            # a lifted cell may hold a | list of labels
            sub = sub.assign(node2=sub["node2"].map(split_list)).explode("node2")
            frames.append(sub[["node1", "label", "node2"]])
        if not frames:
            return pd.DataFrame({"node1": [], "label": [], "node2": []}, dtype=str)
        out = pd.concat(frames, ignore_index=True).drop_duplicates()
        return out.astype(str)

    return ds.map_batches(strip, batch_format="pyarrow"), ds.map_batches(
        emit, batch_format="pandas")


def add_id(ds: Dataset, *, style: str = "node1-label-node2",
           id_col: str = "id", overwrite: bool = True,
           id_prefix: str = "E", initial_id: int = 1,
           id_prefix_num_width: int = 1) -> Dataset:
    """Assign edge IDs (reference kgtk/reshape/kgtkidbuilder.py:20-34).

    Content-derived styles (``node1-label-node2``, ``node1-label-node2-id``,
    ``wikidata`` hash) are embarrassingly parallel ``map_batches``.
    Sequence styles (``node1-label-num``, ``node1-label-node2-num``) need a
    deterministic per-key ordering: implemented as a
    ``groupby(key).map_groups`` assigning ranks after sorting the group on
    the remaining columns — deterministic under Ray's unordered blocks
    (the reference numbers by input file order instead; KGTK row order is
    not semantic, docs/specification.md:24)."""
    if style in ("node1-label-node2", "node1-label-node2-id", "empty", "wikidata"):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if style == "empty":
                new = pd.Series([""] * len(df))
            else:
                base = (df["node1"].astype(str) + "-" + df["label"].astype(str)
                        + "-" + df["node2"].astype(str))
                if style == "node1-label-node2-id":
                    old = (df[id_col].fillna("").astype(str)
                           if id_col in df.columns else pd.Series([""] * len(df)))
                    new = base + "-" + old.values
                elif style == "wikidata":
                    # content digest "E" + 16 hex chars.  Our extension
                    # (the reference's style list has no digest style,
                    # kgtk/reshape/kgtkidbuilder.py:20-34); the digest
                    # is a vectorized 64-bit siphash of the content
                    # triple — deterministic across runs / block
                    # layouts, no per-row hashlib calls.
                    h = pd.util.hash_array(base.to_numpy(dtype=object))
                    new = pd.Series(np.char.mod("E%016x", h),
                                    index=base.index)
                else:
                    new = base
            if id_col in df.columns:
                if overwrite:
                    df[id_col] = new.values
                else:
                    empty = df[id_col].isna() | (df[id_col].astype(str) == "")
                    df.loc[empty, id_col] = new[empty.values].values
            else:
                df.insert(0, id_col, new.values)
            return df
        return ds.map_batches(f, batch_format="pandas")

    if style in ("node1-label-num", "node1-label-node2-num"):
        keys = ["node1", "label"] if style == "node1-label-num" else [
            "node1", "label", "node2"]

        def g(df: pd.DataFrame) -> pd.DataFrame:
            # vectorized per-bucket ranking: sort by (keys, rest) and use
            # groupby-cumcount for the within-key sequence number —
            # deterministic regardless of block order.
            rest = [c for c in df.columns if c not in keys]
            df = (df.sort_values(keys + rest, kind="mergesort")
                  .reset_index(drop=True))
            rank = df.groupby(keys, sort=False).cumcount()
            prefix = df[keys[0]].astype(str)
            for k in keys[1:]:
                prefix = prefix + "-" + df[k].astype(str)
            new = prefix + "-" + rank.astype(str).str.zfill(4)
            if id_col in df.columns:
                df[id_col] = new.values
            else:
                df.insert(0, id_col, new.values)
            return df

        from ._bucket import bucketed_group_apply
        return bucketed_group_apply(ds, keys, g)

    if style == "prefix###":
        # Reference: id = prefix + zero-padded global sequence starting
        # at initial_id (kgtk/reshape/kgtkidbuilder.py:25,38-40,408-409)
        # in input-row order.  A global sequence is inherently
        # single-stream; for determinism we assign it in sorted row
        # order via one constant-key grouped rank — the same
        # scalability class as the reference's running counter, so use
        # content-derived styles on the 100 TB path.
        def h(df: pd.DataFrame) -> pd.DataFrame:
            cols = [c for c in df.columns if c != id_col]
            df = (df.sort_values(cols, kind="mergesort")
                  .reset_index(drop=True))
            if id_col in df.columns:
                if overwrite:
                    empty = pd.Series(True, index=df.index)
                else:
                    # reference KgtkIdBuilder keeps non-empty existing
                    # ids and only numbers the blanks
                    empty = df[id_col].isna() | (df[id_col].astype(str) == "")
                seq = (pd.Series(np.arange(int(empty.sum())) + initial_id)
                       .astype(str).str.zfill(id_prefix_num_width))
                df.loc[empty, id_col] = (id_prefix + seq).values
            else:
                seq = (pd.RangeIndex(len(df)) + initial_id).astype(str)
                new = id_prefix + pd.Series(seq).str.zfill(id_prefix_num_width)
                df.insert(0, id_col, new.values)
            return df

        from ._bucket import bucketed_group_apply
        return bucketed_group_apply(
            ds.map_batches(lambda df: df.assign(__one__=0),
                           batch_format="pandas"),
            ["__one__"],
            lambda df: h(df.drop(columns="__one__")),
            num_buckets=1)

    raise ValueError(f"unknown id style: {style}")


def remove_columns(ds: Dataset, columns: Sequence[str]) -> Dataset:
    """Reference kgtk/cli/remove_columns.py."""
    keep = [c for c in ds.schema().names if c not in set(columns)]
    return ds.select_columns(keep)


def rename_columns(ds: Dataset, mapping: Mapping[str, str]) -> Dataset:
    """Reference kgtk/cli/rename_columns.py.  Renames inside an Arrow
    batch fn (Ray's ``Dataset.rename_columns`` chokes on pandas blocks)."""
    m = dict(mapping)

    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([m.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def reorder_columns(ds: Dataset, order: Sequence[str], *,
                    trim: bool = False) -> Dataset:
    """Reference kgtk/cli/reorder_columns.py: ``a .. b`` expands to the
    inclusive column run between a and b; a standalone ``...`` places
    ALL unmentioned columns at that position (at most once,
    reorder_columns.py:131-146).  Without ``...``, unmentioned columns
    are an error (reorder_columns.py:193-196) unless ``trim`` drops
    them (the reference's ``--trim`` / omit_remaining_columns)."""
    cols = ds.schema().names
    order = list(order)
    if order.count("...") > 1:
        raise ValueError("'...' may appear only once")
    if "..." in order:
        i = order.index("...")
        head = expand_column_ranges(order[:i], cols)
        tail = expand_column_ranges(order[i + 1:], cols)
        named = set(head) | set(tail)
        expanded = head + [c for c in cols if c not in named] + tail
    else:
        expanded = list(expand_column_ranges(order, cols))
        remaining = [c for c in cols if c not in expanded]
        if remaining and not trim:
            raise ValueError(
                "No ellipses, and the following columns not accounted "
                f"for: {' '.join(remaining)}")
    return ds.select_columns(expanded)


def cat(*datasets: Dataset, fill: str = "") -> Dataset:
    """Concatenate edge files with alias-aware column merge (reference
    kgtk/join/kgtkcat.py + kgtk/join/kgtkmergecolumns.py:37-84): each
    input is renamed to canonical column names, missing columns are
    filled with "" and the result is the union."""
    merged: list[str] = []
    normed: list[tuple[Dataset, dict, list[str]]] = []
    for d in datasets:
        cols = d.schema().names
        renames = resolve_column_aliases(cols)
        cols = [renames.get(c, c) for c in cols]
        for c in cols:
            if c not in merged:
                merged.append(c)
        normed.append((d, renames, cols))

    out: list[Dataset] = []
    for d, renames, cols in normed:
        missing = [c for c in merged if c not in cols]

        def align(t: pa.Table, _renames=dict(renames), _missing=tuple(missing),
                  _order=tuple(merged)) -> pa.Table:
            if _renames:
                t = t.rename_columns([_renames.get(c, c) for c in t.column_names])
            for c in _missing:
                t = t.append_column(c, pa.array([fill] * t.num_rows, pa.string()))
            return t.select(list(_order))

        out.append(d.map_batches(align, batch_format="pyarrow"))
    first = out[0]
    return first.union(*out[1:]) if len(out) > 1 else first
