"""Wide (shuffle-backed) KGTK operators.

These are the all-to-all exchanges: grouped merges, semi/anti joins,
KGTK's key-set join, label lifting and distributed sort.  Scale notes
per operator:

* aggregations pre-combine inside ``map_batches`` before the global
  ``groupby`` (partial aggregation) so the shuffle moves one row per
  (key, batch) instead of one per input row;
* small lookup sides are broadcast once via ``ray.put`` and read inside
  the batch fn — never re-shipped per batch, never shuffled;
* large filter sides use Ray's hash-partitioned ``Dataset.join``
  (left_semi / left_anti);
* hot-key skew in the dedup groupby is absorbed by the partial
  aggregation (a head key collapses to ≤1 row per batch before the
  exchange).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..format import merge_lists_grouped

Dataset = ray.data.Dataset

# Above this many rows the broadcast fast path gives way to a
# hash-partitioned distributed join.  1M string keys ≈ 60-100 MB as a
# Python set — the most a worker should re-deserialize from plasma per
# task; bigger sides take the distributed join path.
BROADCAST_LIMIT = 1_000_000


def _default_edge_keys(columns: Sequence[str]) -> list[str]:
    if "node1" in columns:
        return [c for c in ("node1", "label", "node2") if c in columns]
    return ["id"]


def compact(
    ds: Dataset,
    key_columns: Sequence[str] | None = None,
    *,
    presorted: bool = False,
    compact_id: bool = False,
    _partial_only: bool = False,
) -> Dataset:
    """Group rows on key columns and merge every other column's values
    into sorted-unique ``|`` lists.

    Semantics follow the reference's compact (kgtk/reshape/kgtkcompact.py:
    77-168: expand lists, merge, re-join sorted-unique) — but where the
    reference needs presorted input or buffers the whole file in a dict
    (:317-338), this runs as a two-phase shuffle:

      1. partial: pandas groupby inside each batch merges local
         duplicates (combiner — this is also the skew guard: a hot
         (node1,label,node2) key leaves each batch as one row);
      2. global ``groupby(keys).map_groups`` applies the same
         associative merge to the partials.

    ``presorted`` is accepted for reference CLI compatibility
    (kgtk/reshape/kgtkcompact.py:287-313 streams adjacent key runs
    instead of buffering) but is an execution hint only: the bucketed
    shuffle handles sorted and unsorted input identically, and the
    OUTPUT row set is the same either way.  Output row ORDER is
    unspecified (KGTK rows are unordered, docs/specification.md:24) —
    the reference's presorted mode additionally preserves input order,
    which a distributed shuffle deliberately does not.

    Default keys match the reference (kgtkcompact.py:236-243): an edge
    file keys on (node1, label, node2) PLUS id when an id column is
    present and ``compact_id`` is False (``--compact-id`` merges ids
    into lists instead of keying on them); a node file keys on id.
    Unlike the reference CLI (whose --key-columns EXTENDS the default),
    an explicit ``key_columns`` here replaces it.
    """
    if key_columns:
        keys = list(key_columns)
    else:
        cols = ds.schema().names
        keys = _default_edge_keys(cols)
        if "node1" in cols and "id" in cols and not compact_id:
            keys.append("id")

    def merge_df(df: pd.DataFrame) -> pd.DataFrame:
        """Per-batch combiner.  Singleton keys skip the grouped merge;
        their cells are normalized (sorted-unique ``|`` lists) only when
        they actually contain a ``|`` — the rare case.

        Exact full-row duplicates collapse FIRST (the merge is a set
        union, so identical rows merge to themselves): repeated facts —
        the same sentence emitted twice by one page — are the common
        duplicate in a web corpus, and dropping them up front routes
        their keys through the cheap singleton path instead of the
        grouped merge (measured 86 -> ~10 ms per 20k-triple batch on
        the flagship corpus, where ALL phase-1 duplicates are exact)."""
        rest = [c for c in df.columns if c not in keys]
        if not rest:
            return df.drop_duplicates()
        df = df.drop_duplicates()
        dup = df.duplicated(keys, keep=False)
        uniq = df[~dup].copy()
        from ..format import merge_list_cells
        for c in rest:
            col = uniq[c]
            m = col.notna() & col.astype(str).str.contains("|", regex=False)
            if m.any():
                uniq.loc[m, c] = [merge_list_cells((v,)) for v in col[m]]
        dups = df[dup]
        if not len(dups):
            return uniq
        merged = merge_lists_grouped(dups, keys, rest)
        return pd.concat([uniq, merged], ignore_index=True)

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-bucket merge.  After phase 1 every surviving
        row is already cell-normalized, so keys unique within the bucket
        pass through untouched; only genuinely duplicated keys pay the
        grouped merge."""
        rest = [c for c in df.columns if c not in keys]
        if not rest:
            return df.drop_duplicates()
        # exact-row collapse first (set-union idempotence) — rows the
        # same key emitted identically from different batches skip the
        # grouped merge entirely
        df = df.drop_duplicates()
        dup = df.duplicated(keys, keep=False)
        uniq = df[~dup]
        dups = df[dup]
        if not len(dups):
            return uniq
        merged = merge_lists_grouped(dups, keys, rest)
        return pd.concat([uniq, merged], ignore_index=True)

    # phase 1: per-batch combiner (normalizes every cell and collapses
    # hot keys to <=1 row per batch — the skew guard, see
    # _compact_partial); phase 2: bucketed shuffle, one vectorized
    # merge per bucket instead of one UDF call per distinct
    # (node1,label,node2).
    from ._bucket import bucketed_group_apply
    partial = _compact_partial(ds, keys, merge_df)
    if _partial_only:
        return partial
    return bucketed_group_apply(partial, keys, merge_bucket,
                                arrow_tag=True)


def dedup_with_transforms(ds: Dataset, join_columns: Sequence[str],
                          transform_columns: Sequence[str] | None = None,
                          *, sep: str = ",") -> Dataset:
    """The cskg merge helper (reference kgtk/cskg_utils.py:17-30,
    ``deduplicate_with_transformations``): group on ``join_columns``
    and merge each transform column's values into a deduplicated
    ``sep``-joined list.  Where the reference's
    ``','.join(set(x.split(',')))`` emits values in arbitrary set
    order, this emits sorted-unique — the deterministic choice a
    distributed run needs for reproducible output.

    Same two-phase shape as :func:`compact` (the per-batch combiner is
    the skew guard; the merge is associative because re-splitting a
    joined list and re-deduplicating is idempotent).  Output columns:
    ``join_columns`` + transform columns, like the reference's
    ``groupby(...).agg(transformations)``."""
    keys = list(join_columns)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = list(transform_columns) if transform_columns else \
            [c for c in df.columns if c not in keys]
        out = df[keys].drop_duplicates().reset_index(drop=True)
        gkey = pd.MultiIndex.from_frame(out[keys])
        for c in cols:
            ex = df[c].fillna("").astype(str).str.split(sep).explode()
            sub = df[keys].reindex(ex.index)
            sub[c] = ex.to_numpy()
            sub = (sub.drop_duplicates()
                      .sort_values(keys + [c], kind="mergesort"))
            joined = sub.groupby(keys, sort=False)[c].agg(sep.join)
            out[c] = joined.reindex(gkey).to_numpy()
        return out

    from ._bucket import bucketed_group_apply
    partial = ds.map_batches(combine, batch_format="pandas")
    return bucketed_group_apply(partial, keys, combine)


def compact_sorted(ds: Dataset, key_columns: Sequence[str] | None = None,
                   *, compact_id: bool = False,
                   validate: bool = False) -> Dataset:
    """:func:`compact` with key-sorted output in ONE all-to-all instead
    of two (bucket exchange + separate sort).

    Phase 1 is the same per-batch combiner (skew guard).  Phase 2 is a
    global range-partition ``Dataset.sort`` on the key columns: Ray's
    sort assigns every row to a partition by a pure function of its key
    against the sampled boundaries, so ALL rows of a key land in one
    sorted block (ties cannot straddle a boundary — verified by the
    multi-block hot-key stress test).  A per-block order-preserving
    grouped merge (:func:`~kgtk_ray.format.merge_lists_grouped`, whose
    group ids follow first appearance = sorted order) then collapses
    each key run in place, leaving the output globally key-sorted.

    Use this whenever sorted compacted output is wanted (the
    reference's canonical ``compact | sort`` tail): it removes an
    entire exchange from the pipeline.  Plain :func:`compact` remains
    for unordered output (hash buckets shuffle less data per skewed
    key than range partitions when no sort is needed).

    ``validate=True`` appends a global key-uniqueness check (one extra
    count aggregate) that raises if any key run was split across two
    merge batches — the cheap guard on the one-block-per-sort-partition
    invariant below.  Tests run with it on; production pipelines leave
    it off."""
    if key_columns:
        keys = list(key_columns)
    else:
        cols = ds.schema().names
        keys = _default_edge_keys(cols)
        if "node1" in cols and "id" in cols and not compact_id:
            keys.append("id")

    partial = compact(ds, keys, _partial_only=True)
    ranged = partial.sort(keys)

    def merge_sorted(df: pd.DataFrame) -> pd.DataFrame:
        """Order-preserving per-block merge: singleton keys (already
        cell-normalized by phase 1) pass through; only duplicated key
        runs pay the grouped merge, whose group order (first
        appearance) equals sorted order, so the merged values align
        back onto the group-head rows in place."""
        rest = [c for c in df.columns if c not in keys]
        if not rest:
            return df.drop_duplicates()
        # exact-row collapse first (order-preserving: keeps each row's
        # first occurrence, so key runs stay contiguous and sorted);
        # keys reduced to one row pass straight through — phase 1
        # already normalized their cells
        df = df.drop_duplicates()
        dup = df.duplicated(keys, keep=False).to_numpy()
        if not dup.any():
            return df
        first = (~df.duplicated(keys)).to_numpy()
        base = df[first].copy()
        merged = merge_lists_grouped(df[dup], keys, rest)
        head_of_dup = dup[first]
        for c in rest:
            col = base[c].to_numpy(dtype=object, copy=True)
            col[head_of_dup] = merged[c].to_numpy()
            base[c] = col
        return base

    # batch_size=None pins the invariant merge_sorted relies on: each
    # sorted range partition arrives as exactly ONE batch (Ray's
    # documented whole-block batching; SortTaskSpec.reduce emits one
    # block per partition in Ray 2.49).  If a future Ray splits large
    # reduce outputs, a key run straddling two batches would emit
    # partially-merged duplicate key rows — the validate path below is
    # the detector for that regression.
    out = ranged.map_batches(merge_sorted, batch_format="pandas",
                             batch_size=None)
    if validate:
        dup = (out.groupby(keys).count()
                  .filter(lambda row: row["count()"] > 1))
        bad = dup.take(1)
        if bad:
            raise AssertionError(
                "compact_sorted invariant violated: key "
                f"{ {k: bad[0][k] for k in keys} } was emitted by more "
                "than one merge batch (a sorted range partition reached "
                "merge_sorted as multiple batches)")
    return out


def _compact_partial(ds: Dataset, keys: Sequence[str],
                     merge_df=None) -> Dataset:
    """compact's phase-1 combiner as a standalone stage (exposed for
    the skew-bound test): after this pass, a key occurs at most once
    PER BATCH, so the rows any phase-2 bucket receives for a hot key
    are bounded by the upstream batch count — per-bucket load stays
    ~rows/num_buckets no matter how skewed the key distribution is."""
    if merge_df is None:
        # rebuild the closure for standalone use
        return compact(ds, keys, _partial_only=True)
    return ds.map_batches(merge_df, batch_format="pandas")


def unique_counts(
    ds: Dataset,
    column: str,
    *,
    where_col: str | None = None,
    where_values: Sequence[str] | None = None,
    as_edges: bool = True,
    empty_value: str = "",
    prefix: str = "",
) -> Dataset:
    """Value counts for one column, emitted as KGTK edge rows
    ``(value, "count", n)`` (reference kgtk/join/unique.py:87-143, which
    holds the whole count dict in memory).  Empty cells are substituted
    with ``empty_value`` first and skipped if still empty (the
    reference's ``--empty`` knob, unique.py:96-103); ``prefix``
    prepends to every counted value.  Two-phase: per-batch
    ``value_counts`` then a small groupby-sum over the partials."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if where_col is not None:
            df = df[df[where_col].isin(set(where_values or []))]
        col = df[column]
        if col.dtype != object:  # already-string columns skip the copy
            col = col.astype(str)
        col = col.fillna("")
        if empty_value:
            col = col.replace("", empty_value)
        col = col[col != ""]
        if prefix:
            col = prefix + col
        vc = col.value_counts()
        return pd.DataFrame({"node1": vc.index, "n": vc.to_numpy()})

    partials = ds.map_batches(partial, batch_format="pandas")
    from .agg import grouped_aggregate

    counts = grouped_aggregate(partials, ["node1"], {"count": ("n", "sum")})

    if not as_edges:
        return counts

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "node1": pc.cast(t["node1"], pa.string()),
            "label": pa.array(["count"] * t.num_rows, pa.string()),
            "node2": pc.cast(t["count"], pa.string()),
        })

    return counts.map_batches(to_edges, batch_format="pyarrow")


def _key_expr_arrow(t: pa.Table, columns: Sequence[str]) -> pa.Array:
    """KGTK join key: the | -joined column values (reference
    kgtk/iff/kgtkifexists.py:117-127), rendered with Arrow cast
    semantics.  This is the ONLY key renderer — every side of every
    semi/anti/join comparison must come through here (a second
    renderer caused a silent empty-join on float/bool key columns:
    pandas astype(str) spells 1.0 as "1.0" and True as "True" where
    Arrow casts to "1"/"true")."""
    parts = [pc.fill_null(pc.cast(t[c], pa.string()), "") for c in columns]
    if len(parts) == 1:
        return parts[0].combine_chunks() if isinstance(
            parts[0], pa.ChunkedArray) else parts[0]
    return pc.binary_join_element_wise(*parts, "|")


def _iff_keys(input_cols: Sequence[str], filter_cols: Sequence[str],
              input_keys, filter_keys) -> tuple[list[str], list[str]]:
    """Default key resolution (kgtk/iff/kgtkifexists.py:73-115):
    edge×edge -> (node1,label,node2); node×node -> id; edge×node ->
    input.node1 = filter.id."""
    if input_keys and filter_keys:
        return list(input_keys), list(filter_keys)
    in_edge = "node1" in input_cols
    f_edge = "node1" in filter_cols
    if in_edge and f_edge:
        k = [c for c in ("node1", "label", "node2") if c in input_cols and c in filter_cols]
        return k, k
    if in_edge and not f_edge:
        return ["node1"], ["id"]
    if not in_edge and f_edge:
        return ["id"], ["node1"]
    return ["id"], ["id"]


def _semi_anti(ds: Dataset, filter_ds: Dataset, *, anti: bool,
               input_keys=None, filter_keys=None,
               preserve_order: bool = False) -> Dataset:
    if preserve_order:
        # reference --preserve-order (kgtk/iff/kgtkifexists.py:17-21,418):
        # surviving rows come out in input order.  Distributed
        # equivalent: attach a global row index (from block metadata —
        # NOT Dataset.zip, whose block pairing is nondeterministic; see
        # ops/_rowindex.py), filter, sort it back off — the sort is the
        # unavoidable price of a global order (opt-in; default output
        # is unordered per docs/specification.md:24).
        from ._rowindex import add_row_index
        out = _semi_anti(add_row_index(ds), filter_ds, anti=anti,
                         input_keys=input_keys, filter_keys=filter_keys)
        return out.sort("__order__").drop_columns(["__order__"])
    # schema() is None for an all-empty dataset (e.g. a drained BFS
    # frontier); explicit keys don't need it
    in_sch = ds.schema()
    f_sch = filter_ds.schema()
    ikeys, fkeys = _iff_keys(in_sch.names if in_sch else [],
                             f_sch.names if f_sch else [],
                             input_keys, filter_keys)
    n_filter = filter_ds.count()
    if n_filter == 0:
        # empty filter: semi keeps nothing, anti keeps everything (an
        # empty pandas-block Dataset loses its columns through
        # to_pandas(), so short-circuit before the key projection)
        if anti:
            return ds
        return ds.map_batches(lambda df: df.iloc[:0],
                              batch_format="pandas")
    if n_filter <= BROADCAST_LIMIT:
        # broadcast the filter-side keys once as an Arrow array; the
        # per-batch filter is a zero-copy pyarrow is_in (no pandas
        # conversion, no per-task Python-set rehydration cost).  BOTH
        # sides must render keys through the SAME cast: the per-batch
        # side uses _key_expr_arrow, so the filter side must too —
        # pandas astype(str) renders 1.0 as "1.0" and True as "True"
        # where Arrow renders "1"/"true", and a mixed rendering would
        # silently empty the semi-join on float/bool key columns.
        kdf = filter_ds.select_columns(list(dict.fromkeys(fkeys))).to_pandas()
        kt = pa.Table.from_pandas(kdf, preserve_index=False)
        keyset = pc.unique(_key_expr_arrow(kt, fkeys)).cast(pa.string())
        ref = ray.put(keyset)

        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            mask = pc.is_in(_key_expr_arrow(t, ikeys), value_set=ks)
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

        return ds.map_batches(f, batch_format="pyarrow")

    # large filter side: bucketed semi/anti join on a derived key col
    # (not Dataset.join, whose left_semi/left_anti crash whenever a hash
    # partition receives zero rows — routine for a small input against a
    # large filter set)
    from ._bucket import bucketed_semi_anti, schema_pa_fields

    # Arrow key rendering on both sides (same rationale as the
    # broadcast path above: one cast semantics for every comparison)
    def addkey_left(t: pa.Table) -> pa.Table:
        if "__key__" in t.column_names:
            t = t.drop_columns(["__key__"])
        k = _key_expr_arrow(t, ikeys)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return t.append_column("__key__", k.cast(pa.string()))

    def rightkeys(t: pa.Table) -> pa.Table:
        return pa.table({"__key__": pc.unique(
            _key_expr_arrow(t, fkeys)).cast(pa.string())})

    left = ds.map_batches(addkey_left, batch_format="pyarrow")
    right = filter_ds.map_batches(rightkeys, batch_format="pyarrow")
    left_fields = schema_pa_fields(ds)
    left_fields["__key__"] = pa.string()
    joined = bucketed_semi_anti(
        left, right, "__key__", left_fields=left_fields, anti=anti,
        num_buckets=max(16, min(256, n_filter // 1_000_000 + 16)))
    return joined.drop_columns(["__key__"])


def ifexists(ds: Dataset, filter_ds: Dataset, *, input_keys=None,
             filter_keys=None, preserve_order: bool = False) -> Dataset:
    """Semi-join: keep input rows whose key exists in the filter file
    (reference kgtk/iff/kgtkifexists.py, which caches the filter key set
    in one process's memory).

    ``preserve_order=True`` is the reference's ``--preserve-order``
    (kgtkifexists.py:17-21): surviving rows come out in input order,
    via a zipped global row index + final sort.  The default output is
    unordered (docs/specification.md:24): the broadcast path happens to
    preserve per-block order, the join path does not.
    """
    return _semi_anti(ds, filter_ds, anti=False, input_keys=input_keys,
                      filter_keys=filter_keys, preserve_order=preserve_order)


def ifnotexists(ds: Dataset, filter_ds: Dataset, *, input_keys=None,
                filter_keys=None, preserve_order: bool = False) -> Dataset:
    """Anti-join complement of :func:`ifexists`."""
    return _semi_anti(ds, filter_ds, anti=True, input_keys=input_keys,
                      filter_keys=filter_keys, preserve_order=preserve_order)


def kgtk_join(
    left: Dataset,
    right: Dataset,
    *,
    join_on: Sequence[str] | None = None,
    right_join_on: Sequence[str] | None = None,
    left_join: bool = False,
    right_join: bool = False,
    join_on_label: bool = False,
    join_on_node2: bool = False,
    left_prefix: str = "",
    right_prefix: str = "",
    broadcast_limit: int = BROADCAST_LIMIT,
) -> Dataset:
    """KGTK's join (kgtk/join/kgtkjoiner.py) — NOT a relational
    row-pairing join: compute a key set (inner = L∩R; ``left_join`` = all
    L keys; ``right_join`` = all R keys; both = union), then output the
    union of rows from BOTH files whose key is in the set, in the merged
    column layout (:180-217 key sets, :304-344 merged output).

    Scale paths: the key set is reduced distributedly as a dataset of
    distinct keys; below ``broadcast_limit`` keys it is broadcast once
    and applied as a vectorized ``isin`` filter (no input shuffle), above
    it each input is semi-joined against the key-set dataset with a
    hash-partitioned ``Dataset.join``.
    """
    lcols = left.schema().names
    rcols = right.schema().names
    lkeys = list(join_on) if join_on else _default_edge_keys(lcols)[:1]
    rkeys = list(right_join_on) if right_join_on else lkeys
    # --join-on-label / --join-on-node2 (kgtk/cli/join.py:56-61) widen
    # the default node1 key
    for flag, col in ((join_on_label, "label"), (join_on_node2, "node2")):
        if flag:
            if col not in lkeys:
                lkeys.append(col)
            if col not in rkeys:
                rkeys.append(col)
    # --left-prefix / --right-prefix rename NON-required columns in the
    # output (kgtk/join/kgtkmergecolumns.py:36-80: id/node1/label/node2
    # keep their names)
    required = {"id", "node1", "label", "node2"}
    if left_prefix:
        ren = {c: left_prefix + c for c in lcols if c not in required}
        left = left.map_batches(lambda df, r=ren: df.rename(columns=r),
                                batch_format="pandas")
        lcols = [ren.get(c, c) for c in lcols]
        lkeys = [ren.get(c, c) for c in lkeys]
    if right_prefix:
        ren = {c: right_prefix + c for c in rcols if c not in required}
        right = right.map_batches(lambda df, r=ren: df.rename(columns=r),
                                  batch_format="pandas")
        rcols = [ren.get(c, c) for c in rcols]
        rkeys = [ren.get(c, c) for c in rkeys]

    def keys_raw(d: Dataset, cols: Sequence[str]) -> Dataset:
        """Per-batch-distinct keys — no shuffle; row count is an upper
        bound on the true distinct count (the path decision).  Arrow
        rendering, because the broadcast path below filters batches
        with _key_expr_arrow — see the rendering note in ifexists."""
        return d.map_batches(
            lambda t, c=tuple(cols): pa.table(
                {"__key__": pc.unique(_key_expr_arrow(t, list(c)))}),
            batch_format="pyarrow",
        ).materialize()

    from .core import cat

    lraw = keys_raw(left, lkeys)
    rraw = keys_raw(right, rkeys)

    if lraw.count() + rraw.count() <= broadcast_limit:
        # small key sets: reduce to driver-side Python sets, broadcast
        lset = set(lraw.to_pandas()["__key__"])
        rset = set(rraw.to_pandas()["__key__"])
        if left_join and right_join:
            keep = lset | rset
        elif left_join:
            keep = lset
        elif right_join:
            keep = rset
        else:
            keep = lset & rset
        ref = ray.put(pa.array(sorted(keep), pa.string()))

        def filt(keys):
            def f(t: pa.Table) -> pa.Table:
                ks = ray.get(ref)
                return t.filter(pc.is_in(_key_expr_arrow(t, keys),
                                         value_set=ks))
            return f

        lf = left.map_batches(filt(lkeys), batch_format="pyarrow")
        rf = right.map_batches(filt(rkeys), batch_format="pyarrow")
        return cat(lf, rf)

    # large key sets: keep everything distributed — dedupe each side's
    # keys with a bucketed shuffle, combine per the join mode, then
    # semi-join each input against the key-set dataset.
    from ._bucket import bucketed_group_apply

    def dedupe(d: Dataset) -> Dataset:
        return bucketed_group_apply(d, ["__key__"],
                                    lambda df: df.drop_duplicates(),
                                    num_buckets=64)

    if left_join and right_join:
        keep_ds = dedupe(lraw.union(rraw))
    elif left_join:
        keep_ds = dedupe(lraw)
    elif right_join:
        keep_ds = dedupe(rraw)
    else:
        keep_ds = _semi_anti(dedupe(lraw), dedupe(rraw), anti=False,
                             input_keys=["__key__"], filter_keys=["__key__"])
    keep_ds = keep_ds.materialize()

    def semi(ds: Dataset, keys) -> Dataset:
        return _semi_anti(ds, keep_ds, anti=False,
                          input_keys=keys, filter_keys=["__key__"])

    return cat(semi(left, lkeys), semi(right, rkeys))


def lift(
    ds: Dataset,
    labels: Dataset | None = None,
    *,
    label_value: str = "label",
    lift_columns: Sequence[str] = ("node1", "label", "node2"),
    suffix: str = ";label",
    lift_from: str = "node2",
    remove_label_rows: bool = True,
    broadcast_limit: int = BROADCAST_LIMIT,
) -> Dataset:
    """Attach entity labels as new columns ``node1;label``, ``label;label``,
    ``node2;label`` (reference kgtk/lift/kgtklift.py; label map built from
    rows whose ``label`` column == "label", multiple labels merged into a
    sorted-unique ``|`` list, :228-241; the reference holds the whole map
    in one process's memory — ":2-8 imposes a limit").

    The label map is reduced distributedly (groupby + merge).  Two scale
    paths, chosen by map size:

    * ≤ ``broadcast_limit`` distinct keys: broadcast once via ``ray.put``
      and look up with a vectorized pandas ``map`` per batch — the input
      never re-shuffles;
    * larger (Wikidata-scale label sets): one hash-partitioned
      ``Dataset.join`` per lifted column against the merged label table —
      the input shuffles, the broadcast never materializes on one node.
    """
    label_source = labels if labels is not None else ds

    def select_labels(df: pd.DataFrame) -> pd.DataFrame:
        # lift_from is the reference's --lift-from/--label-value-column
        # (kgtk/lift/kgtklift.py:788,167-189); rows whose value cell is
        # empty never enter the map (:230-231)
        sel = df.loc[df["label"] == label_value, ["node1", lift_from]]
        sel = sel[sel[lift_from].fillna("") != ""]
        return sel.rename(columns={lift_from: "node2"})

    lbl_rows = label_source.map_batches(select_labels, batch_format="pandas")
    # distributed merge of multi-labels (stays a Dataset)
    from ._bucket import bucketed_group_apply

    def merge_labels(df: pd.DataFrame) -> pd.DataFrame:
        dup = df.duplicated("node1", keep=False)
        uniq = df[~dup]
        dups = df[dup]
        if len(dups):
            m = merge_lists_grouped(dups, ["node1"], ["node2"])
            return pd.concat([uniq, m], ignore_index=True)
        return uniq

    merged = bucketed_group_apply(lbl_rows, ["node1"], merge_labels,
                                  num_buckets=16)
    out_cols = list(lift_columns)

    def drop_label_rows(df: pd.DataFrame) -> pd.DataFrame:
        if remove_label_rows and labels is None and "label" in df.columns:
            df = df[df["label"] != label_value]
        return df

    # materialize once: count() and the downstream path reuse the same
    # executed label-merge shuffle instead of running it twice
    merged = merged.materialize()
    n_labels = merged.count()
    if n_labels <= broadcast_limit:
        if n_labels:
            label_map = dict(zip(*(lambda d: (d["node1"], d["node2"]))(
                merged.to_pandas())))
        else:
            label_map = {}  # empty datasets can lose their schema
        ref = ray.put(label_map)

        def f(df: pd.DataFrame) -> pd.DataFrame:
            lm = ray.get(ref)
            df = drop_label_rows(df).copy()
            for c in out_cols:
                if c in df.columns:
                    target = c + suffix
                    mapped = df[c].map(lm)
                    # reference build_output_column_names
                    # (kgtklift.py:398-416): a colliding name overwrites
                    # the existing column IN PLACE — unmapped keys keep
                    # the prior cell (so --lift-suffix= rewrites node1/
                    # node2 to cluster ids, leaving unclustered values)
                    df[target] = mapped.fillna(
                        df[target] if target in df.columns else "")
            return df

        return ds.map_batches(f, batch_format="pandas")

    # join path: the merged label table is already materialized above.
    # bucketed_join, not Dataset.join — the latter crashes whenever a
    # hash partition receives zero rows on either side (see
    # _bucket.bucketed_join's docstring), which a small or skewed label
    # table can always produce.
    from ._bucket import bucketed_join, schema_pa_fields

    out = ds.map_batches(drop_label_rows, batch_format="pandas")
    n_buckets = max(16, min(256, n_labels // 1_000_000 + 16))
    present = [c for c in out_cols if c in ds.schema().names]
    left_fields = schema_pa_fields(ds)
    left_fields["__lift_key__"] = pa.string()
    for c in present:
        lifted_name = c + suffix
        # a colliding output name overwrites the existing column in
        # place (kgtklift.py:398-416) — join under a temp name, then
        # coalesce mapped-over-original
        collide = lifted_name in left_fields
        rhs_name = "__lift_val__" if collide else lifted_name
        rhs = merged.map_batches(
            lambda t, new=rhs_name: pa.table(
                {"__lift_key__": pc.cast(t["node1"], pa.string()),
                 new: pc.cast(t["node2"], pa.string())}),
            batch_format="pyarrow")
        lhs = out.map_batches(
            lambda df, col=c: df.assign(
                __lift_key__=df[col].fillna("").astype(str)),
            batch_format="pandas")
        out = bucketed_join(
            lhs, rhs, "__lift_key__",
            left_fields=dict(left_fields),
            right_fields={"__lift_key__": pa.string(),
                          rhs_name: pa.string()},
            how="left", num_buckets=n_buckets).drop_columns(
            ["__lift_key__"])
        if collide:
            out = out.map_batches(
                lambda df, new=lifted_name, tmp=rhs_name: df.assign(
                    **{new: df[tmp].fillna(df[new])}).drop(columns=[tmp]),
                batch_format="pandas")
        else:
            out = out.map_batches(
                lambda df, new=lifted_name: df.assign(
                    **{new: df[new].fillna("")}),
                batch_format="pandas")
            left_fields[lifted_name] = pa.string()
    return out


def sort_edges(ds: Dataset, columns: Sequence[str] = ("node1", "label", "node2"),
               *, descending: bool = False) -> Dataset:
    """Distributed range-partition sort (the reference shells out to
    coreutils sort, kgtk/cli/sort.py:164)."""
    return ds.sort(list(columns), descending=descending)


def dedup_exact_edges(ds: Dataset, key_columns: Sequence[str] | None = None) -> Dataset:
    """Exact duplicate removal on (node1,label,node2) (or given keys):
    two-phase — per-batch drop_duplicates (combiner / skew guard), then
    ``groupby(keys).map_groups(head(1))``.  Deterministic winner: the
    lexicographically-first row of the group."""
    keys = list(key_columns) if key_columns else _default_edge_keys(ds.schema().names)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=keys)

    def first_per_key(df: pd.DataFrame) -> pd.DataFrame:
        rest = [c for c in df.columns if c not in keys]
        return (df.sort_values(rest or keys, kind="mergesort")
                .drop_duplicates(subset=keys, keep="first"))

    from ._bucket import bucketed_group_apply
    return bucketed_group_apply(
        ds.map_batches(local, batch_format="pandas"), keys, first_per_key)
