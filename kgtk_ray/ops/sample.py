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


def string_poly_hash(values) -> "np.ndarray":
    """Stable string hash ``sum(byte_i * 31**i) mod 2**31`` per row,
    vectorized over the column's single contiguous Arrow UTF-8 buffer
    (one multiply + one scatter-add per byte — no per-row Python).
    Identical values to the former per-row loop, so hash-keyed samples
    are reproducible across rounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(pd.Series(values).astype(str), from_pandas=True)
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    seg = data[off[0]:off[-1]].astype(np.int64)
    offs = off - off[0]
    out = np.zeros(len(arr), dtype=np.int64)
    if seg.size == 0:
        return out
    lens = np.diff(offs)
    MOD = 2**31
    maxlen = int(lens.max())
    pow31 = np.empty(maxlen, dtype=np.int64)
    p = 1
    for i in range(maxlen):  # O(max string length), not O(rows)
        pow31[i] = p
        p = (p * 31) % MOD
    pos = np.arange(seg.size, dtype=np.int64) - np.repeat(offs[:-1], lens)
    row = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    np.add.at(out, row, (seg * pow31[pos]) % MOD)
    return out % MOD


def every_nth(ds: Dataset, n: int, *, key: str) -> Dataset:
    """Deterministic systematic sample: keep rows where
    ``hash(key) % n == 0``.  For integer-like keys the value itself is
    used (transparent, SQL-checkable); otherwise the stable vectorized
    string hash (:func:`string_poly_hash`)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key]
        try:
            idx = pd.to_numeric(k, errors="raise").astype("int64")
        except (ValueError, TypeError):
            idx = pd.Series(string_poly_hash(k), index=df.index)
        return df[(idx % n) == 0]

    return ds.map_batches(f, batch_format="pandas")


def record_limit(ds: Dataset, limit: int) -> Dataset:
    """First ``limit`` rows in block order (reference record_limit)."""
    return ds.limit(limit)


def tail(ds: Dataset, count: int, *, key: str) -> Dataset:
    """Last ``count`` rows by ``key`` order (reference tail_count is
    positional; here order is made explicit by the sort key).

    Scale note: pays one global range sort; the limit then prunes to
    the top partitions.  Fine for the head/tail-inspection use the
    reference puts it to; not a building block for large extracts."""
    return ds.sort(key, descending=True).limit(count)


def initial_skip(ds: Dataset, count: int, *, key: str) -> Dataset:
    """Skip the first ``count`` rows by ``key`` order.

    Scale bound: the first-``count`` key set is collected and
    broadcast once via ``ray.put`` (read zero-copy by every filter
    task), so driver + worker memory is O(count) keys.  That matches
    the operator's intent — skipping a header-ish prefix, where
    ``count`` is thousands at most.  Skipping a large fraction of a
    100-TB table would need a rank-based anti-join instead; no §2 use
    case calls for it."""
    import ray

    head = ds.sort(key).limit(count).select_columns([key])
    skip = set(head.to_pandas()[key])
    ref = ray.put(skip)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return df[~df[key].isin(s)]

    return ds.map_batches(f, batch_format="pandas")


# Knuth multiplicative hash on an integer id: deterministic, order-free,
# and computable identically in SQL ((id * 2654435761) % 4294967296 —
# products stay under 2^63 for any id < 2^31, so BIGINT arithmetic in
# the oracle matches numpy uint64 exactly).
#
# Independent uses of the hash as a UNIFORM draw (the GPT-3 lottery in
# text/classifier.py, the Gumbel noise in text/dsir.py) must NOT share
# the unsalted stream with the hash-ordered SAMPLING uses below:
# documents with the smallest hash would be both preferentially chosen
# as training examples and near-guaranteed lottery survivors — a
# correlated draw the papers' independent uniforms don't have.  Each
# such use XORs a distinct salt into the id first (still one multiply,
# still SQL-expressible as xor(id, salt) * 2654435761).
_KNUTH = 2654435761
_MOD32 = 4294967296
SALT_LOTTERY = 0x9E3779B9   # classifier lottery uniform
SALT_GUMBEL = 0x85EBCA6B    # DSIR Gumbel-noise uniform


def _id_hash(ids, salt: int = 0) -> "np.ndarray":
    import numpy as np
    a = np.asarray(ids, dtype=np.uint64)
    if salt:
        a = a ^ np.uint64(salt)
    return (a * np.uint64(_KNUTH)) % np.uint64(_MOD32)


def sample_per_group(ds: Dataset, *, group_col: str, id_col: str,
                     n: int, num_buckets: int = 64) -> Dataset:
    """Deterministic per-group sample: the ``n`` rows of each group
    with the smallest ``(knuth_hash(id), id)`` — a training-mix
    curation primitive (cap every source/domain/language at n docs)
    that is reproducible across runs, block orders and cluster sizes.

    Distributed shape: a per-batch partial top-n per group (the
    combiner), then one bucketed shuffle on the group key and a
    vectorized per-bucket top-n — group cardinality never hits the
    driver.  SQL oracle: ``QUALIFY row_number() OVER (PARTITION BY g
    ORDER BY (id*2654435761)%4294967296, id) <= n``.
    """
    from ._bucket import bucketed_group_apply, MIN_BUNDLE_ROWS

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h__=_id_hash(df[id_col].to_numpy()))
        df = df.sort_values(["__h__", id_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(n)

    partial = ds.map_batches(topn, batch_format="pandas",
                             batch_size=MIN_BUNDLE_ROWS)
    out = bucketed_group_apply(partial, [group_col], topn,
                               num_buckets=num_buckets)
    return out.drop_columns(["__h__"])


def split_dataset(ds: Dataset, *, id_col: str,
                  fractions: dict | None = None,
                  split_col: str = "split", scale: int = 10000) -> Dataset:
    """Deterministic train/valid/test split: adds ``split_col`` by
    hash-range assignment — ``knuth_hash(id) % scale`` falls into
    consecutive ranges sized by ``fractions`` (insertion order).
    Same guarantees as :func:`weighted_sample`: a document's split is
    a pure function of its id, so splits are reproducible across runs,
    block orders and cluster sizes, and rows never leak between splits
    on re-runs.  Fractions must sum to 1.  SQL oracle shape:
    ``CASE WHEN h < 9000 THEN 'train' WHEN h < 9500 THEN 'valid' ...``.
    """
    import numpy as np
    fractions = fractions or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    names = list(fractions)
    widths = [int(round(fractions[n] * scale)) for n in names]
    for n, w in zip(names, widths):
        if w <= 0:
            raise ValueError(
                f"fraction for {n!r} ({fractions[n]}) rounds to an empty "
                f"range at scale={scale}; raise scale or the fraction")
    bounds = np.cumsum(widths)
    bounds[-1] = scale  # rounding guard: last range absorbs the slack
    if not np.all(np.diff(bounds) > 0):
        raise ValueError(
            f"split bounds are not strictly increasing: {bounds.tolist()} "
            f"(fractions {fractions} at scale={scale})")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = (_id_hash(df[id_col].to_numpy())
             % np.uint64(scale)).astype("int64")
        idx = np.searchsorted(bounds, h, side="right")
        df = df.copy()
        df[split_col] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(f, batch_format="pandas")


def weighted_sample(ds: Dataset, *, rate_col: str, id_col: str,
                    rates: dict, default_rate: float = 0.0,
                    scale: int = 10000) -> Dataset:
    """Per-category sampling rates (data mixing): keep a row iff
    ``knuth_hash(id) % scale < rate[category] * scale``.  Deterministic
    in the id — the same document is kept or dropped regardless of
    block order, run, or cluster size, so mixes are reproducible and
    resumable.  Stateless map_batches; rates dict is closure-captured
    (small)."""
    import numpy as np
    thresholds = {k: int(round(v * scale)) for k, v in rates.items()}
    default_thr = int(round(default_rate * scale))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash(df[id_col].to_numpy()) % np.uint64(scale)
        thr = df[rate_col].map(thresholds).fillna(default_thr).to_numpy()
        return df[h < thr]

    return ds.map_batches(f, batch_format="pandas")


def shard_assign(ds: Dataset, *, id_col: str, n_shards: int,
                 shard_col: str = "shard", pos_col: str | None = "pos",
                 num_buckets: int | None = None) -> Dataset:
    """Deterministic global shuffle into ``n_shards`` training shards.

    Training runs want the corpus in a reproducible pseudo-random order,
    split into fixed shard files a data loader can stream and a failed
    job can resume per shard.  ``Dataset.random_shuffle`` gives a
    non-reproducible order and a full materializing exchange; this op
    instead derives everything from the Knuth multiplicative hash of
    the id:

    * ``shard_col`` — ``knuth_hash(id) % n_shards``: a pure per-row
      map (zero shuffles).  Follow with
      ``write_parquet(partition_cols=[shard_col])`` for resumable
      shard directories.
    * ``pos_col`` (optional) — the row's 0-based rank within its shard
      by ``(knuth_hash(id), id)``: the reproducible within-shard
      shuffle order.  Computing it co-locates each shard with one
      bucketed shuffle; pass ``pos_col=None`` to skip the exchange
      when the loader shuffles within shards itself.

    Every assignment is a pure function of the id — identical across
    runs, block orders and cluster sizes.  Scale note: with ``pos_col``
    each shard is ranked inside a single task, so pick ``n_shards``
    large enough that one shard fits a worker (at 100 TB: thousands).
    """
    import numpy as np

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[shard_col] = (_id_hash(df[id_col].to_numpy())
                         % np.uint64(n_shards)).astype("int64")
        return df

    tagged = ds.map_batches(assign, batch_format="pandas")
    if pos_col is None:
        return tagged

    from ._bucket import bucketed_group_apply

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h__=_id_hash(df[id_col].to_numpy()))
        df = df.sort_values(["__h__", id_col], kind="mergesort")
        df[pos_col] = df.groupby(shard_col, sort=False).cumcount()
        return df.drop(columns="__h__")

    return bucketed_group_apply(tagged, [shard_col], rank,
                                num_buckets=num_buckets or min(n_shards, 64))
