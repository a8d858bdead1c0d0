"""MinHash + LSH near-duplicate detection.

Pipeline shape (the scale path — no pairwise matrix is ever built):

  1. ``map_batches``: per doc, character-shingle -> 64-bit shingle
     hashes -> ``num_perm`` minhashes via the universal-hash family
     ``h_i(x) = (a_i * x + b_i) mod p`` (vectorized numpy over the
     whole batch's shingle set);
  2. bands: the signature splits into ``bands`` bands of ``r`` rows;
     each band hashes to a bucket key -> ``flat`` (band, bucket, doc)
     rows;
  3. ``groupby(band, bucket)``: docs sharing a band bucket become
     candidate pairs (emitted per group — group sizes are bounded by
     bucket collision, hot buckets capped);
  4. verify: exact shingle-set Jaccard, pair-partitioned — the corpus
     is semi-joined down to candidate docs, re-shingled once, and the
     shingle sets meet their pairs via two hash joins on doc id (no
     driver-side shingle dict, no candidate collect);
  5. distributed min-label propagation over verified pairs -> cluster
     reps (minimum member id in the id column's own dtype); the driver
     sees only per-round convergence counters.

Seeded and deterministic throughout.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

Dataset = ray.data.Dataset

_P = (1 << 61) - 1  # Mersenne prime for the universal hash family

# verify-stage broadcast gate: collect candidate shingles to the driver
# only when both bounds hold; otherwise the pair-partitioned join path
_VERIFY_BROADCAST_DOCS = 200_000
_VERIFY_BROADCAST_BYTES = 512 * 1024 * 1024


_POW = 1099511628211  # FNV-ish odd multiplier for the rolling hash


def _short_hash(raw: np.ndarray) -> np.ndarray:
    """Hash of a sub-k-gram text (the whole-string byte polynomial);
    deterministic across worker processes (hash(str) is per-process
    salted)."""
    pows = np.power(np.uint64(_POW), np.arange(raw.size, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = (raw.astype(np.uint64) * pows).sum(dtype=np.uint64) \
            if raw.size else np.uint64(0)
        h = np.uint64(h) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    return np.array([h & np.uint64(0x7FFFFFFFFFFFFFFF)], dtype=np.uint64)


def _window_hashes(seg: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hash of every k-byte window of ``seg`` (uint64
    wraparound is the mix), as k shifted-slice multiply-adds over the
    contiguous byte buffer.  (A ``sliding_window_view(...).astype``
    materializes a strided n x k copy element-by-element — measured
    ~60x slower than the shifted slices for the same result.)"""
    pows = np.power(np.uint64(_POW), np.arange(k, dtype=np.uint64))
    n = seg.size - k + 1
    segu = seg.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = segu[:n] * pows[0]
        for j in range(1, k):
            h += segu[j:n + j] * pows[j]
        h *= np.uint64(0x9E3779B97F4A7C15)  # final avalanche mix
        h ^= h >> np.uint64(29)
        # 63-bit range so shingle sets survive an Arrow list<int64>
        # round-trip (the pair-partitioned verify ships them as lists)
        h &= np.uint64(0x7FFFFFFFFFFFFFFF)
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-gram hashes of ``text`` as uint64, fully vectorized:
    a byte-level sliding window dotted with multiplier powers — no
    per-gram Python string objects.  Single-doc reference form;
    :func:`_shingle_hashes_batch` is the batch-level equivalent used in
    the pipelines (property-tested equal)."""
    raw = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if raw.size < k:
        return _short_hash(raw)
    return np.unique(_window_hashes(raw, k))


def _shingle_hashes_batch(texts, k: int) -> list[np.ndarray]:
    """Batch-level :func:`_shingle_hashes`: Arrow's ``large_string``
    layout gives ONE contiguous UTF-8 buffer + int64 offsets for the
    whole column, so a single sliding-window polynomial pass hashes
    every window in the batch; per-doc slices of the window-hash array
    are then deduped.  Replaces per-doc ``str.encode`` + window pass
    (object-dtype pandas) with two batch-level numpy kernels.

    ``texts`` may be a pandas Series, a pyarrow (Chunked)Array, or any
    sequence of strings.
    """
    import pyarrow.compute as pc
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, from_pandas=True)
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    # large_string buffers: [validity, offsets(int64), utf8 data]
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    seg = data[off[0]:off[-1]]
    offs = off - off[0]
    H = _window_hashes(seg, k) if seg.size >= k else None
    out: list[np.ndarray] = []
    for i in range(len(arr)):
        s, e = offs[i], offs[i + 1]
        if e - s >= k:
            out.append(np.unique(H[s:e - k + 1]))
        else:
            out.append(_short_hash(seg[s:e]))
    return out


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


def _signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (num_perm, n_shingles) multiply-shift universal hashes -> min over
    # shingles.  uint64 wraparound multiply + add, no modulo — ~5x the
    # throughput of `(a*x+b) % p` at equivalent minhash quality.
    x = sh.astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = np.multiply.outer(a, x, dtype=np.uint64) + b[:, None]
        vals ^= vals >> np.uint64(31)
    return vals.min(axis=1)


def _signatures_batch(shs: list[np.ndarray], a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Batch-level :func:`_signature` returning an (n_docs, num_perm)
    matrix.  Deliberately a per-doc loop of outer products: each doc's
    (num_perm x n_shingles) intermediate stays L2-resident, which
    measured ~6x faster than a fused concatenate +
    ``np.minimum.reduceat`` pass over the batch (memory-bandwidth
    bound at ~64 MB per chunk)."""
    if not len(shs):
        return np.empty((0, a.size), dtype=np.uint64)
    return np.stack([_signature(s, a, b) for s in shs])


def _jaccard_ok(x: bytes, y: bytes, threshold: float) -> bool:
    """Exact Jaccard of two byte-packed sorted shingle sets."""
    xv = np.frombuffer(x, dtype=np.int64)
    yv = np.frombuffer(y, dtype=np.int64)
    inter = np.intersect1d(xv, yv, assume_unique=True).size
    union = xv.size + yv.size - inter
    return (inter / union if union else 1.0) >= threshold


# Per-worker-process memo of decoded broadcast shingle maps, keyed by
# the ObjectRef hex.  Holds at most one entry (cleared on miss) so a
# long-lived worker running several dedup jobs doesn't accumulate maps.
_DECODED_CACHE: dict = {}


def _decoded_maps(ref) -> tuple:
    key = ref.hex()
    hit = _DECODED_CACHE.get(key)
    if hit is None:
        ma, mb = ray.get(ref)
        da = {k: np.frombuffer(v, dtype=np.int64) for k, v in ma.items()}
        db = da if mb is None else \
            {k: np.frombuffer(v, dtype=np.int64) for k, v in mb.items()}
        _DECODED_CACHE.clear()
        _DECODED_CACHE[key] = hit = (da, db)
    return hit


def _make_broadcast_verifier(ref, threshold: float, out_cols: list[str]):
    """Task fn verifying exact Jaccard against broadcast shingle maps.
    The byte-packed maps decode to sorted int64 arrays once per worker
    process (memoized), so the per-pair work is one ``np.intersect1d``
    over pre-decoded arrays."""

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ma, mb = _decoded_maps(ref)
        empty = np.empty(0, dtype=np.int64)
        keep = np.empty(len(df), dtype=bool)
        for i, (x, y) in enumerate(zip(df["a"].tolist(), df["b"].tolist())):
            xv = ma.get(x, empty)
            yv = mb.get(y, empty)
            inter = np.intersect1d(xv, yv, assume_unique=True).size
            union = xv.size + yv.size - inter
            keep[i] = (inter / union if union else 1.0) >= threshold
        return df.loc[keep, out_cols]

    return verify


# verify parallelism floor: a small materialized candidate set often
# lands in ONE block after the group-apply shuffle, and map_batches
# cannot split a block across tasks — repartition below this.
_VERIFY_MIN_BLOCKS = 32


def _band_buckets(sigs: np.ndarray, bands: int, r: int) -> np.ndarray:
    """(n_docs, bands) int64 LSH bucket ids: each band's ``r``
    signature rows mixed with the rolling-hash multiplier in one
    vectorized pass over the whole batch."""
    chunks = sigs.reshape(sigs.shape[0], bands, r)
    mix = np.power(np.uint64(_POW), np.arange(r, dtype=np.uint64))
    with np.errstate(over="ignore"):
        buckets = (chunks * mix).sum(axis=2, dtype=np.uint64)
        buckets *= np.uint64(0x9E3779B97F4A7C15)
        buckets ^= buckets >> np.uint64(29)
    return (buckets & np.uint64(0x7FFFFFFFFFFFFFFF)).astype("int64")


def minhash_signatures(ds: Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 128,
                       shingle_k: int = 5, seed: int = 42) -> Dataset:
    """Add a ``signature`` (list<uint64>) column per document."""
    a, b = _perm_params(num_perm, seed)

    class Signer:
        def __init__(self):
            self.a, self.b = a, b

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sigs = _signatures_batch(
                _shingle_hashes_batch(df[text_col].astype(str), shingle_k),
                self.a, self.b)
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "signature": [s.tolist() for s in sigs],
            })

    return ds.map_batches(Signer, batch_format="pandas", concurrency=4)


def minhash_dedup(ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 128, bands: int = 32, shingle_k: int = 5,
                  threshold: float = 0.8, seed: int = 42,
                  persist_shingles: bool = True) -> Dataset:
    """Near-dup clustering; returns ``(doc_id, cluster)`` where cluster is
    the minimum member id (singletons map to themselves).

    ``persist_shingles=True`` (default) shingles the corpus ONCE into a
    materialized ``(doc, sh_bytes)`` table (~8 bytes per distinct k-gram,
    spilled by the object store): signatures/bands derive from the bytes
    and the exact-Jaccard verify reuses the same table, so the text is
    read and shingled exactly once.  ``False`` is the storage-lean path
    for corpora whose shingle table exceeds cluster spill capacity: the
    verify pass re-reads and re-shingles only the candidate docs instead
    (extra corpus pass + recompute, no 8x intermediate).
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    # 1: shingle pass — (doc, sh_bytes); bytes because Ray's
    # pandas->Arrow conversion mangles list cells into tensor extension
    # types, and binary columns shuffle zero-copy
    def shingle(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": df[id_col].to_numpy(),
            "sh": [s.astype(np.int64).tobytes() for s in
                   _shingle_hashes_batch(df[text_col].astype(str),
                                         shingle_k)],
        })

    sh_table = None
    if persist_shingles:
        sh_table = ds.map_batches(shingle, batch_format="pandas").materialize()

    # 2: signatures and band buckets in one pass over the shingle bytes
    # (persisted path) or the raw text (lean path)
    def sig_and_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc" if "sh" in df else id_col].to_numpy()
        if "sh" in df:
            shs = [np.frombuffer(s, dtype=np.int64).view(np.uint64)
                   for s in df["sh"]]
        else:
            shs = _shingle_hashes_batch(df[text_col].astype(str), shingle_k)
        sigs = _signatures_batch(shs, a, b)  # (n_docs, num_perm)
        buckets = _band_buckets(sigs, bands, r)
        return pd.DataFrame({
            "doc": np.repeat(ids, bands),
            "band": np.tile(np.arange(bands), len(ids)),
            "bucket": buckets.ravel(),
        })

    flat = (sh_table if sh_table is not None else ds).map_batches(
        sig_and_bands, batch_format="pandas")

    # 3: candidate pairs per (band,bucket) group — bucketed self-merge
    # (one vectorized pandas merge per hash bucket; LSH buckets are
    # mostly singletons, so per-group UDF dispatch would dominate)
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.drop_duplicates(["band", "bucket", "doc"])
             .sort_values("doc", kind="mergesort"))
        # hot-bucket cap: first 64 docs per LSH bucket (2016 pairs max)
        d = d[d.groupby(["band", "bucket"], sort=False).cumcount() < 64]
        m = d.merge(d, on=["band", "bucket"])
        m = m[m["doc_x"] < m["doc_y"]]
        return pd.DataFrame({"a": m["doc_x"].to_numpy(),
                             "b": m["doc_y"].to_numpy()})

    from ..ops._bucket import bucketed_join
    from ._cluster import _id_type, assign_clusters

    from ..ops._bucket import bucketed_group_apply

    # candidate pairs repeat across bands (a true near-dup collides in
    # most of the 32 bands); the per-batch drop_duplicates catches most
    # repeats cheaply.  A FULL (a,b)-shuffled dedup only pays for
    # itself on the pair-partitioned verify path, where each duplicate
    # pair would re-ship both docs' shingle bytes (kilobytes) — the
    # broadcast path just re-checks a ~5%-inflated pair stream, so it
    # skips that whole exchange (verify + clustering are
    # duplicate-tolerant).
    raw_pairs = bucketed_group_apply(flat, ["band", "bucket"], pairs)
    cand = raw_pairs.map_batches(
        lambda df: df.drop_duplicates(["a", "b"]),
        batch_format="pandas").materialize()

    ids = ds.select_columns([id_col])
    if cand.count() == 0:
        return ids.map_batches(
            lambda df: pd.DataFrame({id_col: df[id_col], "cluster": df[id_col]}),
            batch_format="pandas")

    # 4: verify with exact shingle-set Jaccard, pair-partitioned: the
    # shingle table (persisted path) or the corpus (lean path) is
    # semi-joined down to the candidate docs (broadcast id set below the
    # limit, hash semi-join above), and the shingle sets meet their pairs
    # via two hash joins on doc id — no driver-side shingle dict, no
    # candidate collect.
    idt = _id_type(ids, id_col)

    from ..ops.shuffle import ifexists

    # size gate: candidate shingle sets are the SMALL side (only docs
    # that collided in some LSH band).  Under the limit, broadcast them
    # once (ray.put) and verify in a single map over the pairs — no
    # per-pair shingle shipping.  Above it, fall back to the fully
    # pair-partitioned path: two hash joins deliver each doc's shingles
    # to its pairs, nothing is collected.
    #
    # Short-circuit: when the WHOLE persisted shingle table already
    # fits the broadcast gate (count/size are free metadata on a
    # materialized dataset), collecting it directly costs the same
    # object-store traffic as collecting the semi-joined subset would —
    # so skip the candidate-id semi-join pass entirely.
    sh = None
    if sh_table is not None and \
            sh_table.count() <= _VERIFY_BROADCAST_DOCS and \
            sh_table.size_bytes() <= _VERIFY_BROADCAST_BYTES:
        sh = sh_table
    else:
        # per-batch-distinct candidate ids; ifexists' broadcast set
        # build dedups globally without an extra shuffle
        needed = cand.map_batches(lambda df: pd.DataFrame(
            {"doc": pd.concat([df["a"], df["b"]]).drop_duplicates()}),
            batch_format="pandas")
        if sh_table is not None:
            sh = ifexists(sh_table, needed, input_keys=["doc"],
                          filter_keys=["doc"]).materialize()
        else:
            cand_docs = ifexists(ds, needed, input_keys=[id_col],
                                 filter_keys=["doc"])
            sh = cand_docs.map_batches(shingle,
                                       batch_format="pandas").materialize()

    if sh.count() <= _VERIFY_BROADCAST_DOCS and \
            sh.size_bytes() <= _VERIFY_BROADCAST_BYTES:
        sdf = sh.to_pandas()
        shref = ray.put((dict(zip(sdf["doc"], sdf["sh"])), None))
        if cand.num_blocks() < _VERIFY_MIN_BLOCKS:
            cand = cand.repartition(_VERIFY_MIN_BLOCKS * 2).materialize()
        verified = cand.map_batches(
            _make_broadcast_verifier(shref, threshold, ["a", "b"]),
            batch_format="pandas")
    else:
        # pair-partitioned path: fully dedup the pair stream first —
        # every surviving duplicate would re-ship both docs' shingle
        # bytes through the two joins below
        cand = bucketed_group_apply(
            cand, ["a", "b"],
            lambda df: df.drop_duplicates(["a", "b"])).materialize()
        sh_fields = {"doc": idt, "sh": pa.large_binary()}
        with_a = bucketed_join(
            cand.map_batches(lambda df: df.rename(columns={"a": "doc"}),
                             batch_format="pandas"),
            sh, "doc", left_fields={"doc": idt, "b": idt},
            right_fields=sh_fields) \
            .map_batches(lambda df: df.rename(columns={"doc": "a",
                                                       "sh": "sh_a",
                                                       "b": "doc"}),
                         batch_format="pandas")
        with_both = bucketed_join(
            with_a, sh, "doc",
            left_fields={"doc": idt, "a": idt, "sh_a": pa.large_binary()},
            right_fields=sh_fields) \
            .map_batches(lambda df: df.rename(columns={"doc": "b",
                                                       "sh": "sh_b"}),
                         batch_format="pandas")

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            keep = np.fromiter(
                (_jaccard_ok(x, y, threshold)
                 for x, y in zip(df["sh_a"], df["sh_b"])),
                dtype=bool, count=len(df))
            return df.loc[keep, ["a", "b"]]

        verified = with_both.map_batches(verify, batch_format="pandas")

    # 5: size-gated clustering (driver union-find under the limit,
    # distributed min-label propagation above — see _cluster.py)
    return assign_clusters(ids, verified, id_col=id_col)
