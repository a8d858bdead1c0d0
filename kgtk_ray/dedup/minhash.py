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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-gram hashes of ``text`` as uint64, fully vectorized:
    a byte-level sliding window dotted with multiplier powers (uint64
    wraparound is the hash mix) — no per-gram Python string objects."""
    raw = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if raw.size < k:
        # deterministic across worker processes (hash(str) is per-process
        # salted): the same byte-polynomial over the whole string
        pows = np.power(np.uint64(_POW), np.arange(raw.size, dtype=np.uint64))
        with np.errstate(over="ignore"):
            h = (raw.astype(np.uint64) * pows).sum(dtype=np.uint64) \
                if raw.size else np.uint64(0)
            h = np.uint64(h) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        return np.array([h & np.uint64(0x7FFFFFFFFFFFFFFF)], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    pows = np.power(np.uint64(_POW), np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = (win * pows).sum(axis=1, dtype=np.uint64)
        h *= np.uint64(0x9E3779B97F4A7C15)  # final avalanche mix
        h ^= h >> np.uint64(29)
        # 63-bit range so shingle sets survive an Arrow list<int64>
        # round-trip (the pair-partitioned verify ships them as lists)
        h &= np.uint64(0x7FFFFFFFFFFFFFFF)
    return np.unique(h)


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
            sigs = [
                _signature(_shingle_hashes(t, shingle_k), self.a, self.b)
                for t in df[text_col].astype(str)
            ]
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
            "sh": [_shingle_hashes(t, shingle_k).astype(np.int64).tobytes()
                   for t in df[text_col].astype(str)],
        })

    sh_table = None
    if persist_shingles:
        sh_table = ds.map_batches(shingle, batch_format="pandas").materialize()

    # 2: signatures and band buckets in one pass over the shingle bytes
    # (persisted path) or the raw text (lean path)
    def sig_and_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc" if "sh" in df else id_col].to_numpy()
        if "sh" in df:
            sigs = np.stack([
                _signature(np.frombuffer(s, dtype=np.int64)
                           .astype(np.uint64), a, b)
                for s in df["sh"]
            ])
        else:
            sigs = np.stack([
                _signature(_shingle_hashes(t, shingle_k), a, b)
                for t in df[text_col].astype(str)
            ])  # (n_docs, num_perm)
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
    # most of the 32 bands, so the raw pair stream is ~bands x the unique
    # set); dedup them BEFORE verification — the verify step ships both
    # docs' shingle bytes per pair, so each duplicate pair would re-ship
    # kilobytes where the dedup shuffle moves a 2-int row
    raw_pairs = bucketed_group_apply(flat, ["band", "bucket"], pairs)
    cand = bucketed_group_apply(
        raw_pairs.map_batches(lambda df: df.drop_duplicates(["a", "b"]),
                              batch_format="pandas"),
        ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"])).materialize()

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
    # per-batch-distinct candidate ids; ifexists' broadcast set build
    # dedups globally without an extra shuffle
    needed = cand.map_batches(lambda df: pd.DataFrame(
        {"doc": pd.concat([df["a"], df["b"]]).drop_duplicates()}),
        batch_format="pandas")

    from ..ops.shuffle import ifexists

    if sh_table is not None:
        sh = ifexists(sh_table, needed, input_keys=["doc"],
                      filter_keys=["doc"]).materialize()
    else:
        cand_docs = ifexists(ds, needed, input_keys=[id_col],
                             filter_keys=["doc"])
        sh = cand_docs.map_batches(shingle,
                                   batch_format="pandas").materialize()

    def _jaccard_ok(x: bytes, y: bytes) -> bool:
        xv = np.frombuffer(x, dtype=np.int64)
        yv = np.frombuffer(y, dtype=np.int64)
        inter = np.intersect1d(xv, yv, assume_unique=True).size
        union = xv.size + yv.size - inter
        return (inter / union if union else 1.0) >= threshold

    # size gate: candidate shingle sets are the SMALL side (only docs
    # that collided in some LSH band).  Under the limit, broadcast them
    # once (ray.put) and verify in a single map over the pairs — no
    # per-pair shingle shipping.  Above it, fall back to the fully
    # pair-partitioned path: two hash joins deliver each doc's shingles
    # to its pairs, nothing is collected.
    if sh.count() <= _VERIFY_BROADCAST_DOCS and \
            sh.size_bytes() <= _VERIFY_BROADCAST_BYTES:
        sdf = sh.to_pandas()
        shref = ray.put(dict(zip(sdf["doc"], sdf["sh"])))

        def verify_b(df: pd.DataFrame) -> pd.DataFrame:
            shmap = ray.get(shref)
            empty = b""
            keep = np.fromiter(
                (_jaccard_ok(shmap.get(x, empty), shmap.get(y, empty))
                 for x, y in zip(df["a"], df["b"])),
                dtype=bool, count=len(df))
            return df.loc[keep, ["a", "b"]]

        verified = cand.map_batches(verify_b, batch_format="pandas")
    else:
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
                (_jaccard_ok(x, y)
                 for x, y in zip(df["sh_a"], df["sh_b"])),
                dtype=bool, count=len(df))
            return df.loc[keep, ["a", "b"]]

        verified = with_both.map_batches(verify, batch_format="pandas")

    # 5: size-gated clustering (driver union-find under the limit,
    # distributed min-label propagation above — see _cluster.py)
    return assign_clusters(ids, verified, id_col=id_col)
