"""SimHash near-duplicate detection.

64-bit SimHash over token hashes: each token's 64-bit hash votes +1/-1
per bit position weighted by count; the sign vector is the fingerprint.
Near-dups = fingerprints within ``max_hamming`` bits.

Candidate generation uses the pigeonhole trick: split the 64 bits into
``max_hamming+1`` chunks; two fingerprints within distance d must agree
exactly on at least one chunk, so a groupby on (chunk_idx, chunk_value)
finds all candidates without a pairwise scan.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset

_TOKEN_RE = r"[A-Za-z0-9]+"


def simhash64(texts: pd.Series) -> np.ndarray:
    """Vectorized-ish SimHash: token hashing via pandas C loops, bit
    voting via numpy per document."""
    out = np.zeros(len(texts), dtype=np.uint64)
    token_lists = texts.astype(str).str.lower().str.findall(_TOKEN_RE)
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        h = pd.util.hash_array(np.asarray(toks, dtype=object))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for bpos in np.where(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(bpos)
        out[i] = fp
    return out


def _hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_dedup(ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> Dataset:
    """Returns ``(doc_id, cluster)``; cluster = min member id."""
    chunks = max_hamming + 1
    bits_per = 64 // chunks

    def fp_and_chunks(df: pd.DataFrame) -> pd.DataFrame:
        fps = simhash64(df[text_col])
        rows = {"doc": np.repeat(df[id_col].to_numpy(), chunks),
                "fp": np.repeat(fps, chunks),
                "chunk": np.tile(np.arange(chunks), len(df)),
                "val": np.empty(len(df) * chunks, dtype=np.uint64)}
        for ci in range(chunks):
            shift = np.uint64(ci * bits_per)
            mask = np.uint64((1 << bits_per) - 1)
            rows["val"][ci::chunks] = (fps >> shift) & mask
        return pd.DataFrame(rows)

    flat = ds.map_batches(fp_and_chunks, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # bucketed self-merge: one vectorized pass over all (chunk,val)
        # groups in the hash bucket; the hamming verify runs right here
        # (fingerprints travel with the candidate rows) so only verified
        # pairs leave the stage
        d = (df.drop_duplicates(["chunk", "val", "doc"])
             .sort_values("doc", kind="mergesort"))
        d = d[d.groupby(["chunk", "val"], sort=False).cumcount() < 64]
        m = d.merge(d, on=["chunk", "val"])
        m = m[m["doc_x"] < m["doc_y"]]
        if len(m):
            dist = _hamming(m["fp_x"].to_numpy(dtype=np.uint64),
                            m["fp_y"].to_numpy(dtype=np.uint64))
            m = m[dist <= max_hamming]
        return pd.DataFrame({"a": m["doc_x"].to_numpy(),
                             "b": m["doc_y"].to_numpy()})

    from ._cluster import assign_clusters

    from ..ops._bucket import bucketed_group_apply

    verified = bucketed_group_apply(flat, ["chunk", "val"], pairs)
    # size-gated clustering (driver union-find under the limit,
    # distributed min-label propagation above)
    return assign_clusters(ds.select_columns([id_col]), verified,
                           id_col=id_col)
