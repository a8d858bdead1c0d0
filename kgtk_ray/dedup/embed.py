"""Embedding-cosine near-duplicate detection.

Random-hyperplane LSH buckets (sign of W·v for ``n_planes`` seeded
Gaussian planes) generate candidates; exact cosine verifies.  The plane
matrix is tiny and broadcast once via ``ray.put``; the per-batch work
is one matmul.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset


def embedding_dedup(ds: Dataset, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", threshold: float = 0.95,
                    n_planes: int = 12, n_tables: int = 4,
                    seed: int = 42) -> Dataset:
    """Returns ``(vec_id, cluster)`` clustering vectors with cosine
    similarity >= threshold; cluster = min member id."""
    dim = len(ds.take(1)[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    pref = ray.put(planes)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        W = ray.get(pref)
        X = np.stack(df[vec_col].to_numpy())
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        rows = []
        for t in range(n_tables):
            signs = (X @ W[t].T) > 0
            key = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            rows.append(pd.DataFrame({
                "doc": df[id_col].to_numpy(), "table": t, "bucket": key,
                "vec": [v for v in X],
            }))
        return pd.concat(rows, ignore_index=True)

    flat = ds.map_batches(bucketize, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # bucketed self-merge + one einsum for every candidate cosine
        d = (df.drop_duplicates(["table", "bucket", "doc"])
             .sort_values("doc", kind="mergesort"))
        d = d[d.groupby(["table", "bucket"], sort=False).cumcount() < 64]
        m = d.merge(d, on=["table", "bucket"])
        m = m[m["doc_x"] < m["doc_y"]]
        if not len(m):
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        A = np.stack(m["vec_x"].to_numpy())
        B = np.stack(m["vec_y"].to_numpy())
        cos = np.einsum("ij,ij->i", A, B)
        return pd.DataFrame({"a": m["doc_x"].to_numpy(),
                             "b": m["doc_y"].to_numpy(), "cos": cos})

    from ..ops._bucket import bucketed_group_apply
    cand = bucketed_group_apply(flat, ["table", "bucket"], pairs).to_pandas()
    cand = cand.drop_duplicates(["a", "b"])
    cand = cand[cand["cos"] >= threshold]

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for pa, pb in zip(cand["a"], cand["b"]):
        ra, rb = find(pa), find(pb)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo

    cm = {d: find(d) for d in set(cand["a"]) | set(cand["b"])}
    ref = ray.put(cm)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": df[id_col].map(lambda x: m.get(x, x)).to_numpy(),
        })

    return ds.map_batches(assign, batch_format="pandas")
