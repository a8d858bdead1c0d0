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

    def bucketize(t_in) -> pd.DataFrame:
        from ..ann import _list_matrix
        W = ray.get(pref)
        # keep float32 (the parquet storage dtype): the verify cosine
        # must be bit-identical to the fixture oracle's float32 math
        X = _list_matrix(t_in, vec_col, dtype=np.float32)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        ids = t_in[id_col].to_numpy()
        rows = []
        for t in range(n_tables):
            signs = (X @ W[t].T) > 0
            key = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            rows.append(pd.DataFrame({
                "doc": ids, "table": t, "bucket": key,
                "vec": [v for v in X],
            }))
        return pd.concat(rows, ignore_index=True)

    flat = ds.map_batches(bucketize, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # bucketed self-merge + one einsum for every candidate cosine;
        # the cosine verify runs in-stage (vectors travel with the
        # candidate rows) so only verified pairs leave
        d = (df.drop_duplicates(["table", "bucket", "doc"])
             .sort_values("doc", kind="mergesort"))
        d = d[d.groupby(["table", "bucket"], sort=False).cumcount() < 64]
        m = d.merge(d, on=["table", "bucket"])
        m = m[m["doc_x"] < m["doc_y"]]
        if not len(m):
            # dtype-preserving empty frame (blocks must union cleanly)
            return pd.DataFrame({"a": m["doc_x"], "b": m["doc_y"]})
        A = np.stack(m["vec_x"].to_numpy())
        B = np.stack(m["vec_y"].to_numpy())
        cos = np.einsum("ij,ij->i", A, B)
        m = m[cos >= threshold]
        return pd.DataFrame({"a": m["doc_x"].to_numpy(),
                             "b": m["doc_y"].to_numpy()})

    from ._cluster import assign_clusters

    from ..ops._bucket import bucketed_group_apply

    verified = bucketed_group_apply(flat, ["table", "bucket"], pairs)
    # size-gated clustering (driver union-find under the limit,
    # distributed min-label propagation above)
    return assign_clusters(ds.select_columns([id_col]), verified,
                           id_col=id_col)
