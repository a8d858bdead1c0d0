"""SemDeDup: semantic deduplication via k-means clustering followed by
intra-cluster cosine pruning (Abbas et al., 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
arXiv:2303.09540).

Pipeline shape — the published algorithm's structure, Ray-Data-first:

  1. deterministic coarse k-means centroids from a seeded id-hash
     sample (:func:`kgtk_ray.ann.train_centroids`, shared with the IVF
     index; the bounded sample is the only driver-side state);
  2. one ``map_batches`` matmul assigns every vector to its nearest
     centroid and ships ``(id, cluster, vec_bytes)`` — vectors travel
     as float32 binary, which shuffles zero-copy;
  3. one bucketed shuffle on the cluster id
     (:func:`~kgtk_ray.ops._bucket.bucketed_group_apply`), then a
     vectorized per-cluster pairwise-cosine pass marks duplicates.

Within a cluster, members are ordered by ascending id and a member is
a *semantic duplicate* iff its cosine to any EARLIER (lower-id) member
is ``>= eps`` — the lowest id of each duplicate chain is the kept
representative.  (The paper keeps the member with the lowest centroid
similarity per duplicate group; keying on the id column instead gives
a deterministic, block-order-independent rule with the same dedup
semantics.)  The per-cluster pairwise pass is O(m^2) in cluster size m
— the published algorithm's inherent cost; at corpus scale
``n_clusters`` grows with the data so m stays bounded, and the matmul
runs in row chunks so peak memory is O(chunk * m), never the full
m x m matrix.  Like :func:`kgtk_ray.ops.sample.shard_assign`'s
per-shard bound, each cluster must still fit one worker's pandas group
(vectors are 4*dim bytes/row), so size ``n_clusters`` to the corpus.

Pairwise cosines only ever compare vectors in the SAME cluster (as in
the paper); near-dups that straddle a centroid boundary are missed —
that approximation is the algorithm, not this implementation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset

# float budget per pairwise-matmul chunk: the (chunk, m) sims matrix
# for an m-member cluster is capped at ~128 MB float32 regardless of
# cluster size (chunk adapts down for huge clusters)
_PAIRWISE_BUDGET = 32 * 1024 * 1024


def semdedup(ds: Dataset, *, vec_col: str = "embedding",
             id_col: str = "vec_id", n_clusters: int = 16,
             eps: float = 0.95, sample_size: int = 2048,
             seed: int = 42, num_buckets: int = 64) -> Dataset:
    """Returns ``(id_col, cluster, keep)``: every input vector with its
    k-means cluster id and ``keep=False`` iff it is a semantic
    duplicate (cosine >= ``eps`` to a lower-id member of the same
    cluster).  Filter on ``keep`` to materialize the deduplicated
    corpus."""
    from ..ann import _list_matrix, _norm_rows, train_centroids
    from ..ops._bucket import bucketed_group_apply

    if ds.count() == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "cluster": pd.Series(dtype="int64"),
            "keep": pd.Series(dtype=bool)}))

    C = train_centroids(ds, n_centroids=n_clusters,
                        sample_size=sample_size, seed=seed,
                        vec_col=vec_col, id_col=id_col)
    cref = ray.put(C)

    def tag(t) -> pd.DataFrame:
        Cm = ray.get(cref)
        if t.num_rows == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "vec": pd.Series(dtype=object)})
        X = _norm_rows(_list_matrix(t, vec_col, dtype=np.float32))
        cluster = (X @ Cm.T).argmax(axis=1).astype("int64")
        return pd.DataFrame({
            id_col: t[id_col].to_numpy(),
            "cluster": cluster,
            # float32 bytes: zero-copy through the shuffle, exact
            # (bit-identical) decode on the other side
            "vec": [v.tobytes() for v in X],
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for cid, sub in df.groupby("cluster", sort=False):
            sub = sub.sort_values(id_col, kind="mergesort")
            m = len(sub)
            dup = np.zeros(m, dtype=bool)
            if m > 1:
                X = np.frombuffer(b"".join(sub["vec"]),
                                  dtype=np.float32).reshape(m, -1)
                # chunked upper-triangular pass: rows [s, e) vs all
                # earlier rows — peak memory O(chunk * m), chunk sized
                # to the float budget (chunk floor of 1 keeps the cap
                # honest even for multi-million-row clusters; the real
                # bound there is the cluster itself residing in one
                # pandas group — see the docstring's cluster-size note)
                chunk = max(1, _PAIRWISE_BUDGET // m)
                for s in range(1, m, chunk):
                    e = min(s + chunk, m)
                    sims = X[s:e] @ X[: e - 1].T  # (e-s, e-1)
                    # row s+i may only look at columns < s+i
                    ahead = np.arange(s, e)[:, None] <= \
                        np.arange(e - 1)[None, :]
                    sims[ahead] = -np.inf
                    dup[s:e] = (sims >= eps).any(axis=1)
            frames.append(pd.DataFrame({
                id_col: sub[id_col].to_numpy(),
                "cluster": np.int64(cid),
                "keep": ~dup,
            }))
        if not frames:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "keep": pd.Series(dtype=bool)})
        return pd.concat(frames, ignore_index=True)

    return bucketed_group_apply(tagged, ["cluster"], prune,
                                num_buckets=num_buckets)
