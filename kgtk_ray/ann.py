"""Similarity search over an embedding column.

* :func:`topk_cosine` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``); each batch does ONE numpy matmul and
  emits its local top-k per query (partial top-k = the combiner), then a
  tiny ``groupby(query).map_groups`` keeps the global top-k.  Work per
  batch is O(batch × dim × n_queries); nothing materializes the corpus.
* :func:`ivf_topk_cosine` — the scale path: k-means-ish coarse
  centroids (seeded sample), each vector assigned to its nearest centroid
  bucket; queries probe only ``nprobe`` buckets, cutting the scan to
  nprobe/ncentroids of the corpus.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset


def _norm_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _list_matrix(t, vec_col: str, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from an Arrow ``list<float>`` (or Ray tensor
    extension) column without the per-row object round-trip
    ``np.stack`` pays on pandas blocks: one flatten of the child values
    buffer + reshape (embeddings are fixed-dim, no nulls)."""
    import pyarrow as pa
    col = t.column(vec_col)
    arr = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    if isinstance(arr.type, pa.ExtensionType):
        # Ray re-encodes list columns that round-trip through pandas
        # blocks as its ArrowTensorType extension; its to_numpy is
        # already the (n, dim) matrix
        X = np.asarray(arr.to_numpy(zero_copy_only=False))
        if X.dtype == object:
            X = np.stack(X)
    else:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        X = flat.reshape(len(arr), -1)
    return X.astype(dtype, copy=False)


def topk_cosine(ds: Dataset, queries: np.ndarray, k: int = 10, *,
                vec_col: str = "embedding", id_col: str = "vec_id") -> Dataset:
    """Returns (query_id, vec_id, score) rows: top-``k`` corpus vectors
    per query by cosine similarity.  Deterministic tie-break: higher
    score first, then lower vec_id."""
    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)

    def partial(t) -> dict:
        if t.num_rows == 0:
            return {"query_id": np.empty(0, dtype=np.int64),
                    id_col: np.empty(0, dtype=np.int64),
                    "score": np.empty(0, dtype=np.float64)}
        Qm = ray.get(qref)
        X = _norm_rows(_list_matrix(t, vec_col))
        sims = Qm @ X.T  # (n_q, n_batch)
        ids = t[id_col].to_numpy()
        n_take = min(k, sims.shape[1])
        # local top-k per query
        part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
        rows_q = np.repeat(np.arange(len(Qm)), n_take)
        rows_i = part.ravel()
        return {
            "query_id": rows_q.astype("int64"),
            id_col: ids[rows_i],
            "score": sims[rows_q, rows_i].astype("float64"),
        }

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def train_centroids(ds: Dataset, *, n_centroids: int = 16,
                    sample_size: int = 2048, seed: int = 42,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic coarse k-means centroids: an id-hash sample
    (order-normalized by id, so the seed set is independent of Ray
    block structure and task order), then 5 Lloyd iterations on the
    driver.  The sample is bounded at ~``sample_size`` rows — the only
    driver-side materialization on any centroid-based path.  Shared by
    :func:`ivf_topk_cosine`, :class:`IVFIndex` and
    :func:`kgtk_ray.dedup.semdedup`."""
    stride = max(1, ds.count() // sample_size)

    def samp(df: pd.DataFrame) -> pd.DataFrame:
        if stride <= 1:
            return df
        h = pd.util.hash_array(df[id_col].to_numpy())
        return df[h % np.uint64(stride) == 0]

    sdf = ds.map_batches(samp, batch_format="pandas").to_pandas() \
        .sort_values(id_col)
    S = _norm_rows(np.stack(sdf[vec_col].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)]
    for _ in range(5):
        assign = (S @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = _norm_rows(S[m].mean(axis=0, keepdims=True))[0]
    return C


def ivf_topk_cosine(ds: Dataset, queries: np.ndarray, k: int = 10, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_centroids: int = 16, nprobe: int = 4,
                    sample_size: int = 2048, seed: int = 42) -> Dataset:
    """IVF-style ANN: coarse centroids from a seeded sample (a few
    Lloyd iterations on the driver), vectors scanned only in the
    ``nprobe`` buckets nearest each query.  Approximate; recall grows
    with nprobe."""
    C = train_centroids(ds, n_centroids=n_centroids,
                        sample_size=sample_size, seed=seed,
                        vec_col=vec_col, id_col=id_col)
    cref = ray.put(C)

    Q = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    qref = ray.put((Q, {int(q): set(map(int, probe[q])) for q in range(len(Q))}))

    def partial(t) -> pd.DataFrame:
        Cm = ray.get(cref)
        Qm, probes = ray.get(qref)
        if t.num_rows == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 id_col: pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        X = _norm_rows(_list_matrix(t, vec_col))
        bucket = (X @ Cm.T).argmax(axis=1)
        ids = t[id_col].to_numpy()
        frames = []
        for qi in range(len(Qm)):
            mask = np.isin(bucket, list(probes[qi]))
            if not mask.any():
                continue
            sims = X[mask] @ Qm[qi]
            sub_ids = ids[mask]
            n_take = min(k, len(sims))
            top = np.argpartition(-sims, n_take - 1)[:n_take]
            frames.append(pd.DataFrame({
                "query_id": qi, id_col: sub_ids[top],
                "score": sims[top].astype("float64")}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 id_col: pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", id_col], ascending=[False, True],
                             kind="mergesort").head(k)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


class IVFIndex:
    """Partition-pruned IVF: the corpus is written ONCE as Parquet
    partitioned by centroid bucket, so a probe reads only the
    ``nprobe`` bucket partitions from storage — the scan skips I/O,
    not just matmul (the :func:`ivf_topk_cosine` in-stream variant
    still reads every block and filters).  This is the 100-TB shape:
    build is one pass + one partitioned write; each query batch touches
    nprobe/n_centroids of the data.
    """

    def __init__(self, path: str, centroids: np.ndarray, *,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.path = path
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(cls, ds: Dataset, path: str, *, n_centroids: int = 16,
              sample_size: int = 2048, seed: int = 42,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> "IVFIndex":
        """Train centroids (deterministic id-hash sample + 5 Lloyd
        iterations, as ivf_topk_cosine) and write the bucket-partitioned
        corpus."""
        stride = max(1, ds.count() // sample_size)

        def samp(df: pd.DataFrame) -> pd.DataFrame:
            if stride <= 1:
                return df
            h = pd.util.hash_array(df[id_col].to_numpy())
            return df[h % np.uint64(stride) == 0]

        sdf = ds.map_batches(samp, batch_format="pandas").to_pandas() \
            .sort_values(id_col)
        S = _norm_rows(np.stack(sdf[vec_col].to_numpy()).astype(np.float32))
        rng = np.random.default_rng(seed)
        C = S[rng.choice(len(S), size=min(n_centroids, len(S)),
                         replace=False)]
        for _ in range(5):
            assign = (S @ C.T).argmax(axis=1)
            for c in range(len(C)):
                m = assign == c
                if m.any():
                    C[c] = _norm_rows(S[m].mean(axis=0, keepdims=True))[0]
        cref = ray.put(C)

        def tag(t):
            import pyarrow as pa
            Cm = ray.get(cref)
            if t.num_rows == 0:
                return t.append_column("bucket", pa.array([], pa.int64()))
            X = _norm_rows(_list_matrix(t, vec_col))
            bucket = (X @ Cm.T).argmax(axis=1).astype("int64")
            return t.append_column("bucket", pa.array(bucket))

        ds.map_batches(tag, batch_format="pyarrow").write_parquet(
            path, partition_cols=["bucket"])
        return cls(path, C, vec_col=vec_col, id_col=id_col)

    def search(self, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4) -> Dataset:
        """Top-k per query reading ONLY the probed bucket partitions."""
        import os

        Q = _norm_rows(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(Q @ self.centroids.T), axis=1)[:, :nprobe]
        probes = {int(q): {int(b) for b in probe[q]} for q in range(len(Q))}
        needed = sorted(set().union(*probes.values()))
        # ONE dataset over only the probed partitions' files; the
        # bucket id comes back as a hive partition column, so the
        # vector column never round-trips through pandas
        files = []
        for b in needed:
            d = os.path.join(self.path, f"bucket={b}")
            if os.path.isdir(d):
                files += [os.path.join(d, f) for f in os.listdir(d)
                          if f.endswith(".parquet")]
        if not files:
            raise FileNotFoundError(
                f"IVFIndex at {self.path!r}: none of the probed bucket "
                f"partitions {needed} exist — wrong path or empty index?")
        from ray.data.datasource.partitioning import Partitioning
        sub = ray.data.read_parquet(
            files, partitioning=Partitioning("hive", base_dir=self.path),
            columns=[self.id_col, self.vec_col, "bucket"])
        qref = ray.put((Q, probes))
        id_col = self.id_col
        vec_col = self.vec_col

        def partial(t) -> pd.DataFrame:
            Qm, pr = ray.get(qref)
            if t.num_rows == 0:
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     id_col: pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            X = _norm_rows(_list_matrix(t, vec_col))
            import pyarrow as pa
            # hive partition values arrive as strings
            bucket = t["bucket"].cast(pa.int64()).to_numpy()
            ids = t[id_col].to_numpy()
            frames = []
            for qi in range(len(Qm)):
                mask = np.isin(bucket, list(pr[qi]))
                if not mask.any():
                    continue
                sims = X[mask] @ Qm[qi]
                sub_ids = ids[mask]
                n_take = min(k, len(sims))
                top = np.argpartition(-sims, n_take - 1)[:n_take]
                frames.append(pd.DataFrame({
                    "query_id": qi, id_col: sub_ids[top],
                    "score": sims[top].astype("float64")}))
            if not frames:
                return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                     id_col: pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            return pd.concat(frames, ignore_index=True)

        partials = sub.map_batches(partial, batch_format="pyarrow")

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(["score", id_col],
                                 ascending=[False, True],
                                 kind="mergesort").head(k)

        return partials.groupby("query_id").map_groups(
            final, batch_format="pandas")
