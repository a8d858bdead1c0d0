"""Distributed clustering tail shared by the near-dup detectors.

Replaces the driver-side union-find + broadcast cluster map the round-1
implementations used: verified candidate pairs stay a Dataset, cluster
labels propagate with the same bucketed min-label iteration the graph
operators use (the driver sees only the per-round changed counter), and
cluster assignment re-attaches to the corpus with one hash join.  The
cluster representative is the minimum member id in the id column's own
dtype (numeric min for int ids, lexicographic for strings).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..ops._bucket import bucketed_group_apply, bucketed_join

Dataset = ray.data.Dataset


def _id_type(ds: Dataset, col: str) -> "pa.DataType":
    sch = ds.schema()
    try:
        t = dict(zip(sch.names, sch.types))[col]
        if isinstance(t, pa.DataType):
            return t
    except Exception:
        pass
    # pandas-block dataset (schema reports numpy dtypes): infer from a row
    v = ds.take(1)[0][col]
    return pa.scalar(v).type


# Verified near-dup pairs below this count cluster with a driver-side
# union-find (broadcast map assignment) — the same size-gated pattern
# as ops.shuffle.BROADCAST_LIMIT.  Above it, the distributed min-label
# propagation runs; both produce identical clusters (rep = min member).
PAIR_DRIVER_LIMIT = 1_000_000


def assign_clusters(ids: Dataset, pairs: Dataset, *, id_col: str,
                    num_partitions: int = 16,
                    driver_limit: int = PAIR_DRIVER_LIMIT) -> Dataset:
    """Cluster assignment over verified pairs with the size-gated
    driver/distributed switch.  ``pairs`` may contain duplicates."""
    import ray

    pairs = pairs.materialize()
    n = pairs.count()
    if n == 0:
        return ids.map_batches(
            lambda df: pd.DataFrame({id_col: df[id_col],
                                     "cluster": df[id_col]}),
            batch_format="pandas")
    if n > driver_limit:
        return cluster_pairs(ids, pairs, id_col=id_col,
                             num_partitions=num_partitions)

    pdf = pairs.to_pandas().drop_duplicates(["a", "b"])
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pdf["a"], pdf["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    cm = {d: find(d) for d in set(pdf["a"]) | set(pdf["b"])}
    ref = ray.put(cm)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": df[id_col].map(lambda x: m.get(x, x)).to_numpy(),
        })

    return ids.map_batches(assign, batch_format="pandas")


def cluster_pairs(ids: Dataset, pairs: Dataset, *, id_col: str,
                  num_partitions: int = 16, max_iters: int = 50) -> Dataset:
    """Connected components over a verified-pair Dataset ``(a, b)``.

    Returns ``(id_col, cluster)`` covering every row of ``ids`` —
    members of a pair component get the component's minimum id, all
    other docs are singletons mapping to themselves.  Fully distributed
    min-label propagation (converges in O(cluster diameter) rounds,
    which for near-dup clusters is tiny).
    """
    idt = _id_type(ids, id_col)
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ids.map_batches(
            lambda df: pd.DataFrame({id_col: df[id_col],
                                     "cluster": df[id_col]}),
            batch_format="pandas")

    sym = pairs.map_batches(
        lambda df: pd.concat([
            df[["a", "b"]].rename(columns={"a": "node", "b": "nbr"}),
            df[["a", "b"]].rename(columns={"b": "node", "a": "nbr"})],
            ignore_index=True).drop_duplicates(),
        batch_format="pandas").repartition(num_partitions).materialize()

    labels = bucketed_group_apply(
        sym.map_batches(lambda df: df[["node"]].drop_duplicates(),
                        batch_format="pandas"),
        ["node"], lambda df: df.drop_duplicates(),
        num_buckets=num_partitions) \
        .map_batches(lambda df: df.assign(comp=df["node"]),
                     batch_format="pandas") \
        .repartition(num_partitions).materialize()

    pair_fields = {"node": idt, "nbr": idt}
    label_fields = {"node": idt, "comp": idt}

    for _ in range(max_iters):
        prop = bucketed_join(sym, labels, "node", left_fields=pair_fields,
                             right_fields=label_fields,
                             num_buckets=num_partitions) \
            .map_batches(lambda df: pd.DataFrame(
                {"node": df["nbr"], "comp": df["comp"], "src": 1}),
                batch_format="pandas")
        own = labels.map_batches(lambda df: df.assign(src=0),
                                 batch_format="pandas")

        def step(df: pd.DataFrame) -> pd.DataFrame:
            new = df.groupby("node", sort=False)["comp"].min()
            old = df[df["src"] == 0].set_index("node")["comp"]
            out = new.reset_index()
            out["changed"] = (new != old.reindex(new.index)).to_numpy(
                dtype="int64")
            return out

        merged = bucketed_group_apply(prop.union(own), ["node"], step,
                                      num_buckets=num_partitions) \
            .repartition(num_partitions).materialize()
        changed = merged.sum("changed")
        labels = merged.drop_columns(["changed"]).materialize()
        if not changed:
            break

    out = bucketed_join(
        ids.map_batches(lambda df: df[[id_col]].rename(
            columns={id_col: "node"}), batch_format="pandas"),
        labels, "node", left_fields={"node": idt},
        right_fields=label_fields, how="left",
        num_buckets=num_partitions)
    # cast back: the left merge NaN-promotes an int comp column
    return out.map_batches(
        lambda df: pd.DataFrame(
            {id_col: df["node"],
             "cluster": df["comp"].fillna(df["node"])
             .astype(df["node"].dtype)}),
        batch_format="pandas")


