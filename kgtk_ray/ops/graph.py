"""Whole-graph operators re-expressed as iterative Dataset shuffles.

The reference delegates these to graph-tool (C++, single machine,
in-memory: kgtk/cli/graph_statistics.py, kgtk/cli/reachable_nodes.py,
kgtk/gt/connected_components.py).  Here:

* degrees          -> two-phase groupby counts
* reachable_nodes  -> BFS as a driver loop of broadcast semi-joins
* connected_comps  -> min-label propagation (iterated groupby-min)
* pagerank         -> power iteration over grouped joins
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

from .agg import grouped_aggregate

Dataset = ray.data.Dataset


def degrees(edges: Dataset, *, direction: str = "out") -> Dataset:
    """Per-node degree as edge rows ``(node, "<dir>degree", n)``
    (reference computes via graph-tool, kgtk/cli/graph_statistics.py:104-180).
    Two-phase count: per-batch value_counts, then groupby-sum."""
    col = "node1" if direction == "out" else "node2"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col]
        if c.dtype != object:
            c = c.astype(str)
        vc = c.value_counts()
        return pd.DataFrame({"node1": vc.index, "n": vc.to_numpy()})

    counts = grouped_aggregate(
        edges.map_batches(partial, batch_format="pandas"),
        ["node1"], {"degree": ("n", "sum")})

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node1": df["node1"].astype(str),
            "label": f"{direction}degree",
            "node2": df["degree"].astype("int64").astype(str),
        })

    return counts.map_batches(fmt, batch_format="pandas")


def graph_statistics(edges: Dataset) -> dict:
    """Summary stats (node/edge counts, degree moments) as a small dict —
    the reference prints these from graph-tool."""
    n_edges = edges.count()
    deg = degrees(edges, direction="out").map_batches(
        lambda df: pd.DataFrame({"d": df["node2"].astype(int)}), batch_format="pandas")
    dp = deg.to_pandas()["d"]
    n1 = edges.unique("node1")
    n2 = edges.unique("node2")
    nodes = len(set(n1) | set(n2))
    return {
        "num_edges": int(n_edges),
        "num_nodes": int(nodes),
        "mean_out_degree": float(dp.mean()) if len(dp) else 0.0,
        "max_out_degree": int(dp.max()) if len(dp) else 0,
    }


def reachable_nodes(edges: Dataset, roots: Sequence[str], *,
                    labels: Sequence[str] | None = None,
                    undirected: bool = False, max_hops: int = 100) -> Dataset:
    """BFS from a root set; emits ``(root, "reachable", node)``
    (reference kgtk/cli/reachable_nodes.py — graph-tool DFS in memory).

    Implementation: driver-controlled frontier loop.  Each round
    broadcasts the frontier (root, node) pairs and scans the edge
    dataset once with a vectorized pandas merge — edges never move; only
    the (small) frontier does.
    """
    if labels is not None:
        lab = set(labels)
        edges = edges.map_batches(lambda df: df[df["label"].isin(lab)],
                                  batch_format="pandas")
    eds = edges.select_columns(["node1", "node2"])
    if undirected:
        eds = eds.union(edges.map_batches(
            lambda df: df[["node2", "node1"]].rename(
                columns={"node2": "node1", "node1": "node2"}),
            batch_format="pandas"))
    eds = eds.materialize()  # reused every BFS round; dimension-sized blocks

    visited = pd.DataFrame({"root": list(roots), "node": list(roots)})
    frontier = visited
    for _ in range(max_hops):
        ref = ray.put(frontier)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(ref)
            m = df.merge(fr, left_on="node1", right_on="node")
            return pd.DataFrame({"root": m["root"].astype(str),
                                 "node": m["node2"].astype(str)})

        nxt = eds.map_batches(step, batch_format="pandas").to_pandas()
        if nxt.empty:
            break
        nxt = nxt.drop_duplicates()
        new = nxt.merge(visited, on=["root", "node"], how="left", indicator=True)
        new = new[new["_merge"] == "left_only"][["root", "node"]]
        if new.empty:
            break
        visited = pd.concat([visited, new], ignore_index=True)
        frontier = new

    out = visited.merge(pd.DataFrame({"root": list(roots), "node": list(roots)}),
                        on=["root", "node"], how="left", indicator=True)
    out = out[out["_merge"] == "left_only"][["root", "node"]]
    res = pd.DataFrame({"node1": out["root"].astype(str), "label": "reachable",
                        "node2": out["node"].astype(str)})
    return ray.data.from_pandas(res.reset_index(drop=True))


def paths(edges: Dataset, sources: Sequence[str], targets: Sequence[str], *,
          max_hops: int = 4) -> Dataset:
    """All simple paths of length <= max_hops from sources to targets
    (reference kgtk/cli/paths.py — graph-tool ``all_paths`` in memory).

    Implementation mirrors :func:`reachable_nodes`: the (small) path
    frontier is broadcast each round and extended by a vectorized merge
    against the (stationary) edge dataset.  Returns
    ``(node1=source, label="path", node2=target, path="a->b->c", hops)``.
    Cycles are cut by refusing to revisit a node already on the path.
    """
    eds = edges.select_columns(["node1", "node2"]).materialize()
    tset = set(map(str, targets))

    frontier = pd.DataFrame({"src": list(map(str, sources))})
    frontier["node"] = frontier["src"]
    frontier["path"] = frontier["src"]
    found = []
    for hop in range(1, max_hops + 1):
        ref = ray.put(frontier)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(ref)
            m = df.merge(fr, left_on="node1", right_on="node")
            if m.empty:
                return pd.DataFrame({"src": [], "node": [], "path": []})
            # simple paths only: drop extensions that revisit a node
            keep = [n2 not in p.split("->")
                    for n2, p in zip(m["node2"], m["path"])]
            m = m[keep]
            return pd.DataFrame({"src": m["src"].astype(str),
                                 "node": m["node2"].astype(str),
                                 "path": m["path"] + "->" + m["node2"]})

        nxt = eds.map_batches(step, batch_format="pandas").to_pandas()
        if nxt.empty:
            break
        nxt = nxt.drop_duplicates()
        hit = nxt[nxt["node"].isin(tset)].copy()
        if not hit.empty:
            hit["hops"] = hop
            found.append(hit)
        frontier = nxt
    if not found:
        return ray.data.from_pandas(pd.DataFrame(
            {"node1": pd.Series([], dtype=str), "label": pd.Series([], dtype=str),
             "node2": pd.Series([], dtype=str), "path": pd.Series([], dtype=str),
             "hops": pd.Series([], dtype="int64")}))
    f = pd.concat(found, ignore_index=True)
    out = pd.DataFrame({"node1": f["src"], "label": "path", "node2": f["node"],
                        "path": f["path"], "hops": f["hops"].astype("int64")})
    return ray.data.from_pandas(out.drop_duplicates().reset_index(drop=True))


def connected_components(edges: Dataset, *, max_iters: int = 50,
                         method: str = "lowest") -> Dataset:
    """Undirected connected components via distributed min-label
    propagation (reference uses graph-tool label_components,
    kgtk/gt/connected_components.py).  Returns ``(node1=node,
    label="connected_component", node2=cluster-name)``.

    ``method`` selects the cluster-naming rule (reference ``Method``
    enum, kgtk/gt/connected_components.py:21-37): ``lowest`` (default;
    lexicographic minimum member), ``highest``, ``first`` (first member
    in node order), ``shortest``/``longest`` member name (ties broken
    lexicographically), ``cat`` (all members joined with ``+``),
    ``hash`` (deterministic hash of the member set), ``numbered``
    (dense 0..k-1 index by lowest member), ``prefixed`` (``CC<number>``).

    Each iteration: labels(node->comp) joined to both edge endpoints,
    candidate = min(comp of self, comp of neighbors), groupby-min.
    Iterates to fixpoint; components converge in O(diameter) rounds.
    """
    und = edges.map_batches(
        lambda df: pd.concat([
            df[["node1", "node2"]],
            df[["node2", "node1"]].rename(columns={"node2": "node1",
                                                   "node1": "node2"})],
            ignore_index=True).drop_duplicates(),
        batch_format="pandas").materialize()

    # initial labels: node -> node
    labels_df = und.map_batches(
        lambda df: pd.DataFrame({"node": pd.concat([df["node1"], df["node2"]])
                                 .astype(str).drop_duplicates()}),
        batch_format="pandas").to_pandas().drop_duplicates()
    labels_df["comp"] = labels_df["node"]

    for _ in range(max_iters):
        ref = ray.put(dict(zip(labels_df["node"], labels_df["comp"])))

        def prop(df: pd.DataFrame) -> pd.DataFrame:
            lm = ray.get(ref)
            a = df["node1"].map(lm)
            b = df["node2"].map(lm)
            return pd.DataFrame({"node": df["node1"].astype(str),
                                 "comp": np.minimum(a, b)})

        nxt = und.map_batches(prop, batch_format="pandas").to_pandas()
        nxt = nxt.groupby("node", as_index=False)["comp"].min()
        merged = labels_df.merge(nxt, on="node", how="left", suffixes=("", "_new"))
        merged["comp_new"] = merged["comp_new"].fillna(merged["comp"])
        changed = (merged["comp"] != merged["comp_new"]).sum()
        labels_df = merged[["node", "comp_new"]].rename(columns={"comp_new": "comp"})
        if changed == 0:
            break

    if method != "lowest":
        labels_df = _name_clusters(labels_df, method)
    out = pd.DataFrame({"node1": labels_df["node"], "label": "connected_component",
                        "node2": labels_df["comp"]})
    return ray.data.from_pandas(out.reset_index(drop=True))


def _name_clusters(labels_df: pd.DataFrame, method: str) -> pd.DataFrame:
    """Rename ``comp`` (currently the lowest member) per the naming rule.
    Runs on the label table (one row per node — small relative to the
    edge set; the propagation loop already materialized it)."""
    g = labels_df.groupby("comp", sort=True)["node"]
    if method == "highest":
        names = g.max()
    elif method == "first":
        names = g.first()
    elif method == "shortest":
        names = g.apply(lambda s: min(sorted(s), key=len))
    elif method == "longest":
        names = g.apply(lambda s: max(sorted(s), key=len))
    elif method == "cat":
        names = g.apply(lambda s: "+".join(sorted(s)))
    elif method == "hash":
        names = g.apply(lambda s: hex(
            int(np.bitwise_xor.reduce(
                pd.util.hash_array(np.sort(s.to_numpy(dtype=object)))))
            & 0xFFFFFFFF))
    elif method in ("numbered", "prefixed"):
        idx = {c: i for i, c in enumerate(sorted(g.groups))}
        prefix = "CC" if method == "prefixed" else ""
        names = pd.Series({c: f"{prefix}{i}" for c, i in idx.items()})
    else:
        raise ValueError(f"unknown naming method {method!r}")
    out = labels_df.copy()
    out["comp"] = out["comp"].map(names)
    return out


def hits(edges: Dataset, *, iters: int = 10) -> Dataset:
    """HITS hub/authority scores (reference: graph-tool hits in
    graph-statistics, kgtk/cli/graph_statistics.py:104-180).  Power
    iteration with the rank vectors broadcast per round and the
    matrix-vector products computed as distributed grouped sums.
    Returns ``(node1, label in {hub, authority}, node2=score)``."""
    e = edges.select_columns(["node1", "node2"]).materialize()
    nodes = sorted(set(e.unique("node1")) | set(e.unique("node2")))
    if not nodes:
        return ray.data.from_pandas(pd.DataFrame(
            {"node1": [], "label": [], "node2": []}))
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}

    for _ in range(iters):
        href = ray.put(hub)

        def auth_contrib(df: pd.DataFrame) -> pd.DataFrame:
            h = ray.get(href)
            return pd.DataFrame({"node": df["node2"].astype(str),
                                 "c": df["node1"].map(lambda v: h.get(v, 0.0))})

        a = e.map_batches(auth_contrib, batch_format="pandas").to_pandas()
        asum = a.groupby("node")["c"].sum()
        norm = np.sqrt((asum ** 2).sum()) or 1.0
        auth = {v: asum.get(v, 0.0) / norm for v in nodes}

        aref = ray.put(auth)

        def hub_contrib(df: pd.DataFrame) -> pd.DataFrame:
            av = ray.get(aref)
            return pd.DataFrame({"node": df["node1"].astype(str),
                                 "c": df["node2"].map(lambda v: av.get(v, 0.0))})

        h = e.map_batches(hub_contrib, batch_format="pandas").to_pandas()
        hsum = h.groupby("node")["c"].sum()
        norm = np.sqrt((hsum ** 2).sum()) or 1.0
        hub = {v: hsum.get(v, 0.0) / norm for v in nodes}

    out = pd.DataFrame({
        "node1": nodes * 2,
        "label": ["hub"] * len(nodes) + ["authority"] * len(nodes),
        "node2": [f"{hub[v]:.10f}" for v in nodes]
                 + [f"{auth[v]:.10f}" for v in nodes],
    })
    return ray.data.from_pandas(out)


def pagerank(edges: Dataset, *, damping: float = 0.85, iters: int = 10) -> Dataset:
    """Power-iteration PageRank (reference: graph-tool pagerank in
    graph-statistics).  Returns ``(node1, "pagerank", score)`` rows.
    Broadcast rank vector + distributed contribution aggregation."""
    e = edges.select_columns(["node1", "node2"]).materialize()
    nodes = sorted(set(e.unique("node1")) | set(e.unique("node2")))
    n = len(nodes)
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame({"node1": [], "label": [],
                                                  "node2": []}))
    rank = {v: 1.0 / n for v in nodes}
    outdeg_df = e.to_pandas().groupby("node1").size()
    outdeg = outdeg_df.to_dict()

    for _ in range(iters):
        ref = ray.put(rank)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            r = ray.get(ref)
            w = df["node1"].map(lambda v: r.get(v, 0.0) / outdeg.get(v, 1))
            return pd.DataFrame({"node": df["node2"].astype(str), "c": w})

        c = e.map_batches(contrib, batch_format="pandas").to_pandas()
        sums = c.groupby("node")["c"].sum()
        base = (1.0 - damping) / n
        rank = {v: base + damping * sums.get(v, 0.0) for v in nodes}

    out = pd.DataFrame({"node1": nodes, "label": "pagerank",
                        "node2": [f"{rank[v]:.10f}" for v in nodes]})
    return ray.data.from_pandas(out)
