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


def _distinct_nodes(e: Dataset, *, num_buckets: int = 32) -> Dataset:
    """Distinct node ids of an edge dataset as a ``(node)`` Dataset —
    reduced distributedly (per-batch dedup, then a bucketed shuffle
    dedup); the driver never holds the node set."""
    from ._bucket import bucketed_group_apply

    both = e.map_batches(
        lambda df: pd.DataFrame({"node": pd.concat([df["node1"], df["node2"]])
                                 .astype(str).drop_duplicates()}),
        batch_format="pandas")
    return bucketed_group_apply(both, ["node"],
                                lambda df: df.drop_duplicates(),
                                num_buckets=num_buckets)


def _node_counts(e: Dataset, col: str, out: str) -> Dataset:
    """Per-node count of ``col`` values as ``(node, <out>)`` — two-phase
    (per-batch value_counts combiner, then grouped sum)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col]
        if c.dtype != object:
            c = c.astype(str)
        vc = c.value_counts()
        return pd.DataFrame({"node": vc.index, "n": vc.to_numpy()})

    return grouped_aggregate(
        e.map_batches(partial, batch_format="pandas"),
        ["node"], {out: ("n", "sum")})


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
    the reference prints these from graph-tool.  Fully distributed: the
    degree table and node set stay Datasets; only the four scalar
    reductions reach the driver."""
    e = edges.select_columns(["node1", "node2"]).materialize()
    n_edges = e.count()
    deg = _node_counts(e, "node1", "d").materialize()
    n_deg = deg.count()
    return {
        "num_edges": int(n_edges),
        "num_nodes": int(_distinct_nodes(e).count()),
        "mean_out_degree": float(deg.mean("d")) if n_deg else 0.0,
        "max_out_degree": int(deg.max("d")) if n_deg else 0,
    }


def graph_statistics_edges(edges: Dataset, *, compute_pagerank: bool = True,
                           compute_hits: bool = False,
                           damping: float = 0.85, iters: int = 50,
                           hits_iters: int = 10,
                           in_prop: str = "vertex_in_degree",
                           out_prop: str = "vertex_out_degree",
                           pr_prop: str = "vertex_pagerank",
                           hubs_prop: str = "vertex_hubs",
                           auth_prop: str = "vertex_auth",
                           num_partitions: int = 16) -> Dataset:
    """The reference CLI's ``graph-statistics --statistics-only`` edge
    output (kgtk/cli/graph_statistics.py; worked example
    docs/analysis/graph_statistics.md): per vertex,
    ``(node, vertex_in_degree, <n>)``, ``(node, vertex_out_degree,
    <n>)`` and (optionally) ``(node, vertex_pagerank, <score>)``,
    ``(node, vertex_hubs, <score>)``, ``(node, vertex_auth, <score>)``
    rows with ids ``<node>-<label>-<seq>`` numbered per vertex across
    ALL emitted properties in the reference's order (degrees, pagerank,
    hubs, auth — graph_statistics.py:160-178); the ``*_prop`` options
    rename both the label and the name embedded in the id, matching the
    reference's ``v_prop_dict`` renames.  PageRank scores are
    L1-normalized, matching graph-tool's published values.

    One divergence: the reference numbers ``<seq>`` in graph-tool's
    vertex insertion order (file order); rows here are unordered, so
    vertices are numbered in sorted-node order — deterministic across
    block orders.  Size-gated assembly: the degree/pagerank tables are
    always computed distributed, but under ``DENSE_NODE_LIMIT`` nodes
    the per-node summary (3 small columns) is joined/sorted/numbered on
    the driver in one pass — above it, the fully distributed path
    (bucketed joins + node sort + a block-metadata row index,
    ops/_rowindex.py) assembles without any node-sized driver state.
    """
    from ._bucket import bucketed_join

    e = edges.select_columns(["node1", "node2"]).map_batches(
        lambda df: df.astype(str), batch_format="pandas").materialize()
    nodes = _distinct_nodes(e).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "node1": pd.Series([], dtype=str),
            "label": pd.Series([], dtype=str),
            "node2": pd.Series([], dtype=str),
            "id": pd.Series([], dtype=str)}))

    if n <= DENSE_NODE_LIMIT:
        summary = nodes.to_pandas().set_index("node")
        summary["ind"] = _node_counts(e, "node2", "ind").to_pandas() \
            .set_index("node")["ind"]
        summary["outd"] = _node_counts(e, "node1", "outd").to_pandas() \
            .set_index("node")["outd"]
        labels = [in_prop, out_prop]
        if compute_pagerank:
            prdf = pagerank(e, damping=damping, iters=iters,
                            num_partitions=num_partitions).to_pandas()
            pr = prdf.set_index("node1")["node2"].astype(float)
            summary["pr"] = pr / pr.sum()
            labels.append(pr_prop)
        if compute_hits:
            hdf = hits(e, iters=hits_iters,
                       num_partitions=num_partitions).to_pandas()
            piv = hdf.pivot(index="node1", columns="label", values="node2")
            summary["hub"] = piv["hub"]
            summary["auth"] = piv["authority"]
            labels += [hubs_prop, auth_prop]
        summary = summary.sort_index()
        k = len(labels)
        node = summary.index.to_numpy(dtype=object)
        base = np.arange(len(summary), dtype="int64") * k
        cols = [summary["ind"].fillna(0).astype("int64").astype(str)
                .to_numpy(),
                summary["outd"].fillna(0).astype("int64").astype(str)
                .to_numpy()]
        if compute_pagerank:
            cols.append(np.array([repr(v) for v in
                                  summary["pr"].astype(float).to_numpy()],
                                 dtype=object))
        if compute_hits:
            cols += [summary["hub"].astype(str).to_numpy(),
                     summary["auth"].astype(str).to_numpy()]
        parts = []
        for j, (lab, vals) in enumerate(zip(labels, cols)):
            ids = pd.Series(node) + f"-{lab}-" + \
                pd.Series(base + j).astype(str)
            parts.append(pd.DataFrame({
                "node1": node, "label": lab, "node2": vals,
                "id": ids.to_numpy(), "__o__": base + j}))
        out = pd.concat(parts, ignore_index=True).sort_values("__o__")
        return ray.data.from_pandas(
            out.drop(columns="__o__").reset_index(drop=True))

    import pyarrow as pa
    nf = {"node": pa.string()}
    stats = bucketed_join(nodes, _node_counts(e, "node2", "ind"),
                          "node", left_fields=nf,
                          right_fields={"node": pa.string(),
                                        "ind": pa.int64()}, how="left")
    stats = bucketed_join(stats, _node_counts(e, "node1", "outd"),
                          "node",
                          left_fields={"node": pa.string(),
                                       "ind": pa.int64()},
                          right_fields={"node": pa.string(),
                                        "outd": pa.int64()}, how="left")
    per_vertex = [in_prop, out_prop]
    fields = {"node": pa.string(), "ind": pa.int64(), "outd": pa.int64()}
    if compute_pagerank:
        pr = pagerank(e, damping=damping, iters=iters,
                      num_partitions=num_partitions)
        pr = pr.map_batches(lambda df: pd.DataFrame({
            "node": df["node1"].astype(str),
            "pr": df["node2"].astype(float)}), batch_format="pandas")
        total = pr.sum("pr")  # L1-normalize, as the published values are
        pr = pr.map_batches(lambda df, t=total: df.assign(pr=df["pr"] / t),
                            batch_format="pandas")
        stats = bucketed_join(stats, pr, "node", left_fields=fields,
                              right_fields={"node": pa.string(),
                                            "pr": pa.float64()}, how="left")
        fields["pr"] = pa.float64()
        per_vertex.append(pr_prop)
    if compute_hits:
        h = hits(e, iters=hits_iters, num_partitions=num_partitions)
        # pivot (node1, hub|authority, score) -> (node, hub, auth):
        # per-label projections joined on node — scores arrive as the
        # writer-formatted strings hits() emits
        hubs = h.filter(lambda r: r["label"] == "hub").map_batches(
            lambda df: pd.DataFrame({"node": df["node1"].astype(str),
                                     "hub": df["node2"].astype(str)}),
            batch_format="pandas")
        auths = h.filter(lambda r: r["label"] == "authority").map_batches(
            lambda df: pd.DataFrame({"node": df["node1"].astype(str),
                                     "auth": df["node2"].astype(str)}),
            batch_format="pandas")
        stats = bucketed_join(stats, hubs, "node", left_fields=fields,
                              right_fields={"node": pa.string(),
                                            "hub": pa.string()}, how="left")
        fields["hub"] = pa.string()
        stats = bucketed_join(stats, auths, "node", left_fields=fields,
                              right_fields={"node": pa.string(),
                                            "auth": pa.string()},
                              how="left")
        fields["auth"] = pa.string()
        per_vertex += [hubs_prop, auth_prop]
    k = len(per_vertex)

    from ._rowindex import add_row_index
    ordered = add_row_index(stats.sort("node"), "__vi__")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized row expansion: one (node, label, value, id) edge
        per vertex per per-vertex statistic, interleaved per node like
        the reference writes them (out row order is unspecified)."""
        node = df["node"].astype(str).to_numpy()
        base = df["__vi__"].to_numpy(dtype="int64") * k
        cols = [df["ind"].fillna(0).astype("int64").astype(str).to_numpy(),
                df["outd"].fillna(0).astype("int64").astype(str).to_numpy()]
        if compute_pagerank:
            cols.append(np.array([repr(v) for v in
                                  df["pr"].astype(float).to_numpy()],
                                 dtype=object))
        if compute_hits:
            cols += [df["hub"].astype(str).to_numpy(),
                     df["auth"].astype(str).to_numpy()]
        parts = []
        for j, (lab, vals) in enumerate(zip(per_vertex, cols)):
            ids = pd.Series(node) + f"-{lab}-" + pd.Series(base + j).astype(str)
            parts.append(pd.DataFrame({
                "node1": node, "label": lab, "node2": vals,
                "id": ids.to_numpy(), "__o__": base + j}))
        out = pd.concat(parts, ignore_index=True).sort_values("__o__")
        return out.drop(columns="__o__").reset_index(drop=True)

    return ordered.map_batches(emit, batch_format="pandas")


def reachable_nodes(edges: Dataset, roots: Sequence[str], *,
                    labels: Sequence[str] | None = None,
                    undirected: bool = False, max_hops: int = 100,
                    distributed: bool = False,
                    num_partitions: int = 16) -> Dataset:
    """BFS from a root set; emits ``(root, "reachable", node)``
    (reference kgtk/cli/reachable_nodes.py — graph-tool DFS in memory).

    Default: driver-controlled frontier loop — each round broadcasts
    the frontier (root, node) pairs and scans the edge dataset once
    with a vectorized pandas merge; right for small root sets whose
    reachable set fits the driver.  ``distributed=True``: the frontier
    and visited tables stay Datasets (hash joins + bucketed dedup per
    round, driver sees only the new-row counter) — the path for huge
    root sets / reach (e.g. full-graph closure).
    """
    if distributed:
        return _reachable_distributed(edges, roots, labels=labels,
                                      undirected=undirected,
                                      max_hops=max_hops,
                                      num_partitions=num_partitions)
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


def _reachable_distributed(edges: Dataset, roots: Sequence[str], *,
                           labels: Sequence[str] | None = None,
                           undirected: bool = False, max_hops: int = 100,
                           num_partitions: int = 16) -> Dataset:
    """Dataset-state BFS (see :func:`reachable_nodes`)."""
    import pyarrow as pa

    from ..ops.shuffle import ifnotexists
    from ._bucket import bucketed_join

    if labels is not None:
        lab = set(labels)
        edges = edges.map_batches(lambda df: df[df["label"].isin(lab)],
                                  batch_format="pandas")
    eds = edges.map_batches(
        lambda df: df[["node1", "node2"]].astype(str).rename(
            columns={"node1": "node", "node2": "nbr"}),
        batch_format="pandas")
    if undirected:
        eds = eds.union(edges.map_batches(
            lambda df: pd.DataFrame({"node": df["node2"].astype(str),
                                     "nbr": df["node1"].astype(str)}),
            batch_format="pandas"))
    eds = eds.repartition(num_partitions).materialize()

    start = pd.DataFrame({"root": [str(r) for r in roots]})
    start["node"] = start["root"]
    frontier = ray.data.from_pandas(start).materialize()
    visited = frontier

    sfields = {"node": pa.string(), "root": pa.string()}
    efields = {"node": pa.string(), "nbr": pa.string()}

    for _ in range(max_hops):
        nxt = bucketed_join(eds, frontier, "node", left_fields=efields,
                            right_fields=sfields,
                            num_buckets=num_partitions) \
            .map_batches(lambda df: pd.DataFrame(
                {"root": df["root"], "node": df["nbr"]})
                .drop_duplicates(), batch_format="pandas")
        # drop already-visited (root, node) pairs distributedly
        new = ifnotexists(nxt, visited, input_keys=["root", "node"],
                          filter_keys=["root", "node"]).map_batches(
            lambda df: df.drop_duplicates(["root", "node"]),
            batch_format="pandas")
        from ._bucket import bucketed_group_apply
        new = bucketed_group_apply(new, ["root", "node"],
                                   lambda df: df.drop_duplicates(),
                                   num_buckets=num_partitions).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).repartition(num_partitions) \
            .materialize()
        frontier = new

    # exclude the seed rows, as the driver path does
    seed = ray.data.from_pandas(start)
    out = ifnotexists(visited, seed, input_keys=["root", "node"],
                      filter_keys=["root", "node"])
    return out.map_batches(
        lambda df: pd.DataFrame({"node1": df["root"], "label": "reachable",
                                 "node2": df["node"]}),
        batch_format="pandas")


def paths(edges: Dataset, sources: Sequence[str], targets: Sequence[str], *,
          max_hops: int = 4, distributed: bool = False,
          num_partitions: int = 16) -> Dataset:
    """All simple paths of length <= max_hops from sources to targets
    (reference kgtk/cli/paths.py — graph-tool ``all_paths`` in memory).

    Default implementation mirrors :func:`reachable_nodes`: the (small)
    path frontier is broadcast each round and extended by a vectorized
    merge against the (stationary) edge dataset.  Returns
    ``(node1=source, label="path", node2=target, path="a->b->c", hops)``.
    Cycles are cut by refusing to revisit a node already on the path.

    ``distributed=True`` keeps the path frontier as a Dataset and
    extends it with one ``bucketed_join`` + one dedup shuffle per hop —
    the driver sees only the frontier count.  Use it when the path
    fan-out (combinatorial in dense regions) exceeds driver memory;
    output is identical (both paths tested equal).
    """
    if distributed:
        return _paths_distributed(edges, sources, targets,
                                  max_hops=max_hops,
                                  num_partitions=num_partitions)
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


def paths_statistics(edges: Dataset, sources: Sequence[str],
                     targets: Sequence[str], *,
                     max_hops: int = 4) -> Dataset:
    """The reference CLI's ``--statistics-only`` output format
    (kgtk/cli/paths.py; worked example docs/analysis/paths.md): one row
    per (path, hop) holding the traversed EDGE ID —
    ``(node1=p<i>, label=<hop>, node2=<edge id>, id=p<i>-<hop>-<seq>)``
    with a global running ``<seq>``.  Requires an ``id`` column on the
    edges.  The reference numbers paths in graph-tool's ``all_paths``
    enumeration order; a distributed engine has no file order, so paths
    are numbered in sorted edge-id-sequence order — which reproduces
    the published example exactly.
    """
    eds = edges.select_columns(["node1", "node2", "id"]).materialize()
    tset = set(map(str, targets))

    frontier = pd.DataFrame({"src": list(map(str, sources))})
    frontier["node"] = frontier["src"]
    frontier["path"] = frontier["src"]
    frontier["epath"] = ""
    found = []
    for hop in range(1, max_hops + 1):
        ref = ray.put(frontier)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(ref)
            m = df.merge(fr, left_on="node1", right_on="node")
            if m.empty:
                return pd.DataFrame({"src": [], "node": [], "path": [],
                                     "epath": []})
            keep = [n2 not in p.split("->")
                    for n2, p in zip(m["node2"], m["path"])]
            m = m[keep]
            # NB: np.where with a "\x00" literal silently truncates it
            # (numpy U-dtype is NUL-terminated); use \x1f via pandas
            sep = m["epath"].map(lambda s: "" if s == "" else "\x1f")
            return pd.DataFrame({
                "src": m["src"].astype(str),
                "node": m["node2"].astype(str),
                "path": m["path"] + "->" + m["node2"],
                "epath": m["epath"] + sep + m["id"].astype(str)})

        nxt = eds.map_batches(step, batch_format="pandas").to_pandas()
        if nxt.empty:
            break
        nxt = nxt.drop_duplicates()
        found.append(nxt[nxt["node"].isin(tset)])
        frontier = nxt

    cols = {"node1": pd.Series([], dtype=str),
            "label": pd.Series([], dtype=str),
            "node2": pd.Series([], dtype=str),
            "id": pd.Series([], dtype=str)}
    if not found or not len(pd.concat(found)):
        return ray.data.from_pandas(pd.DataFrame(cols))
    hits = pd.concat(found, ignore_index=True).drop_duplicates()
    epaths = sorted(hits["epath"].map(lambda s: tuple(s.split("\x1f"))))
    rows = []
    seq = 0
    for i, ep in enumerate(epaths):
        for hop, eid in enumerate(ep):
            rows.append((f"p{i}", str(hop), eid, f"p{i}-{hop}-{seq}"))
            seq += 1
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["node1", "label", "node2", "id"]))


def _paths_distributed(edges: Dataset, sources: Sequence[str],
                       targets: Sequence[str], *, max_hops: int,
                       num_partitions: int) -> Dataset:
    """Dataset-state all-simple-paths: per hop, one ``bucketed_join``
    of the frontier against the edge table keyed on the current node
    plus one dedup shuffle; found paths accumulate as a Dataset union.
    Driver-resident state: the frontier row COUNT only."""
    import pyarrow as pa

    from ._bucket import bucketed_group_apply, bucketed_join

    eds = edges.select_columns(["node1", "node2"]).map_batches(
        lambda df: df.astype(str), batch_format="pandas").materialize()
    tref = ray.put(set(map(str, targets)))

    src = [str(s) for s in sources]
    frontier = ray.data.from_pandas(pd.DataFrame(
        {"src": src, "node": src, "path": src}))
    e_fields = {"node1": pa.string(), "node2": pa.string(),
                "__k__": pa.string()}
    f_fields = {"src": pa.string(), "node": pa.string(),
                "path": pa.string(), "__k__": pa.string()}
    found: Dataset | None = None
    for hop in range(1, max_hops + 1):
        lhs = eds.map_batches(lambda df: df.assign(__k__=df["node1"]),
                              batch_format="pandas")
        rhs = frontier.map_batches(
            lambda df: df.assign(__k__=df["node"].astype(str)),
            batch_format="pandas")
        j = bucketed_join(lhs, rhs, "__k__", left_fields=e_fields,
                          right_fields=f_fields, how="inner",
                          num_buckets=num_partitions)

        def extend(df: pd.DataFrame) -> pd.DataFrame:
            keep = [n2 not in p.split("->")
                    for n2, p in zip(df["node2"], df["path"])]
            m = df[keep]
            return pd.DataFrame({"src": m["src"].astype(str),
                                 "node": m["node2"].astype(str),
                                 "path": m["path"] + "->" + m["node2"]})

        nxt = bucketed_group_apply(
            j.map_batches(extend, batch_format="pandas"),
            ["src", "node", "path"], lambda df: df.drop_duplicates(),
            num_buckets=num_partitions).materialize()
        if nxt.count() == 0:
            break

        def hits(df: pd.DataFrame, hop=hop) -> pd.DataFrame:
            t = ray.get(tref)
            h = df[df["node"].isin(t)].copy()
            h["hops"] = np.int64(hop)
            return h

        hit = nxt.map_batches(hits, batch_format="pandas")
        found = hit if found is None else found.union(hit)
        frontier = nxt

    if found is None:
        return ray.data.from_pandas(pd.DataFrame(
            {"node1": pd.Series([], dtype=str),
             "label": pd.Series([], dtype=str),
             "node2": pd.Series([], dtype=str),
             "path": pd.Series([], dtype=str),
             "hops": pd.Series([], dtype="int64")}))

    return found.map_batches(
        lambda df: pd.DataFrame(
            {"node1": df["src"].astype(str), "label": "path",
             "node2": df["node"].astype(str), "path": df["path"],
             "hops": df["hops"].astype("int64")}),
        batch_format="pandas")


def _unionfind_min(pairs: list) -> dict:
    """Union-find over (a, b) string pairs -> {node: min-member
    component id} for every node present."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    groups: dict = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    return {n: min(members) for members in groups.values()
            for n in members}


def _minlabel_fixpoint(adj: Dataset, *, num_partitions: int,
                       max_iters: int,
                       seeds: Dataset | None = None) -> Dataset:
    """Min-label propagation to fixpoint over an adjacency Dataset
    ``(node, nbr)``: every node starts with its own name (or ``seeds``
    rows ``(node, comp)``) and repeatedly takes the min over itself and
    its in-neighbors.  Fully distributed: one bucketed join + one
    bucketed grouped-min per round, the driver sees only the changed
    counter.  Returns ``(node, comp)``."""
    from ._bucket import bucketed_group_apply, bucketed_join

    import pyarrow as pa

    if seeds is None:
        labels = _distinct_nodes(
            adj.map_batches(lambda df: df.rename(
                columns={"node": "node1", "nbr": "node2"}),
                batch_format="pandas")
        ).map_batches(lambda df: df.assign(comp=df["node"]),
                      batch_format="pandas") \
            .repartition(num_partitions).materialize()
    else:
        labels = seeds.repartition(num_partitions).materialize()

    for _ in range(max_iters):
        # push each node's component across its edges, then per-node
        # min over {own comp} ∪ {neighbor comps}; ``src`` tags the own
        # row so the same bucketed pass also counts changed labels.
        prop = bucketed_join(
            adj, labels, "node",
            left_fields={"node": pa.string(), "nbr": pa.string()},
            right_fields={"node": pa.string(), "comp": pa.string()},
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
    return labels


# Residual-subgraph edge gate for the SCC endgame: below it the active
# subgraph collects to the driver for one in-process Tarjan pass
# (~100 MB of string pairs at the limit).  Web-scale graphs reach it in
# a few peel rounds; the distributed rounds above it never hold
# node-scale driver state.
SCC_LOCAL_EDGE_LIMIT = 1_000_000


def _tarjan_scc(edges: list) -> dict:
    """Iterative Tarjan over (src, dst) string pairs -> {node:
    min-member SCC id} for every node present."""
    import itertools

    adj: dict = {}
    present: set = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        present.update((a, b))
    index: dict = {}
    low: dict = {}
    stack: list = []
    onstack: set = set()
    out: dict = {}
    counter = itertools.count()
    for root in sorted(present):
        if root in index:
            continue
        work = [(root, iter(adj.get(root, [])))]
        index[root] = low[root] = next(counter)
        stack.append(root)
        onstack.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = next(counter)
                    stack.append(w)
                    onstack.add(w)
                    work.append((w, iter(adj.get(w, []))))
                    advanced = True
                    break
                elif w in onstack:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                rep = min(comp)
                for w in comp:
                    out[w] = rep
    return out


def _strongly_connected(edges: Dataset, *, num_partitions: int,
                        max_iters: int) -> Dataset:
    """Strongly connected components (reference ``--strong``,
    kgtk/gt/connected_components.py:43,156 label_components on the
    directed graph) via forward-backward coloring: per round, f(v) =
    min active node reaching v along edge direction and b(v) = min
    active node v reaches; nodes with f==b settle into the SCC named by
    that node, peel, repeat.  Every distinct settled color peels one
    SCC per round, so rounds scale with the SCC condensation's depth
    (a pure path graph degenerates to one SCC per round — the known
    FW-BW worst case).  A TRIM phase before each coloring round peels
    nodes lacking in- or out-edges within the active subgraph (they
    cannot sit on a cycle, so each is a singleton SCC) — the standard
    FW-BW-Trim speedup that disposes of a web graph's tendril tails
    with one cheap distinct+anti-join per trim instead of two
    O(diameter) fixpoints.  Returns ``(node, comp)``."""
    from ._bucket import bucketed_group_apply

    fwd = edges.map_batches(
        lambda df: df[["node1", "node2"]].astype(str).drop_duplicates()
        .rename(columns={"node1": "node", "node2": "nbr"}),
        batch_format="pandas").repartition(num_partitions).materialize()

    from ..ops.shuffle import ifexists as _ifexists
    from ..ops.shuffle import ifnotexists as _ifnotexists

    def _distinct_col(d: Dataset, col: str) -> Dataset:
        return bucketed_group_apply(
            d.map_batches(lambda df, c=col: pd.DataFrame(
                {"node": df[c].drop_duplicates()}), batch_format="pandas"),
            ["node"], lambda df: df.drop_duplicates(),
            num_buckets=num_partitions)

    assigned: list[Dataset] = []
    active_adj = fwd
    for _ in range(max_iters):
        # endgame size gate: once the active subgraph is small (the
        # giant SCCs and tendrils peel off in the first rounds), finish
        # with one in-process Tarjan instead of paying O(rounds) more
        # exchanges — a pure path graph would otherwise peel two nodes
        # per trim round
        if active_adj.count() <= SCC_LOCAL_EDGE_LIMIT:
            df = active_adj.to_pandas()
            if len(df):
                local = _tarjan_scc(list(zip(df["node"], df["nbr"])))
                assigned.append(ray.data.from_pandas(pd.DataFrame(
                    {"node": list(local), "comp": list(local.values())})))
            break
        # trim: a node with no in-edges or no out-edges in the active
        # subgraph is a singleton SCC
        for _t in range(max_iters):
            srcs = _distinct_col(active_adj, "node").materialize()
            dsts = _distinct_col(active_adj, "nbr").materialize()
            # nodes present on only one side
            only_src = _ifnotexists(srcs, dsts, input_keys=["node"],
                                    filter_keys=["node"])
            only_dst = _ifnotexists(dsts, srcs, input_keys=["node"],
                                    filter_keys=["node"])
            singles = only_src.union(only_dst).materialize()
            if singles.count() == 0:
                break
            assigned.append(singles.map_batches(
                lambda df: df.assign(comp=df["node"]),
                batch_format="pandas").materialize())
            keep = _ifexists(srcs, dsts, input_keys=["node"],
                             filter_keys=["node"]).materialize()
            active_adj = _ifexists(
                _ifexists(active_adj, keep, input_keys=["node"],
                          filter_keys=["node"]),
                keep.map_batches(lambda df: df.rename(
                    columns={"node": "nbr"}), batch_format="pandas"),
                input_keys=["nbr"], filter_keys=["nbr"]).materialize()
            # nodes whose every edge was trimmed are singletons too
            remaining = _distinct_col(active_adj, "node").union(
                _distinct_col(active_adj, "nbr")) \
                if active_adj.count() else None
            stranded = (_ifnotexists(keep, remaining, input_keys=["node"],
                                     filter_keys=["node"]).materialize()
                        if remaining is not None else keep)
            if stranded.count():
                assigned.append(stranded.map_batches(
                    lambda df: df.assign(comp=df["node"]),
                    batch_format="pandas").materialize())
            if active_adj.count() == 0:
                break
        if active_adj.count() == 0:
            break

        f = _minlabel_fixpoint(active_adj, num_partitions=num_partitions,
                               max_iters=max_iters)
        rev = active_adj.map_batches(
            lambda df: pd.DataFrame({"node": df["nbr"],
                                     "nbr": df["node"]}),
            batch_format="pandas")
        b = _minlabel_fixpoint(rev, num_partitions=num_partitions,
                               max_iters=max_iters)

        def settle(df: pd.DataFrame) -> pd.DataFrame:
            g = df.pivot_table(index="node", columns="dir", values="comp",
                               aggfunc="first")
            if "f" not in g.columns or "b" not in g.columns:
                return pd.DataFrame({"node": [], "comp": [],
                                     "settled": []})
            out = g.reset_index()
            out["settled"] = (out["f"] == out["b"]).astype("int64")
            return pd.DataFrame({"node": out["node"], "comp": out["f"],
                                 "settled": out["settled"]})

        both = f.map_batches(lambda df: df.assign(dir="f"),
                             batch_format="pandas").union(
            b.map_batches(lambda df: df.assign(dir="b"),
                          batch_format="pandas"))
        verdict = bucketed_group_apply(both, ["node"], settle,
                                       num_buckets=num_partitions) \
            .materialize()
        done = verdict.filter(expr="settled == 1") \
            .drop_columns(["settled"]).materialize()
        assigned.append(done)
        remaining = verdict.filter(expr="settled == 0")
        if remaining.count() == 0:
            break
        # restrict the adjacency to edges with both endpoints active
        from ..ops.shuffle import ifexists
        keep = remaining.map_batches(
            lambda df: pd.DataFrame({"node": df["node"]}),
            batch_format="pandas")
        active_adj = ifexists(
            ifexists(active_adj, keep, input_keys=["node"],
                     filter_keys=["node"]),
            keep.map_batches(lambda df: df.rename(
                columns={"node": "nbr"}), batch_format="pandas"),
            input_keys=["nbr"], filter_keys=["nbr"]).materialize()
        # isolated actives (all their edges peeled) are singleton SCCs
        deg_nodes = _distinct_nodes(active_adj.map_batches(
            lambda df: df.rename(columns={"node": "node1",
                                          "nbr": "node2"}),
            batch_format="pandas"))
        from ..ops.shuffle import ifnotexists
        singles = ifnotexists(keep, deg_nodes, input_keys=["node"],
                              filter_keys=["node"]) \
            .map_batches(lambda df: df.assign(comp=df["node"]),
                         batch_format="pandas").materialize()
        if singles.count():
            assigned.append(singles)
            # and drop them from further rounds (they have no edges, so
            # the adjacency restriction above already excludes them)
        if active_adj.count() == 0:
            break
    if not assigned:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series([], dtype=str),
             "comp": pd.Series([], dtype=str)}))
    out = assigned[0]
    for d in assigned[1:]:
        out = out.union(d)
    return out


def connected_components(edges: Dataset, *, max_iters: int = 50,
                         method: str = "lowest",
                         properties: Sequence[str] | None = None,
                         strong: bool = False,
                         num_partitions: int = 16) -> Dataset:
    """Undirected connected components via distributed min-label
    propagation (reference uses graph-tool label_components,
    kgtk/gt/connected_components.py).  Returns ``(node1=node,
    label="connected_component", node2=cluster-name)``.

    ``strong`` computes STRONGLY connected components over the edge
    direction instead (the reference's ``--strong``,
    label_components(directed=True)) — see ``_strongly_connected``.

    ``method`` selects the cluster-naming rule (reference ``Method``
    enum, kgtk/gt/connected_components.py:21-37): ``lowest`` (default;
    lexicographic minimum member), ``highest``, ``first`` (deviation:
    Ray blocks are unordered so "first member in input order" is not
    defined — implemented as ``lowest``), ``shortest``/``longest``
    member name (ties broken lexicographically), ``cat`` (all members
    joined with ``+``), ``hash`` (deterministic hash of the member
    set), ``numbered`` (dense 0..k-1 index by lowest member),
    ``prefixed`` (``CC<number>``).

    Fully distributed: the label table (node -> component) is a Dataset
    hash-joined to the edge set each round; candidate labels reduce
    through a bucketed groupby-min; the driver sees only the per-round
    changed-row counter.  Converges in O(diameter) rounds.
    """
    from ._bucket import bucketed_group_apply

    import pyarrow as pa

    from ._bucket import bucketed_join

    if properties:
        # reference --properties: only edges with these labels define
        # connectivity (kgtk/cli/connected-components.py)
        props = set(properties)
        edges = edges.map_batches(
            lambda df, props=props: df[df["label"].isin(props)],
            batch_format="pandas")

    if strong:
        labels = _strongly_connected(edges, num_partitions=num_partitions,
                                     max_iters=max_iters)
    else:
        und = edges.map_batches(
            lambda df: pd.concat([
                df[["node1", "node2"]].astype(str),
                df[["node2", "node1"]].astype(str).rename(
                    columns={"node2": "node1", "node1": "node2"})],
                ignore_index=True).drop_duplicates()
            .rename(columns={"node1": "node", "node2": "nbr"}),
            batch_format="pandas").repartition(num_partitions).materialize()
        if und.count() <= SCC_LOCAL_EDGE_LIMIT:
            # size-gated endgame, same shape as the SCC one: a small
            # edge set collects once for an in-process union-find
            # instead of O(diameter) distributed min-label rounds
            df = und.to_pandas()
            comp = _unionfind_min(list(zip(df["node"], df["nbr"]))) \
                if len(df) else {}
            labels = ray.data.from_pandas(pd.DataFrame(
                {"node": pd.Series(list(comp), dtype=str),
                 "comp": pd.Series(list(comp.values()), dtype=str)}))
        else:
            labels = _minlabel_fixpoint(und, num_partitions=num_partitions,
                                        max_iters=max_iters)

    labels = _name_clusters_ds(labels, method, num_partitions)
    return labels.map_batches(
        lambda df: pd.DataFrame({"node1": df["node"],
                                 "label": "connected_component",
                                 "node2": df["comp"]}),
        batch_format="pandas")


def _name_clusters_ds(labels: Dataset, method: str,
                      num_partitions: int) -> Dataset:
    """Rename ``comp`` (currently the lowest member) per the naming rule
    — distributed: per-cluster names reduce via grouped aggregation /
    bucketed apply and re-attach with a hash join.  Only ``numbered``/
    ``prefixed`` pull the (cluster-count-sized, not node-sized) distinct
    component list to the driver for the dense global index."""
    from ._bucket import bucketed_group_apply

    if method in ("lowest", "first"):
        # 'first' documented deviation: equals 'lowest' (see caller)
        return labels
    if method in ("numbered", "prefixed"):
        # dense 0..k-1 numbering is inherently a global enumeration: the
        # distinct-component list (component-count scale, << node count)
        # is collected and the rename map broadcast once.  The default
        # 'lowest' naming stays fully distributed.
        distinct = bucketed_group_apply(
            labels.map_batches(lambda df: df[["comp"]].drop_duplicates(),
                               batch_format="pandas"),
            ["comp"], lambda df: df.drop_duplicates(),
            num_buckets=num_partitions)
        comps = sorted(distinct.to_pandas()["comp"])
        prefix = "CC" if method == "prefixed" else ""
        ref = ray.put({c: f"{prefix}{i}" for i, c in enumerate(comps)})
        return labels.map_batches(
            lambda df: df.assign(comp=df["comp"].map(ray.get(ref))),
            batch_format="pandas")

    if method == "highest":
        names = grouped_aggregate(labels, ["comp"], {"name": ("node", "max")},
                                  num_buckets=num_partitions)
    elif method in ("shortest", "longest"):
        def pick(df: pd.DataFrame) -> pd.DataFrame:
            d = df.assign(__len__=df["node"].str.len()).sort_values(
                ["__len__", "node"], ascending=[method == "shortest", True],
                kind="mergesort")
            d = d.drop_duplicates("comp", keep="first")
            return pd.DataFrame({"comp": d["comp"], "name": d["node"]})
        names = bucketed_group_apply(labels, ["comp"], pick,
                                     num_buckets=num_partitions)
    elif method == "cat":
        def join_members(df: pd.DataFrame) -> pd.DataFrame:
            g = df.sort_values("node").groupby("comp", sort=False)["node"] \
                .agg("+".join)
            return pd.DataFrame({"comp": g.index, "name": g.to_numpy()})
        names = bucketed_group_apply(labels, ["comp"], join_members,
                                     num_buckets=num_partitions)
    elif method == "hash":
        # reference naming (kgtk/gt/connected_components.py:125-127):
        # prefix + base64(md5("+".join(sorted(set(members)))))
        def hash_members(df: pd.DataFrame) -> pd.DataFrame:
            import base64
            import hashlib

            def h(s: pd.Series) -> str:
                cat = "+".join(sorted(set(s)))
                return "CLUS" + base64.b64encode(
                    hashlib.md5(cat.encode()).digest()).decode()
            g = df.groupby("comp", sort=False)["node"].agg(h)
            return pd.DataFrame({"comp": g.index, "name": g.to_numpy()})
        names = bucketed_group_apply(labels, ["comp"], hash_members,
                                     num_buckets=num_partitions)
    else:
        raise ValueError(f"unknown naming method {method!r}")

    import pyarrow as pa

    from ._bucket import bucketed_join

    return bucketed_join(
        labels, names, "comp",
        left_fields={"comp": pa.string(), "node": pa.string()},
        right_fields={"comp": pa.string(), "name": pa.string()},
        num_buckets=num_partitions) \
        .map_batches(lambda df: pd.DataFrame({"node": df["node"],
                                              "comp": df["name"]}),
                     batch_format="pandas")


def _empty_edge_result() -> Dataset:
    return ray.data.from_pandas(pd.DataFrame(
        {"node1": pd.Series([], dtype=str), "label": pd.Series([], dtype=str),
         "node2": pd.Series([], dtype=str)}))


# Node-count gate for the dense-vector iterative path: below it the
# per-node state (rank / hub / authority) is an n-float numpy vector
# broadcast per iteration, and each iteration is ONE map pass over a
# static int-encoded edge index — no shuffle at all.  Above it the
# fully distributed join loop runs (flat driver RSS, node-scale state
# stays a Dataset).  4M nodes ~ 32 MB of vector + ~400 MB of per-actor
# name index — comfortable on a 128 GiB worker, far below web scale.
DENSE_NODE_LIMIT = 4_000_000


def _cast_cols_large_string(t):
    """Zero-copy-where-possible cast of every column to large_string
    (the Arrow replacement for a defensive pandas ``astype(str)``)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    return pa.table({c: pc.cast(t[c], pa.large_string())
                     for c in t.column_names})


def _dense_edge_index(e: Dataset, names: np.ndarray):
    """Int32-encode the edge list against the sorted node-name array:
    one pass, materialized once, reused every iteration.  ``names`` is
    broadcast via ``ray.put``; each map task builds the pd.Index from
    shared storage (cheap at the gated scale)."""
    names_ref = ray.put(names)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        idx = pd.Index(ray.get(names_ref))
        return pd.DataFrame({
            "src": idx.get_indexer(df["node1"].astype(str)).astype("int32"),
            "dst": idx.get_indexer(df["node2"].astype(str)).astype("int32"),
        })

    return e.map_batches(encode, batch_format="pandas").materialize()


def _vector_sum_pass(eidx: Dataset, fn, n: int) -> np.ndarray:
    """Run ``fn(src, dst) -> contribution vector of length n`` per edge
    batch and sum the per-batch partials on the driver.  Each partial is
    one dense float64 bincount shipped as a single binary cell, so the
    driver receives num_blocks x 8n bytes — bounded by DENSE_NODE_LIMIT."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = fn(df["src"].to_numpy(), df["dst"].to_numpy())
        return pd.DataFrame({"v": [v.tobytes()]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n, dtype=np.float64)
        for b in df["v"]:
            acc += np.frombuffer(b, dtype=np.float64)
        return pd.DataFrame({"v": [acc.tobytes()]})

    # second-level combine: one dense vector per upstream block is
    # num_blocks x 8n bytes; folding groups of partials in workers
    # bounds what the driver ingests to <= ceil(blocks/8) vectors
    parts = eidx.map_batches(partial, batch_format="pandas") \
        .map_batches(combine, batch_format="pandas", batch_size=8)
    out = np.zeros(n, dtype=np.float64)
    for row in parts.take_all():
        out += np.frombuffer(row["v"], dtype=np.float64)
    return out


def _dense_pagerank(e: Dataset, nodes: Dataset, *, damping: float,
                    iters: int) -> Dataset:
    names = nodes.to_pandas()["node"].sort_values().to_numpy()
    n = len(names)
    eidx = _dense_edge_index(e, names)
    outdeg = _vector_sum_pass(
        eidx, lambda s, d, n=n: np.bincount(s, minlength=n)
        .astype(np.float64), n)
    safe_deg = np.maximum(outdeg, 1.0)  # zero-outdeg nodes emit nothing
    base = (1.0 - damping) / n
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        wref = ray.put(rank / safe_deg)

        def contrib(s, d, n=n, wref=wref):
            w = ray.get(wref)
            return np.bincount(d, weights=w[s], minlength=n)

        sums = _vector_sum_pass(eidx, contrib, n)
        rank = base + damping * sums
    out = pd.DataFrame({"node1": names, "label": "pagerank",
                        "node2": [f"{v:.10f}" for v in rank]})
    return ray.data.from_pandas(out)


def _dense_hits(e: Dataset, nodes: Dataset, *, iters: int) -> Dataset:
    names = nodes.to_pandas()["node"].sort_values().to_numpy()
    n = len(names)
    eidx = _dense_edge_index(e, names)
    hub = np.ones(n)
    hub_norm = 1.0
    auth, auth_norm = hub, 1.0

    def half(vec: np.ndarray, norm: float, reverse: bool):
        wref = ray.put(vec / norm)

        def contrib(s, d, n=n, wref=wref, reverse=reverse):
            w = ray.get(wref)
            if reverse:
                s, d = d, s
            return np.bincount(d, weights=w[s], minlength=n)

        sums = _vector_sum_pass(eidx, contrib, n)
        return sums, float(np.sqrt((sums * sums).sum()) or 1.0)

    for _ in range(iters):
        auth, auth_norm = half(hub, hub_norm, reverse=False)
        hub, hub_norm = half(auth, auth_norm, reverse=True)

    def fmt(vec: np.ndarray, norm: float, label: str) -> pd.DataFrame:
        return pd.DataFrame({"node1": names, "label": label,
                             "node2": [f"{v:.10f}" for v in vec / norm]})

    return ray.data.from_pandas(pd.concat(
        [fmt(hub, hub_norm, "hub"), fmt(auth, auth_norm, "authority")],
        ignore_index=True))


def hits(edges: Dataset, *, iters: int = 10,
         num_partitions: int = 16) -> Dataset:
    """HITS hub/authority scores (reference: graph-tool hits in
    graph-statistics, kgtk/cli/graph_statistics.py:104-180).

    Size-gated: graphs under ``DENSE_NODE_LIMIT`` nodes run the
    dense-vector path (int-encoded edge index materialized once, the
    hub/authority vectors broadcast per half-round, per-batch bincount
    partials summed on the driver — zero shuffles per iteration).
    Above the gate, distributed power iteration: the hub/authority
    vectors are Datasets hash-joined to the edge set each round; the
    matrix-vector products are grouped sums (:func:`grouped_aggregate`);
    only the scalar normalization constants reach the driver.  Nodes
    absent from a grouped sum implicitly score 0 (inner joins drop their
    zero contributions) and are restored by the final left join over the
    full node set.  Returns ``(node1, label in {hub, authority},
    node2=score)``.
    """
    import pyarrow as pa

    from ._bucket import bucketed_join

    edge_fields = {"node": pa.string(), "out": pa.string()}
    e = edges.select_columns(["node1", "node2"]).map_batches(
        lambda df: df.astype(str), batch_format="pandas") \
        .repartition(num_partitions).materialize()
    nodes = _distinct_nodes(e).repartition(num_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _empty_edge_result()
    if n_nodes <= DENSE_NODE_LIMIT:
        return _dense_hits(e, nodes, iters=iters)
    # Loop state per side: UNNORMALIZED sums (node, s) plus the scalar
    # L2 norm — normalization folds into the next join's map (score =
    # s/norm), so each half-round is ONE join + ONE grouped sum + a
    # scalar reduction, with a single materialize (not two).
    hub = nodes.map_batches(lambda df: df.assign(s=1.0),
                            batch_format="pandas").materialize()
    hub_norm = 1.0
    auth, auth_norm = hub, 1.0
    sum_fields = {"node": pa.string(), "s": pa.float64()}

    def half_round(vec: Dataset, norm: float, join_col: str,
                   out_col: str) -> tuple[Dataset, float]:
        keyed = e.map_batches(
            lambda df: df.rename(columns={join_col: "node", out_col: "out"}),
            batch_format="pandas")
        contrib = bucketed_join(
            keyed, vec, "node", left_fields=edge_fields,
            right_fields=sum_fields, num_buckets=num_partitions) \
            .map_batches(lambda df, n=norm: pd.DataFrame(
                {"node": df["out"], "c": df["s"] / n}),
                batch_format="pandas")
        sums = grouped_aggregate(contrib, ["node"], {"s": ("c", "sum")},
                                 num_buckets=num_partitions) \
            .repartition(num_partitions).materialize()
        # sums are already in normalized-contribution units (c = s/n),
        # so the next norm is just sqrt(sum of squares)
        sq = sums.map_batches(
            lambda df: pd.DataFrame({"sq": df["s"] * df["s"]}),
            batch_format="pandas")
        norm_out = float(np.sqrt(sq.sum("sq") or 0.0) or 1.0)
        return sums, norm_out

    for _ in range(iters):
        # authority: sum of in-neighbor hubs; hub: sum of out-auths
        auth, auth_norm = half_round(hub, hub_norm, "node1", "node2")
        hub, hub_norm = half_round(auth, auth_norm, "node2", "node1")

    def fmt(vec: Dataset, norm: float, label: str) -> Dataset:
        return bucketed_join(
            nodes, vec, "node", left_fields={"node": pa.string()},
            right_fields=sum_fields, how="left",
            num_buckets=num_partitions) \
            .map_batches(lambda df, n=norm: pd.DataFrame({
                "node1": df["node"], "label": label,
                "node2": (df["s"].fillna(0.0) / n).map("{:.10f}".format)}),
                batch_format="pandas")

    return fmt(hub, hub_norm, "hub").union(
        fmt(auth, auth_norm, "authority"))


def pagerank(edges: Dataset, *, damping: float = 0.85, iters: int = 10,
             num_partitions: int = 16) -> Dataset:
    """Power-iteration PageRank (reference: graph-tool pagerank in
    graph-statistics).  Returns ``(node1, "pagerank", score)`` rows.

    Size-gated: under ``DENSE_NODE_LIMIT`` nodes the dense-vector path
    runs (int-encoded edge index materialized once, rank vector
    broadcast per iteration, per-batch bincount partials summed on the
    driver — zero shuffles per iteration; driver RSS is O(nodes),
    bounded by the gate).  Above it, fully distributed: out-degrees
    fold into the edge dataset once before the loop (one hash join);
    each round joins the rank Dataset to the edge set, aggregates
    contributions with :func:`grouped_aggregate` and rebuilds the rank
    table with a left join over the node set.  No edge- or node-sized
    structure ever lives on the driver.
    """
    import pyarrow as pa

    from ._bucket import bucketed_join

    e = edges.select_columns(["node1", "node2"]).map_batches(
        _cast_cols_large_string, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    nodes = _distinct_nodes(e).repartition(num_partitions).materialize()
    n = nodes.count()
    if n == 0:
        return _empty_edge_result()
    if n <= DENSE_NODE_LIMIT:
        return _dense_pagerank(e, nodes, damping=damping, iters=iters)
    outdeg = _node_counts(e, "node1", "outdeg")
    # (node=src, dst, outdeg): joined once, reused every iteration
    ej = bucketed_join(
        e.map_batches(
            lambda df: df.rename(columns={"node1": "node", "node2": "dst"}),
            batch_format="pandas"),
        outdeg, "node",
        left_fields={"node": pa.string(), "dst": pa.string()},
        right_fields={"node": pa.string(), "outdeg": pa.int64()},
        num_buckets=num_partitions).repartition(num_partitions).materialize()
    base = (1.0 - damping) / n
    ej_fields = {"node": pa.string(), "dst": pa.string(),
                 "outdeg": pa.int64()}
    sums_fields = {"node": pa.string(), "s": pa.float64()}

    # Loop state is just the in-mass table (node, s); the rank of any
    # node is base + damping*s (absent node => s=0 => rank=base), so
    # each round is ONE edge join + ONE grouped sum — no per-round
    # rank-table rebuild.  Initial uniform rank 1/n is encoded as
    # s0 = (1/n - base)/damping.
    s0 = (1.0 / n - base) / damping
    sums = nodes.map_batches(lambda df, s0=s0: df.assign(s=s0),
                             batch_format="pandas").materialize()

    for _ in range(iters):
        contrib = bucketed_join(
            ej, sums, "node", left_fields=ej_fields,
            right_fields=sums_fields, how="left",
            num_buckets=num_partitions) \
            .map_batches(lambda df: pd.DataFrame(
                {"node": df["dst"],
                 "c": (base + damping * df["s"].fillna(0.0)) / df["outdeg"]}),
                batch_format="pandas")
        sums = grouped_aggregate(contrib, ["node"], {"s": ("c", "sum")},
                                 num_buckets=num_partitions) \
            .repartition(num_partitions).materialize()

    return bucketed_join(
        nodes, sums, "node", left_fields={"node": pa.string()},
        right_fields=sums_fields, how="left",
        num_buckets=num_partitions) \
        .map_batches(lambda df: pd.DataFrame(
            {"node1": df["node"], "label": "pagerank",
             "node2": (base + damping * df["s"].fillna(0.0))
             .map("{:.10f}".format)}),
            batch_format="pandas")
