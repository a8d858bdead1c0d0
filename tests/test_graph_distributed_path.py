"""The dense-vector fast path covers every graph under
DENSE_NODE_LIMIT (4M nodes) — which means the driver's oracles and the
benches never exercise the distributed (above-gate) branch.  These
tests force the gate to 0 and assert the distributed power iterations
agree with the dense path on the same graph."""
import numpy as np
import pandas as pd
import pytest
import ray.data

import kgtk_ray.ops.graph as G


def edges(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["node1", "label", "node2"]))


GRAPH = [
    ("a", "r", "b"), ("a", "r", "c"), ("b", "r", "c"),
    ("c", "r", "a"), ("d", "r", "c"), ("c", "r", "d"),
    ("e", "r", "a"),  # e is a source; b has outdeg 1; dangling: none
]


def scores(df, label):
    return {r.node1: float(r.node2) for r in df.itertuples()
            if r.label == label}


def test_pagerank_distributed_matches_dense(monkeypatch):
    dense = G.pagerank(edges(GRAPH), iters=4, num_partitions=4).to_pandas()
    monkeypatch.setattr(G, "DENSE_NODE_LIMIT", 0)
    dist = G.pagerank(edges(GRAPH), iters=4, num_partitions=4).to_pandas()
    sd, st = scores(dense, "pagerank"), scores(dist, "pagerank")
    assert set(sd) == set(st)
    for n in sd:
        assert sd[n] == pytest.approx(st[n], abs=1e-9), n


def test_hits_distributed_matches_dense(monkeypatch):
    dense = G.hits(edges(GRAPH), iters=4, num_partitions=4).to_pandas()
    monkeypatch.setattr(G, "DENSE_NODE_LIMIT", 0)
    dist = G.hits(edges(GRAPH), iters=4, num_partitions=4).to_pandas()
    for label in ("hub", "authority"):
        sd, st = scores(dense, label), scores(dist, label)
        assert set(sd) == set(st)
        for n in sd:
            assert sd[n] == pytest.approx(st[n], abs=1e-9), (label, n)


def test_pagerank_distributed_dangling_nodes(monkeypatch):
    # sink-only node: exercises the rank-restore left join for nodes
    # with no in-mass and the dangling-mass handling on both paths
    g = [("a", "r", "sink"), ("b", "r", "sink"), ("a", "r", "b")]
    dense = G.pagerank(edges(g), iters=3).to_pandas()
    monkeypatch.setattr(G, "DENSE_NODE_LIMIT", 0)
    dist = G.pagerank(edges(g), iters=3).to_pandas()
    sd, st = scores(dense, "pagerank"), scores(dist, "pagerank")
    assert set(sd) == {"a", "b", "sink"} == set(st)
    for n in sd:
        assert sd[n] == pytest.approx(st[n], abs=1e-9), n


def test_paths_statistics_docs_example(ray_session):
    # /root/reference/docs/analysis/paths.md worked example: a->e,
    # max_hops 2, --statistics-only edge-id path records
    import pandas as pd
    import ray.data as rd
    from kgtk_ray.ops import paths_statistics
    e = rd.from_pandas(pd.DataFrame({
        "node1": ["a", "a", "a", "d", "c", "d", "f"],
        "label": ["r1", "r1", "r2", "r3", "r4", "r3", "r3"],
        "node2": ["c", "d", "c", "e", "e", "f", "d"],
        "id": ["e1", "e2", "e3", "e4", "e5", "e6", "e7"],
        "col": ["1", "2", "3", "4", "1", "2", "3"],
    }))
    out = paths_statistics(e, ["a"], ["e"], max_hops=2).to_pandas()
    want = pd.DataFrame(
        [("p0", "0", "e1", "p0-0-0"), ("p0", "1", "e5", "p0-1-1"),
         ("p1", "0", "e2", "p1-0-2"), ("p1", "1", "e4", "p1-1-3"),
         ("p2", "0", "e3", "p2-0-4"), ("p2", "1", "e5", "p2-1-5")],
        columns=["node1", "label", "node2", "id"])
    pd.testing.assert_frame_equal(out, want)


def test_add_row_index_matches_block_order(ray_session):
    import pandas as pd
    import ray.data as rd
    from kgtk_ray.ops._rowindex import add_row_index
    # single-row blocks in a scrambled value order: the index must
    # follow BLOCK order (what take() returns), not value order
    vals = list("gfedcba")
    ds = rd.from_pandas([pd.DataFrame({"v": [c]}) for c in vals])
    out = add_row_index(ds).to_pandas().sort_values("__order__")
    assert list(out.v) == vals
    # and after a sort, the index follows the sorted order
    out2 = add_row_index(ds.sort("v")).to_pandas().sort_values("__order__")
    assert list(out2.v) == sorted(vals)


def test_graph_statistics_edges_docs_example(ray_session):
    # /root/reference/docs/analysis/graph_statistics.md worked example:
    # per-vertex degree + L1-normalized pagerank edges; ids are
    # numbered in sorted-node order (documented divergence from
    # graph-tool's insertion order)
    import pandas as pd
    import ray.data as rd
    from kgtk_ray.ops import graph_statistics_edges
    e = rd.from_pandas(pd.DataFrame({
        "node1": ["john", "john", "peter", "peter", "steve", "steve"],
        "label": ["zipcode"] * 6,
        "node2": ["12345", "12346", "12040", "12040", "45601", "45601"],
    }))
    out = graph_statistics_edges(e, iters=120).to_pandas()
    assert len(out) == 21  # 7 vertices x 3 stats
    ind = dict(zip(out[out.label == "vertex_in_degree"].node1,
                   out[out.label == "vertex_in_degree"].node2))
    outd = dict(zip(out[out.label == "vertex_out_degree"].node1,
                    out[out.label == "vertex_out_degree"].node2))
    pr = {k: float(v) for k, v in
          zip(out[out.label == "vertex_pagerank"].node1,
              out[out.label == "vertex_pagerank"].node2)}
    assert ind == {"john": "0", "peter": "0", "steve": "0", "12345": "1",
                   "12346": "1", "12040": "2", "45601": "2"}
    assert outd == {"john": "2", "peter": "2", "steve": "2", "12345": "0",
                    "12346": "0", "12040": "0", "45601": "0"}
    # published graph-tool values (docs/analysis/graph_statistics.md)
    import math
    assert math.isclose(pr["john"], 0.10471144347252878, abs_tol=1e-5)
    assert math.isclose(pr["12345"], 0.14921376206743192, abs_tol=1e-5)
    assert math.isclose(pr["12040"], 0.1937160806623351, abs_tol=1e-5)
    # id sequence: sorted-node order, 3 consecutive per vertex
    srt = out.sort_values("id", key=lambda s: s.str.rsplit("-", n=1)
                          .str[-1].astype(int))
    assert list(srt.node1[:6]) == ["12040"] * 3 + ["12345"] * 3
    assert srt.id.iloc[0] == "12040-vertex_in_degree-0"
    assert srt.id.iloc[20] == "steve-vertex_pagerank-20"


def test_graph_statistics_edges_distributed_path_equal(ray_session):
    # force the fully distributed assembly (and distributed pagerank)
    # by dropping the dense gate; output must equal the gated path
    import pandas as pd
    import ray.data as rd
    import kgtk_ray.ops.graph as G
    e = rd.from_pandas(pd.DataFrame({
        "node1": ["john", "john", "peter", "peter", "steve", "steve"],
        "label": ["zipcode"] * 6,
        "node2": ["12345", "12346", "12040", "12040", "45601", "45601"],
    }))
    fast = G.graph_statistics_edges(e, iters=30).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    old = G.DENSE_NODE_LIMIT
    try:
        G.DENSE_NODE_LIMIT = 0
        slow = G.graph_statistics_edges(e, iters=30).to_pandas() \
            .sort_values("id").reset_index(drop=True)
    finally:
        G.DENSE_NODE_LIMIT = old
    nonpr = fast.label != "vertex_pagerank"
    pd.testing.assert_frame_equal(fast[nonpr].reset_index(drop=True),
                                  slow[nonpr].reset_index(drop=True))
    fp = fast[~nonpr].node2.astype(float).to_numpy()
    sp = slow[~nonpr].node2.astype(float).to_numpy()
    assert (abs(fp - sp) < 1e-9).all()
    assert list(fast[~nonpr].id) == list(slow[~nonpr].id)


def test_strongly_connected_components():
    """--strong (reference kgtk/gt/connected_components.py:43,156:
    label_components over the directed graph) vs a reference Tarjan
    run in-process: cycles merge, chains stay singletons."""
    import pandas as pd
    import ray.data

    from kgtk_ray.ops.graph import connected_components

    es = [("a", "b"), ("b", "c"), ("c", "a"),      # SCC {a,b,c}
          ("c", "d"), ("d", "e"), ("e", "d"),      # SCC {d,e}
          ("e", "f"),                              # f singleton
          ("g", "g"),                              # self-loop singleton
          ("h", "i"), ("i", "j")]                  # chain: h, i, j singles
    ds = ray.data.from_pandas(pd.DataFrame(
        [(s, "p", o) for s, o in es], columns=["node1", "label", "node2"]))
    out = connected_components(ds, strong=True).to_pandas()
    got = dict(zip(out.node1, out.node2))

    # in-process Tarjan oracle
    import itertools
    adj: dict = {}
    nodes = set()
    for s, o in es:
        adj.setdefault(s, []).append(o)
        nodes.update((s, o))
    index = {}
    low = {}
    stack, onstack = [], set()
    sccs = []
    counter = itertools.count()

    def strongconnect(v):
        work = [(v, iter(adj.get(v, [])))]
        index[v] = low[v] = next(counter)
        stack.append(v)
        onstack.add(v)
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
                low[work[-1][0]] = min(low[work[-1][0]], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(sorted(comp))

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)

    want = {n: min(comp) for comp in sccs for n in comp}
    assert got == want


def test_strong_vs_weak_components_differ_on_dags():
    import pandas as pd
    import ray.data

    from kgtk_ray.ops.graph import connected_components
    ds = ray.data.from_pandas(pd.DataFrame(
        [("x", "p", "y"), ("y", "p", "z")],
        columns=["node1", "label", "node2"]))
    weak = connected_components(ds).to_pandas()
    strong = connected_components(ds, strong=True).to_pandas()
    assert set(weak.node2) == {"x"}          # one weak component
    assert dict(zip(strong.node1, strong.node2)) == {
        "x": "x", "y": "y", "z": "z"}        # all singletons


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_scc_random_digraphs_match_tarjan(seed):
    """Randomized digraphs (seeded): the distributed FW-BW coloring
    must match an in-process Tarjan on every graph shape — cycles,
    chains, self-loops, disconnected pieces."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgtk_ray.ops.graph import connected_components

    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 14))
    m = int(rng.integers(n, 3 * n))
    nodes = [f"v{i:02d}" for i in range(n)]
    es = sorted({(nodes[int(a)], nodes[int(b)])
                 for a, b in rng.integers(0, n, size=(m, 2))})
    ds = ray.data.from_pandas(pd.DataFrame(
        [(s, "p", o) for s, o in es], columns=["node1", "label", "node2"]))
    out = connected_components(ds, strong=True).to_pandas()
    got = dict(zip(out.node1, out.node2))

    # Tarjan oracle (iterative)
    import itertools
    adj: dict = {}
    present = set()
    for s, o in es:
        adj.setdefault(s, []).append(o)
        present.update((s, o))
    index: dict = {}
    low: dict = {}
    stack: list = []
    onstack: set = set()
    sccs: list = []
    counter = itertools.count()

    def strongconnect(v):
        work = [(v, iter(adj.get(v, [])))]
        index[v] = low[v] = next(counter)
        stack.append(v)
        onstack.add(v)
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
                low[work[-1][0]] = min(low[work[-1][0]], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(comp)

    for v in sorted(present):
        if v not in index:
            strongconnect(v)
    want = {u: min(comp) for comp in sccs for u in comp}
    assert got == want, (es, got, want)


def test_scc_forced_distributed_equals_tarjan_endgame(monkeypatch):
    """Force the distributed trim + forward-backward coloring path
    (endgame gate at 0) and assert it matches the gated (in-process
    Tarjan) result on a mixed graph of cycles, tendrils and a chain."""
    import numpy as np
    import pandas as pd
    import ray.data

    import kgtk_ray.ops.graph as G

    rng = np.random.default_rng(5)
    n = 10
    nodes = [f"w{i:02d}" for i in range(n)]
    es = sorted({(nodes[int(a)], nodes[int(b)])
                 for a, b in rng.integers(0, n, size=(2 * n, 2))}
                | {("c1", "c2"), ("c2", "c3"), ("c3", "c1"),
                   ("t1", "t2"), ("t2", "t3")})
    ds = ray.data.from_pandas(pd.DataFrame(
        [(s, "p", o) for s, o in es], columns=["node1", "label", "node2"]))
    gated = G.connected_components(ds, strong=True).to_pandas()
    monkeypatch.setattr(G, "SCC_LOCAL_EDGE_LIMIT", 0)
    dist = G.connected_components(ds, strong=True).to_pandas()
    assert dict(zip(dist.node1, dist.node2)) == \
        dict(zip(gated.node1, gated.node2))


def test_wcc_forced_distributed_equals_unionfind_endgame(monkeypatch):
    """Force the distributed min-label path (endgame gate at 0) and
    assert it matches the gated union-find on a multi-component
    graph."""
    import pandas as pd
    import ray.data

    import kgtk_ray.ops.graph as G
    es = [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z"), ("c", "a")]
    ds = ray.data.from_pandas(pd.DataFrame(
        [(s, "p", o) for s, o in es], columns=["node1", "label", "node2"]))
    gated = G.connected_components(ds).to_pandas()
    monkeypatch.setattr(G, "SCC_LOCAL_EDGE_LIMIT", 0)
    dist = G.connected_components(ds).to_pandas()
    assert dict(zip(dist.node1, dist.node2)) == \
        dict(zip(gated.node1, gated.node2)) == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_graph_statistics_edges_with_hits(ray_session):
    """compute_hits=True appends vertex_hubs / vertex_auth rows per
    vertex with ids continuing the per-vertex interleaved numbering
    (reference kgtk/cli/graph_statistics.py:160-178), on both the dense
    and the forced-distributed assembly; *_prop renames reach both the
    label and the id."""
    import pandas as pd
    import ray.data as rd
    import kgtk_ray.ops.graph as G
    e = rd.from_pandas(pd.DataFrame({
        "node1": ["a", "a", "b", "c"],
        "label": ["p"] * 4,
        "node2": ["x", "y", "x", "y"],
    }))
    out = G.graph_statistics_edges(e, iters=30, compute_hits=True,
                                   hubs_prop="hubZ").to_pandas()
    # 5 vertices x 5 stats (in, out, pagerank, hubs, auth)
    assert len(out) == 25
    assert set(out.label) == {"vertex_in_degree", "vertex_out_degree",
                              "vertex_pagerank", "hubZ", "vertex_auth"}
    a_rows = out[out.node1 == "a"].sort_values(
        "id", key=lambda s: s.str.rsplit("-", n=1).str[-1].astype(int))
    assert list(a_rows.label) == ["vertex_in_degree", "vertex_out_degree",
                                  "vertex_pagerank", "hubZ", "vertex_auth"]
    assert list(a_rows.id) == [f"a-{l}-{i}" for i, l in
                               enumerate(a_rows.label)]
    # hub/auth scores: a emits 2 of 4 edges -> top hub; x,y are the
    # only authorities
    hubs = {r.node1: float(r.node2) for r in
            out[out.label == "hubZ"].itertuples()}
    assert hubs["a"] == max(hubs.values()) > 0
    assert hubs["x"] == hubs["y"] == 0.0
    auth = {r.node1: float(r.node2) for r in
            out[out.label == "vertex_auth"].itertuples()}
    assert auth["x"] > 0 and auth["y"] > 0 and auth["a"] == 0.0
    # forced-distributed assembly agrees exactly
    old = G.DENSE_NODE_LIMIT
    try:
        G.DENSE_NODE_LIMIT = 0
        slow = G.graph_statistics_edges(
            e, iters=30, compute_hits=True, hubs_prop="hubZ").to_pandas()
    finally:
        G.DENSE_NODE_LIMIT = old
    f = out.sort_values("id").reset_index(drop=True)
    s = slow.sort_values("id").reset_index(drop=True)
    nonpr = f.label != "vertex_pagerank"
    pd.testing.assert_frame_equal(f[nonpr].reset_index(drop=True),
                                  s[nonpr].reset_index(drop=True))
