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
