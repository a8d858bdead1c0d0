"""KGTK-style canonicalization of an extracted edge stream.

The curate-and-canonicalize chain of the reference (SURVEY §3.3:
clean-data -> compact --build-id -> sort -> lift) re-expressed as one
Dataset pipeline:

  1. validate/repair cell values (vectorized kernels),
  2. dedup + qualifier-merge via the two-phase compact shuffle
     (per-batch combiner absorbs head-entity skew before the exchange),
  3. content-derived edge IDs (node1-label-node2 — idempotent across
     reruns, no global sequence),
  4. distributed sort by node1 for the final edge-file layout.
"""
from __future__ import annotations

import ray.data

from ..ops.core import add_id
from ..ops.shuffle import compact, sort_edges
from ..ops.validate import clean_edges

Dataset = ray.data.Dataset


def canonicalize(edges: Dataset, *, value_columns=("node2",),
                 id_style: str = "node1-label-node2",
                 sort_output: bool = True) -> Dataset:
    """clean -> compact(dedup+merge) -> add-id -> sort(node1)."""
    ds = clean_edges(edges, list(value_columns))
    ds = compact(ds, ["node1", "label", "node2"])
    ds = add_id(ds, style=id_style)
    if sort_output:
        ds = sort_edges(ds, ["node1", "label", "node2"])
    return ds
