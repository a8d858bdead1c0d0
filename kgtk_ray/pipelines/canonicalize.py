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
from ..ops.shuffle import compact, compact_sorted
from ..ops.validate import clean_edges

Dataset = ray.data.Dataset


def canonicalize(edges: Dataset, *, value_columns=("node2",),
                 id_style: str = "node1-label-node2",
                 sort_output: bool = True) -> Dataset:
    """clean -> compact(dedup+merge) -> add-id -> sort(node1).

    With ``sort_output`` the compact and the sort collapse into ONE
    range-partition exchange (:func:`~kgtk_ray.ops.compact_sorted`):
    the sort's partitioner colocates every key, so the grouped merge
    runs per sorted block and the output needs no second all-to-all —
    add-id is an order-preserving map after it."""
    ds = clean_edges(edges, list(value_columns))
    if sort_output:
        return add_id(compact_sorted(ds, ["node1", "label", "node2"]),
                      style=id_style)
    ds = compact(ds, ["node1", "label", "node2"])
    return add_id(ds, style=id_style)
