"""Tabular importers — the reference family
``import-conceptnet/wordnet/framenet/visualgenome/atomic/concept-pairs``
(/root/reference/kgtk/cli/import_conceptnet.py:50 ``row_to_edge`` et al.)
are all per-row projections of a CSV/TSV into edge rows.  One generic
vectorized projection covers the family; specific importers are thin
configurations of it.
"""
from __future__ import annotations

from typing import Mapping

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def edges_from_table(
    ds: Dataset,
    *,
    node1_col: str,
    label_col: str | None = None,
    node2_col: str,
    label_value: str | None = None,
    extra: Mapping[str, str] | None = None,
    prefix_node1: str = "",
    prefix_node2: str = "",
) -> Dataset:
    """Project arbitrary tabular rows into KGTK edges
    ``(node1, label, node2[, extra...])``.

    Either ``label_col`` (a column holding the predicate) or
    ``label_value`` (a constant predicate) must be given.  ``extra``
    maps output qualifier column -> input column.  Pure ``map_batches``.
    """
    if (label_col is None) == (label_value is None):
        raise ValueError("exactly one of label_col / label_value required")
    extra = dict(extra or {})

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = {
            "node1": prefix_node1 + df[node1_col].astype(str),
            "label": (df[label_col].astype(str) if label_col
                      else pd.Series(label_value, index=df.index)),
            "node2": prefix_node2 + df[node2_col].astype(str),
        }
        for oc, ic in extra.items():
            out[oc] = df[ic].astype(str)
        return pd.DataFrame(out)

    return ds.map_batches(f, batch_format="pandas")


def import_conceptnet_like(csv_path: str, *, node1_col: str = "start",
                           label_col: str = "rel", node2_col: str = "end") -> Dataset:
    """CSV -> edges, the import-conceptnet shape
    (kgtk/cli/import_conceptnet.py)."""
    import pyarrow.csv as pacsv
    ds = ray.data.read_csv(
        csv_path, parse_options=pacsv.ParseOptions(delimiter="\t"))
    return edges_from_table(ds, node1_col=node1_col, label_col=label_col,
                            node2_col=node2_col)
