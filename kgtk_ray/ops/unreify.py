"""Unreify RDF statements — collapse reified statement nodes back into
direct edges with qualifiers.

Reimplements the semantics of the reference's
``unreify-rdf-statements`` (/root/reference/kgtk/unreify/
kgtkunreifyrdfstatements.py:20-27 trigger constants, :170-240 group
processing): a node with a ``rdf:type rdf:Statement`` edge plus
``rdf:subject``/``rdf:predicate``/``rdf:object`` edges becomes one
direct edge ``(subject, predicate, object, id=statement-node)``; every
other edge hanging off the statement node is kept as a qualifier edge
(its node1 is the new edge id).  Multiple subjects/predicates/objects
produce the cross-product (reference allows multiples by default,
:43-45).

Where the reference buffers groups through an in-memory
``KgtkSortBuffer`` (single process), this is one hash-shuffle
``groupby(node1).map_groups`` — each statement node's edges are tiny,
so groups stay small and skew-free at any corpus size.
"""
from __future__ import annotations

import itertools

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def unreify_rdf_statements(
    edges: Dataset,
    *,
    trigger_label: str = "rdf:type",
    trigger_node2: str = "rdf:Statement",
    subject_label: str = "rdf:subject",
    predicate_label: str = "rdf:predicate",
    object_label: str = "rdf:object",
) -> Dataset:
    """One shuffle on node1; statement groups collapse, everything else
    passes through unchanged."""

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        is_trigger = (df["label"] == trigger_label) & (df["node2"] == trigger_node2)
        if not is_trigger.any():
            out = df[["node1", "label", "node2"]].copy()
            out["id"] = ""
            return out
        stmt = str(df["node1"].iloc[0])
        subs = sorted(df.loc[df["label"] == subject_label, "node2"].unique())
        preds = sorted(df.loc[df["label"] == predicate_label, "node2"].unique())
        objs = sorted(df.loc[df["label"] == object_label, "node2"].unique())
        rows = [(s, p, o, stmt)
                for s, p, o in itertools.product(subs, preds, objs)]
        core = {trigger_label, subject_label, predicate_label, object_label}
        quals = df[~df["label"].isin(core)]
        rows += [(stmt, l, v, "") for l, v in zip(quals["label"], quals["node2"])]
        return pd.DataFrame(rows, columns=["node1", "label", "node2", "id"])

    return edges.groupby("node1").map_groups(collapse, batch_format="pandas")
