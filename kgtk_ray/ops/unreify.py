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

    core = {trigger_label, subject_label, predicate_label, object_label}

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over every statement group in the bucket: the
        subject×predicate×object cross-product is two pandas merges on
        the statement id; everything else is boolean masking."""
        trig = (df["label"] == trigger_label) & (df["node2"] == trigger_node2)
        stmt_ids = df.loc[trig, "node1"].unique()
        is_stmt = df["node1"].isin(stmt_ids)

        through = df.loc[~is_stmt, ["node1", "label", "node2"]].copy()
        through["id"] = ""

        sdf = df[is_stmt]

        def vals(lab: str, out: str) -> pd.DataFrame:
            v = sdf.loc[sdf["label"] == lab, ["node1", "node2"]]
            return v.drop_duplicates().rename(columns={"node2": out})

        direct = (vals(subject_label, "s")
                  .merge(vals(predicate_label, "p"), on="node1")
                  .merge(vals(object_label, "o"), on="node1"))
        direct = pd.DataFrame({"node1": direct["s"], "label": direct["p"],
                               "node2": direct["o"], "id": direct["node1"]})

        quals = sdf.loc[~sdf["label"].isin(core), ["node1", "label", "node2"]].copy()
        quals["id"] = ""
        return pd.concat([direct, quals, through], ignore_index=True)

    from ._bucket import bucketed_group_apply
    return bucketed_group_apply(edges, ["node1"], collapse)
