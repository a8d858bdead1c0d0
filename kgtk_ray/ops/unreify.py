"""Unreify RDF statements — collapse reified statement nodes back into
direct edges with qualifiers.

Reimplements the semantics of the reference's
``unreify-rdf-statements`` (/root/reference/kgtk/unreify/
kgtkunreifyrdfstatements.py:20-27 trigger constants, :170-240 group
processing): a node with a ``rdf:type rdf:Statement`` edge plus
``rdf:subject``/``rdf:predicate``/``rdf:object`` edges becomes one
direct edge ``(subject, predicate, object, id=statement-node)``; every
other edge hanging off the statement node is kept as a qualifier edge
(its node1 is the new edge id) with id ``<edge-id>-<n>``, zero-padded
to the group's attribute count (reference make_new_id
kgtkunreifyrdfstatements.py:327-340).  Multiple
subjects/predicates/objects produce the sorted cross-product
(:304-318), each product edge numbered ``<statement>-<n>`` and
carrying its own copy of the qualifier edges.  One divergence:
the reference numbers qualifier edges in input-file order; rows here
are unordered, so qualifiers are numbered in sorted (label, node2)
order — deterministic across block orders.

Where the reference buffers groups through an in-memory
``KgtkSortBuffer`` (single process), this is one hash-shuffle
``groupby(node1).map_groups`` — each statement node's edges are tiny,
so groups stay small and skew-free at any corpus size.
"""
from __future__ import annotations

import numpy as np
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
                  .merge(vals(object_label, "o"), on="node1")
                  .sort_values(["node1", "s", "p", "o"], kind="mergesort"))
        # per-statement product numbering: a single (s,p,o) keeps the
        # statement id; a cross-product numbers each edge
        # <statement>-<n> zero-padded to the product count
        g = direct.groupby("node1", sort=False)
        n_prod = g["s"].transform("size").to_numpy()
        seq = (g.cumcount() + 1).to_numpy()
        stmt = direct["node1"].to_numpy()
        main_id = np.where(
            n_prod == 1, stmt,
            [f"{sid}-{str(q).zfill(len(str(n)))}"
             for sid, q, n in zip(stmt, seq, n_prod)])
        direct_out = pd.DataFrame({
            "node1": direct["s"].to_numpy(), "label": direct["p"].to_numpy(),
            "node2": direct["o"].to_numpy(), "id": main_id})

        # qualifier edges: every non-core edge of the statement node,
        # copied under EACH product edge, numbered <edge-id>-<m>
        # zero-padded to the statement's attribute count
        attrs = sdf.loc[~sdf["label"].isin(core),
                        ["node1", "label", "node2"]].copy()
        attrs = attrs.sort_values(["node1", "label", "node2"],
                                  kind="mergesort")
        ag = attrs.groupby("node1", sort=False)
        attrs["_n"] = ag["label"].transform("size").to_numpy()
        attrs["_seq"] = (ag.cumcount() + 1).to_numpy()
        parents = pd.DataFrame({"node1": stmt, "_parent": main_id})
        att = attrs.merge(parents, on="node1")
        quals = pd.DataFrame({
            "node1": att["_parent"].to_numpy(),
            "label": att["label"].to_numpy(),
            "node2": att["node2"].to_numpy(),
            "id": [f"{p}-{str(q).zfill(len(str(n)))}"
                   for p, q, n in zip(att["_parent"], att["_seq"],
                                      att["_n"])],
        })
        return pd.concat([direct_out, quals, through], ignore_index=True)

    from ._bucket import bucketed_group_apply
    return bucketed_group_apply(edges, ["node1"], collapse)


def unreify_values(
    edges: Dataset,
    *,
    trigger_label: str,
    trigger_node2: str,
    value_label: str,
    old_label: str,
    new_label: str | None = None,
    allow_multiple_values: bool = False,
) -> Dataset:
    """Unreify value nodes (reference /root/reference/kgtk/unreify/
    kgtkunreifyvalues.py, worked examples docs/transform/unreify_values.md).

    The reference groups rows by ``node2`` when ``label == old_label``
    and by ``node1`` otherwise (make_keygen :60-79), which co-locates a
    value node's own edges with the edge referring to it.  A group
    unreifies when it contains a trigger edge (``trigger_label
    trigger_node2``), an old-label edge, and at least one value edge
    (:237-241); with ``allow_multiple_values=False`` (the default) a
    group holding several DISTINCT values refuses and passes through
    unchanged (:223-227).  On success the group collapses to one direct
    edge ``(old-edge node1, new_label or value_label, '|'-joined
    values, id=value-node)`` (write_new_edge :301-330) and every other
    edge of the value node becomes an attribute edge ``(value-node,
    label, node2, id=value-node-N)`` zero-padded to the attribute count
    (make_new_id :286-296, including the quoted-string id form).  An id
    column is appended when absent; untriggered rows pass through with
    an empty id (:380-400).

    Two documented divergences from the reference's input-order
    behavior (rows here are unordered): value lists and attribute
    numbering use sorted order, and when several old-label edges
    reference the same value node the lexicographically greatest node1
    wins (the reference keeps the input-file-last via plain assignment,
    :230-232 — the other referring edges are silently consumed either
    way).

    One bucketed shuffle total: the group key is row-local, so no
    pre-pass or broadcast is needed, and value-node groups are tiny at
    any corpus size.
    """
    from ._bucket import bucketed_group_apply

    out_label = new_label if new_label is not None else value_label

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if "id" not in df.columns:
            df["id"] = ""
        df["__k__"] = df["node1"].where(df["label"] != old_label,
                                        df["node2"])
        return df[["node1", "label", "node2", "id", "__k__"]]

    keyed = edges.map_batches(key_rows, batch_format="pandas")

    def new_id(key: str, seq: int, width: int) -> str:
        suffix = "-" + str(seq).zfill(width)
        if len(key) > 1 and key.startswith('"') and key.endswith('"'):
            return key[:-1] + suffix + '"'
        return key + suffix

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        k = df["__k__"]
        trig = (df["label"] == trigger_label) & (df["node2"] == trigger_node2)
        val = df["label"] == value_label
        old = df["label"] == old_label

        has_t = trig.groupby(k).any()
        has_o = old.groupby(k).any()
        nval = df["node2"].where(val).groupby(k).nunique()
        ok = has_t & has_o & (nval >= 1)
        if not allow_multiple_values:
            ok &= nval <= 1
        hit = k.map(ok).to_numpy()

        through = df.loc[~hit, ["node1", "label", "node2", "id"]]

        sub = df[hit]
        if sub.empty:
            return through.reset_index(drop=True)
        sk = sub["__k__"]
        s_trig, s_val, s_old = trig[hit], val[hit], old[hit]

        n1 = sub.loc[s_old].groupby("__k__")["node1"].max()
        vals = (sub.loc[s_val, ["__k__", "node2"]].drop_duplicates()
                .sort_values(["__k__", "node2"], kind="mergesort")
                .groupby("__k__")["node2"].agg("|".join))
        direct = pd.DataFrame({"node1": n1, "label": out_label,
                               "node2": vals, "id": n1.index})

        attrs = (sub.loc[~(s_trig | s_val | s_old),
                         ["__k__", "label", "node2"]]
                 .sort_values(["__k__", "label", "node2"], kind="mergesort"))
        ag = attrs.groupby("__k__", sort=False)
        cnt = ag["label"].transform("size").to_numpy()
        seq = (ag.cumcount() + 1).to_numpy()
        akey = attrs["__k__"].to_numpy()
        quals = pd.DataFrame({
            "node1": akey,
            "label": attrs["label"].to_numpy(),
            "node2": attrs["node2"].to_numpy(),
            "id": [new_id(p, q, len(str(n)))
                   for p, q, n in zip(akey, seq, cnt)],
        })
        return pd.concat([direct, quals, through], ignore_index=True)

    return bucketed_group_apply(keyed, ["__k__"], collapse)
