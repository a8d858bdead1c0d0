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
    new_label: str | None = None,
) -> Dataset:
    """Unreify value nodes (reference /root/reference/kgtk/unreify/
    kgtkunreifyvalues.py: a node carrying ``trigger_label trigger_node2``
    plus a ``value_label`` edge collapses into direct edges
    ``(referrer, new_label, value)`` for every edge that pointed AT the
    value node; its remaining edges become qualifiers).

    Needs the value node's inbound edges grouped with its outbound ones:
    one bucketed shuffle keyed on the value-node id (inbound rows are
    re-keyed by node2 first).
    """
    import ray

    from ._bucket import bucketed_group_apply

    out_label = new_label if new_label is not None else value_label

    # pass 1: the value-node ids (distinct trigger subjects).  Size-gated:
    # under BROADCAST_LIMIT the set ships once via ray.put and membership
    # is a vectorized isin (one shuffle total); above it — a reified dump
    # has an edge-scale value-node set — nothing is collected: two left
    # hash joins annotate each edge with "node1 is a value node" /
    # "node2 is a value node" flags instead (three shuffles total).
    from .shuffle import BROADCAST_LIMIT

    trig = edges.map_batches(
        lambda df: df.loc[(df["label"] == trigger_label)
                          & (df["node2"] == trigger_node2), ["node1"]]
        .drop_duplicates(),
        batch_format="pandas").materialize()

    if trig.count() <= BROADCAST_LIMIT:
        vids = set(trig.to_pandas()["node1"].astype(str))
        vref = ray.put(vids)

        # re-key referring edges by the value node they point at so one
        # bucketed shuffle co-locates them with the value node's own
        # edges (its value_label edge in particular).
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(vref)
            df = df.copy()
            n1v = df["node1"].astype(str).isin(v)
            df["__isv__"] = n1v
            df["__in__"] = df["node2"].astype(str).isin(v) & ~n1v
            df["__k__"] = df["node1"].astype(str).where(
                ~df["__in__"], df["node2"].astype(str))
            return df

        both = edges.map_batches(tag, batch_format="pandas")
    else:
        import pyarrow as pa

        from ._bucket import bucketed_join

        vm = trig.map_batches(
            lambda df: pd.DataFrame({"__k__": df["node1"].astype(str),
                                     "__m__": np.int8(1)}),
            batch_format="pandas")
        vm_fields = {"__k__": pa.string(), "__m__": pa.int8()}
        e_fields = {"__k__": pa.string(), "node1": pa.string(),
                    "label": pa.string(), "node2": pa.string()}

        def key_on(col: str):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                out = df[["node1", "label", "node2"]].astype(str).copy()
                out["__k__"] = out[col]
                return out
            return f

        e1 = bucketed_join(
            edges.map_batches(key_on("node1"), batch_format="pandas"),
            vm, "__k__", left_fields=e_fields, right_fields=vm_fields,
            how="left").map_batches(
            lambda df: df.assign(__isv__=df["__m__"].notna())
            .drop(columns=["__m__", "__k__"]),
            batch_format="pandas")
        e1_fields = {"__k__": pa.string(), "node1": pa.string(),
                     "label": pa.string(), "node2": pa.string(),
                     "__isv__": pa.bool_()}
        e2 = bucketed_join(
            e1.map_batches(lambda df: df.assign(__k__=df["node2"]),
                           batch_format="pandas"),
            vm, "__k__", left_fields=e1_fields, right_fields=vm_fields,
            how="left")

        def finish_flags(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            isv = df["__isv__"].astype(bool)
            df["__isv__"] = isv
            df["__in__"] = df["__m__"].notna() & ~isv
            df["__k__"] = df["node1"].where(~df["__in__"], df["node2"])
            return df.drop(columns=["__m__"])

        both = e2.map_batches(finish_flags, batch_format="pandas")

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        is_v = df["__isv__"]
        through = df.loc[~df["__in__"] & ~is_v, ["node1", "label", "node2"]]
        vals = (df.loc[is_v & ~df["__in__"] & (df["label"] == value_label),
                       ["node1", "node2"]]
                .rename(columns={"node1": "__v__", "node2": "val"}))
        inbound = (df.loc[df["__in__"], ["node1", "label", "node2"]]
                   .rename(columns={"node2": "__v__"}))
        direct = inbound.merge(vals, on="__v__")
        direct = pd.DataFrame({"node1": direct["node1"],
                               "label": out_label,
                               "node2": direct["val"]})
        quals = df.loc[is_v & ~df["__in__"]
                       & ~df["label"].isin({trigger_label, value_label}),
                       ["node1", "label", "node2"]]
        return pd.concat([direct, quals, through], ignore_index=True)

    return bucketed_group_apply(both, ["__k__"], collapse)
