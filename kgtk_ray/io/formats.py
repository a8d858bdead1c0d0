"""Export formats beyond Parquet/KGTK-TSV.

Covers the reference's writer formats (md/json/jsonl —
/root/reference/kgtk/io/kgtkwriter.py:32-61,476-520) and the graph
exporters (`export-neo4j` /root/reference/kgtk/cli/export_neo4j.py,
`export-wikidata` /root/reference/kgtk/exports/exportwikidata.py).

Everything stays a Dataset of strings until the sink so the render is
embarrassingly parallel; only ``to_markdown`` (a debug view, like the
reference's ``md`` command) materializes on the driver.
"""
from __future__ import annotations

import json

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def to_markdown(ds: Dataset, *, limit: int = 50) -> str:
    """GitHub-markdown table of the first ``limit`` rows (reference
    kgtk/cli/md.py + kgtk/io/kgtkwriter.py:476-483).  Debug-only."""
    df = ds.limit(limit).to_pandas()
    cols = list(df.columns)
    lines = ["| " + " | ".join(cols) + " |",
             "| " + " | ".join("--" for _ in cols) + " |"]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(str(v).replace("|", "\\|")
                                       for v in row) + " |")
    return "\n".join(lines)


def write_jsonl(ds: Dataset, path: str) -> None:
    """JSON-lines sink (reference 'jsonl' output format,
    kgtk/io/kgtkwriter.py:55-61) — one task per block, resumable layout."""
    ds.write_json(path)


def export_neo4j(edges: Dataset, *, node_label: str = "Node") -> Dataset:
    """Edges -> Cypher CREATE statements (reference
    kgtk/cli/export_neo4j.py builds an in-memory NodeStore then prints;
    here each batch renders independently — relationships use MATCH on
    node ids so no global store is needed).

    Returns a Dataset with one ``cypher`` statement per edge row.
    """

    def render(df: pd.DataFrame) -> pd.DataFrame:
        n1 = df["node1"].astype(str).str.replace("'", "\\'", regex=False)
        n2 = df["node2"].astype(str).str.replace("'", "\\'", regex=False)
        rel = (df["label"].astype(str)
               .str.replace(r"[^A-Za-z0-9_]", "_", regex=True).str.upper())
        stmt = ("MATCH (a:" + node_label + " {id: '" + n1 + "'}), (b:"
                + node_label + " {id: '" + n2 + "'}) CREATE (a)-[:"
                + rel + "]->(b);")
        return pd.DataFrame({"cypher": stmt})

    return edges.map_batches(render, batch_format="pandas")


def export_neo4j_nodes(edges: Dataset, *, node_label: str = "Node") -> Dataset:
    """Distinct node CREATE statements for :func:`export_neo4j`."""

    def nodes(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.concat([df["node1"], df["node2"]]).astype(str).drop_duplicates()
        return pd.DataFrame({"node": vals})

    from ..ops._bucket import bucketed_group_apply
    uniq = bucketed_group_apply(
        edges.map_batches(nodes, batch_format="pandas"), ["node"],
        lambda df: df.drop_duplicates("node"))

    def render(df: pd.DataFrame) -> pd.DataFrame:
        n = df["node"].astype(str).str.replace("'", "\\'", regex=False)
        return pd.DataFrame({"cypher": "CREATE (:" + node_label
                             + " {id: '" + n + "'});"})

    return uniq.map_batches(render, batch_format="pandas")


def export_entities_json(edges: Dataset, *, qual_columns: tuple = ()) -> Dataset:
    """Group edges by node1 and render one deterministic JSON document
    per entity — the shape of the reference's export-wikidata
    (kgtk/exports/exportwikidata.py requires input grouped by qnode,
    GroupedReader.fetch :17-60; here the grouping is a hash shuffle).

    Output: ``(qnode, doc)`` where doc is
    ``{"id": qnode, "claims": {label: [node2, ...sorted]}}`` serialized
    with sorted keys so the render is order-independent.
    """

    def build(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per bucket: group claim values at C speed, then one
        json.dumps per entity (the irreducible Python part)."""
        g = (df.sort_values(["node1", "label", "node2"], kind="mergesort")
             .groupby(["node1", "label"], sort=False)["node2"]
             .agg(list).reset_index())
        docs = []
        for qnode, sub in g.groupby("node1", sort=False):
            claims = dict(zip(sub["label"], sub["node2"]))
            docs.append((qnode, json.dumps({"id": qnode, "claims": claims},
                                           sort_keys=True)))
        return pd.DataFrame(docs, columns=["qnode", "doc"])

    from ..ops._bucket import bucketed_group_apply
    return bucketed_group_apply(edges, ["node1"], build)
