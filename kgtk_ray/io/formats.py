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


# SQID-UI datatype aliases, as in the reference's JsonGenerator
# (/root/reference/kgtk/generator.py:529-556)
_MEDIAWIKI_DATATYPES = {
    "item": "wikibase-item", "WikibaseItem": "wikibase-item",
    "property": "wikibase-item", "WikibaseProperty": "wikibase-item",
    "time": "time", "Time": "time",
    "globe-coordinate": "globe-coordinate",
    "GlobeCoordinate": "globe-coordinate",
    "quantity": "quantity", "Quantity": "quantity",
    "monolingualtext": "monolingualtext",
    "Monolingualtext": "monolingualtext",
    "string": "string", "String": "string",
    "external-identifier": "external-id", "ExternalId": "external-id",
    "url": "url", "Url": "url",
}


def generate_mediawiki_jsons(
    edges: Dataset,
    *,
    label_props: tuple = ("label",),
    description_props: tuple = ("description",),
    alias_props: tuple = ("alias",),
    data_type_prop: str = "data_type",
) -> Dataset:
    """KGTK edges -> mediawiki-API-shaped entity JSON (reference
    `generate-mediawiki-jsons`: JsonGenerator,
    /root/reference/kgtk/generator.py:521-640 + cli/generate_mediawiki_jsons.py).

    Per entity (node1): ``labels`` / ``descriptions`` / ``aliases``
    sections from the configured properties, everything else under
    ``claims`` with the property's datatype resolved from
    ``data_type`` declaration edges (collected in a first small pass
    and broadcast — the reference preloads them from its prop file,
    generator.py:222-239).  Output ``(qnode, doc)`` rows; the render
    is deterministic (sorted keys / sorted values).
    """
    import ray

    dt_rows = edges.map_batches(
        lambda df: df.loc[df["label"] == data_type_prop, ["node1", "node2"]],
        batch_format="pandas").to_pandas()
    prop_types = {
        p: _MEDIAWIKI_DATATYPES.get(t, "string")
        for p, t in zip(dt_rows["node1"], dt_rows["node2"])
    }
    ref = ray.put(prop_types)
    lbl, desc, ali = set(label_props), set(description_props), set(alias_props)

    def build(df: pd.DataFrame) -> pd.DataFrame:
        ptypes = ray.get(ref)
        df = df[df["label"] != data_type_prop]
        g = (df.sort_values(["node1", "label", "node2"], kind="mergesort")
             .groupby(["node1", "label"], sort=False)["node2"]
             .agg(list).reset_index())
        docs = []
        for qnode, sub in g.groupby("node1", sort=False):
            doc: dict = {"id": qnode, "type": "item", "labels": {},
                         "descriptions": {}, "aliases": {}, "claims": {}}
            for prop, values in zip(sub["label"], sub["node2"]):
                if prop in lbl:
                    doc["labels"]["en"] = {"language": "en",
                                           "value": values[0]}
                elif prop in desc:
                    doc["descriptions"]["en"] = {"language": "en",
                                                 "value": values[0]}
                elif prop in ali:
                    doc["aliases"]["en"] = [
                        {"language": "en", "value": v} for v in values]
                else:
                    doc["claims"][prop] = [{
                        "mainsnak": {
                            "snaktype": "value",
                            "property": prop,
                            "datatype": ptypes.get(prop, "string"),
                            "datavalue": {"value": v},
                        },
                        "type": "statement",
                        "rank": "normal",
                    } for v in values]
            docs.append((qnode, json.dumps(doc, sort_keys=True)))
        return pd.DataFrame(docs, columns=["qnode", "doc"])

    from ..ops._bucket import bucketed_group_apply
    return bucketed_group_apply(edges, ["node1"], build)


# ---------------------------------------------------------------------------
# KgtkWriter output formats (reference kgtk/io/kgtkwriter.py:32-61
# format list; cell reformatting :393-520)
# ---------------------------------------------------------------------------

def _reformat_cell(value: str, fmt: str) -> str:
    """One cell per the reference's join_csv / join_tsv rules."""
    from ..format import unstringify

    if fmt == "kgtk":
        return value
    if value.startswith("^"):
        # reformat_datetime (:393): strip the sigil
        return value[1:]
    if fmt == "csv":
        if value.startswith(('"', "'")):
            value = value.replace('"|"', "|")
            value = unstringify(value)
            return '"' + value.replace('"', '""') + '"'
        value = value.replace("\\|", "|")
        if '"' in value or "," in value:
            return '"' + value.replace('"', '""') + '"'
        return value
    # tsv family
    if value.startswith(('"', "'")):
        if fmt == "tsv-unquoted":
            value = value.replace('"|"', "|")
            return unstringify(value)
        if fmt == "tsv-csvlike":
            value = value.replace('"|"', "|")
            value = unstringify(value)
            return '"' + value.replace('"', '""') + '"'
        return value.replace("\\|", "|")
    return value.replace("\\|", "|")


def _json_cell(value: str):
    """reformat_value_for_json (:484-507)."""
    from ..format import unstringify

    if value.startswith(('"', "'")):
        return unstringify(value.replace('"|"', "|"))
    if value == "True":
        return True
    if value == "False":
        return False
    if value.isdigit() or (value.startswith(("+", "-"))
                           and value[1:].isdigit()):
        return int(value)
    return value


def format_lines(ds: Dataset, fmt: str = "kgtk") -> Dataset:
    """Distributed formatting of edge rows into output lines for the
    reference's KgtkWriter formats: ``kgtk`` / ``tsv`` (verbatim,
    datetime sigils kept for kgtk only), ``csv``, ``tsv-unquoted``,
    ``tsv-csvlike``, ``md``, ``jsonl`` (row arrays), ``jsonl-map`` /
    ``jsonl-map-compact`` (column-keyed objects).  Returns a Dataset
    with one ``line`` column; the header line is NOT included (see
    :func:`write_kgtk_file`)."""
    import json

    schema = ds.schema()
    cols = schema.names if schema is not None else []
    sep = "," if fmt == "csv" else "\t"

    def f(df: pd.DataFrame) -> pd.DataFrame:
        sdf = df.astype(str)
        if fmt in ("jsonl", "jsonl-map", "jsonl-map-compact",
                   "json", "json-map", "json-map-compact"):
            # the whole-file json variants are the jsonl lines with a
            # trailing comma on EVERY row, wrapped in "["..."]" by the
            # writer (reference kgtkwriter.py:639-649: the reference
            # emits the trailing comma unconditionally, last row
            # included — mirrored for byte parity)
            wholefile = fmt == "json" or fmt.startswith("json-")
            suffix = "," if wholefile else ""
            # the reference writes the whole-file variants with compact
            # separators (kgtkwriter.py:639)
            seps = (",", ":") if wholefile else None
            lines = []
            for row in sdf.itertuples(index=False):
                vals = [_json_cell(v) for v in row]
                if fmt in ("jsonl", "json"):
                    lines.append(json.dumps(vals, separators=seps) + suffix)
                else:
                    compact = fmt.endswith("compact")
                    obj = {c: v for c, v, raw in zip(cols, vals, row)
                           if raw or not compact}
                    lines.append(json.dumps(obj, separators=seps) + suffix)
        elif fmt == "md":
            lines = [
                "|" + "".join(" " + v.replace("|", "\\|") + " |"
                              for v in row)
                for row in sdf.itertuples(index=False)
            ]
        else:
            out_cols = [sdf[c].map(lambda v: _reformat_cell(v, fmt))
                        for c in cols]
            lines = out_cols[0].str.cat(out_cols[1:], sep=sep)
        return pd.DataFrame({"line": lines})

    return ds.map_batches(f, batch_format="pandas")


def _open_text_out(path: str):
    """Text writer that compresses by output extension, as the
    reference writer does (kgtk/io/kgtkwriter.py:162-180 routes
    .gz/.bz2/.xz/.lz4 through codec file objects).  gz/bz2/xz are
    stdlib; lz4/zst go through Arrow's codec stream."""
    p = str(path)
    if p.endswith(".gz"):
        import gzip
        return gzip.open(p, "wt", encoding="utf-8")
    if p.endswith(".bz2"):
        import bz2
        return bz2.open(p, "wt", encoding="utf-8")
    if p.endswith(".xz"):
        import lzma
        return lzma.open(p, "wt", encoding="utf-8")
    if p.endswith((".lz4", ".zst")):
        import io as _io

        import pyarrow as _pa
        codec = "lz4" if p.endswith(".lz4") else "zstd"
        raw = _pa.output_stream(p, compression=codec)

        class _Text:
            def write(self, s: str):
                raw.write(s.encode("utf-8"))

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                raw.close()

        return _Text()
    return open(p, "w")


def write_kgtk_file(ds: Dataset, path: str, *, fmt: str = "kgtk") -> None:
    """Stream a Dataset to ONE file in the given KgtkWriter format,
    header first (csv/tsv headers, ``|``-framed md header, none for
    jsonl variants); a ``.gz/.bz2/.xz/.lz4/.zst`` extension on the
    destination compresses the stream, as in the reference writer.
    Streaming consumption (``iter_batches``) — the dataset never
    materializes; at 100 TB write partitioned Parquet or the
    ``format_lines`` dataset instead."""
    schema = ds.schema()
    if schema is None:
        # a chain that dropped every row of a zero-block read loses its
        # schema; emit an empty file rather than crash (the header is
        # unrecoverable at this point)
        with _open_text_out(path):
            pass
        return
    cols = schema.names
    lines = format_lines(ds, fmt)
    with _open_text_out(path) as f:
        if fmt == "md":
            f.write("|" + "".join(f" {c} |" for c in cols) + "\n")
            f.write("|" + "".join(" -- |" for _ in cols) + "\n")
        elif fmt == "csv":
            f.write(",".join(cols) + "\n")
        elif fmt == "json":
            # whole-file array: "[", header array + ",", rows + ",",
            # "]" (reference kgtkwriter.py:534-536,639,669-672)
            import json as _json
            f.write("[\n")
            f.write(_json.dumps(cols, separators=(",", ":")) + ",\n")
        elif fmt in ("json-map", "json-map-compact"):
            # "[" only — the reference's close() appends "]" solely for
            # the "json" format (kgtkwriter.py:537-541,669-672), so the
            # map variants emit an unterminated array; mirrored for
            # byte parity
            f.write("[\n")
        elif fmt not in ("jsonl", "jsonl-map", "jsonl-map-compact"):
            f.write("\t".join(cols) + "\n")
        for batch in lines.iter_batches(batch_format="pandas"):
            for line in batch["line"]:
                f.write(line + "\n")
        if fmt == "json":
            f.write("]\n")
