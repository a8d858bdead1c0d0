"""Wikidata JSON-dump import / export as Ray Data batch transforms.

The reference's ``import-wikidata`` (/root/reference/kgtk/cli/
import_wikidata.py) reads a dump line-by-line on the driver, fans
entity JSON out to N worker processes (pyrallel, :1214-1246), each
emitting node/edge/qualifier rows to its own fragment files, then
concatenates fragments (:1251-1278).  Ray Data already IS that
architecture — a Dataset of JSON lines, ``flat_map``-style batch
parsing in parallel tasks, fragment-per-task Parquet output — so the
importer here is a single ``map_batches`` emitting a tagged row stream
(``file`` column: node/edge/qualifier), with ``split_wikidata``
filtering the three output tables.

Parsing mirrors the reference's claim flattening
(MyMapper.process, import_wikidata.py:569-581; snak value handling):
wikibase-entityid -> Qid symbol, string -> KGTK '"string"', quantity ->
amount[+unit], time -> ^iso, monolingualtext -> 'text'@lang.
"""
from __future__ import annotations

import json

import pandas as pd
import ray.data

Dataset = ray.data.Dataset


def _snak_value(snak: dict) -> str:
    dv = snak.get("datavalue")
    if not dv:
        return ""
    t, v = dv.get("type"), dv.get("value")
    if t == "wikibase-entityid":
        return v.get("id", "")
    if t == "string":
        return '"' + str(v) + '"'
    if t == "quantity":
        amount = str(v.get("amount", "")).lstrip("+")
        unit = v.get("unit", "1")
        if unit and unit != "1":
            return amount + "Q" + unit.rsplit("Q", 1)[-1]
        return amount
    if t == "time":
        return "^" + str(v.get("time", "")).lstrip("+")
    if t == "monolingualtext":
        return "'" + str(v.get("text", "")) + "'@" + str(v.get("language", ""))
    if t == "globecoordinate":
        return f"@{v.get('latitude')}/{v.get('longitude')}"
    return ""


def _parse_entities(df: pd.DataFrame, line_col: str, lang: str) -> pd.DataFrame:
    out: list[tuple[str, str, str, str, str]] = []  # file,node1/id,label,node2,id
    for line in df[line_col]:
        line = str(line).strip().rstrip(",")
        if not line or line in ("[", "]"):
            continue
        try:
            ent = json.loads(line)
        except ValueError:
            continue
        qid = ent.get("id", "")
        if not qid:
            continue
        lbl = (ent.get("labels", {}).get(lang) or {}).get("value", "")
        desc = (ent.get("descriptions", {}).get(lang) or {}).get("value", "")
        aliases = "|".join(sorted(a.get("value", "")
                                  for a in ent.get("aliases", {}).get(lang, [])))
        out.append(("node", qid, lbl, desc, aliases))
        for prop, claims in sorted(ent.get("claims", {}).items()):
            for claim in claims:
                snak = claim.get("mainsnak", {})
                val = _snak_value(snak)
                if not val:
                    continue
                cid = claim.get("id", f"{qid}-{prop}-{val}").replace("$", "-")
                out.append(("edge", qid, prop, val, cid))
                for qprop, qsnaks in sorted(claim.get("qualifiers", {}).items()):
                    for qs in qsnaks:
                        qval = _snak_value(qs)
                        if qval:
                            out.append(("qualifier", cid, qprop, qval, ""))
    return pd.DataFrame(out, columns=["file", "node1", "label", "node2", "id"])


def import_wikidata(lines: Dataset, *, line_col: str = "line",
                    lang: str = "en") -> Dataset:
    """Wikidata JSON lines -> tagged row stream.

    ``file`` column: ``node`` rows are ``(node1=qid, label=label,
    node2=description, id=aliases)``; ``edge`` rows are ``(node1=qid,
    label=property, node2=value, id=claim-id)``; ``qualifier`` rows are
    ``(node1=claim-id, label=property, node2=value)``.  Use
    :func:`split_wikidata` for the three per-kind datasets.
    """
    return lines.map_batches(
        lambda df: _parse_entities(df, line_col, lang), batch_format="pandas")


def split_wikidata(tagged: Dataset) -> tuple[Dataset, Dataset, Dataset]:
    """(nodes, edges, qualifiers) from the tagged stream.  Filtering is a
    zero-copy Arrow mask; materialize the tagged stream first if all
    three outputs are consumed, to parse only once."""
    def pick(kind: str, cols: dict[str, str]):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["file"] == kind]
            return (sub[list(cols)].rename(columns=cols)
                    .reset_index(drop=True))
        return tagged.map_batches(f, batch_format="pandas")

    nodes = pick("node", {"node1": "id", "label": "label",
                          "node2": "description", "id": "alias"})
    edges = pick("edge", {"id": "id", "node1": "node1", "label": "label",
                          "node2": "node2"})
    quals = pick("qualifier", {"node1": "node1", "label": "label",
                               "node2": "node2"})
    return nodes, edges, quals
