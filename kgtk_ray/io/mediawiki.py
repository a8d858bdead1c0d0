"""generate-mediawiki-jsons with the reference's exact document bytes.

Reimplements the semantics of the reference's ``JsonGenerator``
(/root/reference/kgtk/generator.py:521-1166) as Dataset transforms:
KGTK edges become one mediawiki-API JSON document per entity, BYTE-
IDENTICAL per document to the reference's own golden files
(kgtk/tests/data/{dates0,P100,Q571604390,ranked0}.jsonl — replayed in
tests/test_mediawiki_golden.py), including the reference's quirks:

* the ``"languange"`` key typo in label/description/alias records
  (generator.py:712-728) and the nested ``{lang: {...}}`` alias list;
* quantity's ``"UpperBound"`` capitalization (:953) and
  ``numpy.format_float_positional(trim='-')`` number cleaning (:141);
* the legacy ``yyyy-mm-dd`` date branch that emits
  ``<date>-00-00T00:00:00Z`` (:833-838);
* statement ids ``node1+prop+node2``, ``hash: ""``, ``pageid: -1`` /
  ``lastrevid: "2000-01-01T00:00:00Z"`` info fields, and the exact
  key INSERTION order of every dict (the reference serializes with
  plain ``json.dump`` — no sort_keys).

Sequential semantics re-expressed order-independently:

* the reference flags a row as a qualifier when its node1 equals the
  id of the immediately preceding statement; here a row is a
  qualifier iff its node1 appears in the STATEMENT id set (equivalent
  for well-formed KGTK files, where qualifier rows reference their
  statement's unique id) — one semi/anti split
  (:func:`kgtk_ray.ops.shuffle.ifexists`, size-gated broadcast);
* "file order" (claims-list order, alias order, qualifier order,
  last-label-wins) is carried as an explicit row-index column
  (:func:`kgtk_ray.ops._rowindex.add_row_index` when the caller
  doesn't supply one);
* qualifiers meet their statements with one hash join on the
  statement id; documents build in one bucketed group-apply per
  entity.  Entity ROW order in the output Dataset is unordered (KGTK
  rows are unordered; the reference's file order is its single-process
  artifact) — documents themselves are byte-exact.
"""
from __future__ import annotations

import json
import re
from typing import Mapping

import numpy as np
import pandas as pd
import ray
import ray.data

Dataset = ray.data.Dataset

# reference generator.py:529-556 (SQID UI datatype mapping)
DATATYPE_MAPPING = {
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

# props the wikidata JSON importer creates that the generator skips
# silently (generator.py:53 wiki_import_prop_types)
_WIKI_IMPORT_PROPS = {"wikipedia_sitelink", "language"}

_YYYY_MM_DD = re.compile(r"[12]\d{3}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])")
_YYYY = re.compile(r"[12]\d{3}")
_QUANTITY = re.compile(
    r"([\+|\-]?[0-9]+\.?[0-9]*[e|E]?[\-]?[0-9]*)"
    r"(?:\[([\+|\-]?[0-9]+\.?[0-9]*),([\+|\-]?[0-9]+\.?[0-9]*)\])?"
    r"([U|Q](?:.*))?")


def _process_text_string(s: str) -> tuple[str, str]:
    """generator.py:97-113 (quote stripping + @lang split)."""
    if len(s) == 0:
        return "", "en"
    if "@" in s:
        res = s.split("@")
        text = "@".join(res[:-1]).replace('"', "").replace("'", "")
        lang = res[-1].replace('"', "").replace("'", "")
        if len(lang) > 2:
            lang = "en"
        return text, lang
    return s.replace('"', "").replace("'", ""), "en"


def _clean_number(num: str | None) -> str | None:
    """generator.py:140-146."""
    if num is None:
        return None
    return np.format_float_positional(float(num), trim="-")


def _time_value(node2: str):
    """generator.py:832-845 — returns (time_string, precision) or None."""
    if _YYYY_MM_DD.match(node2):
        return node2 + "-00-00T00:00:00Z", 11
    if _YYYY.match(node2):
        return node2 + "-01-01T00:00:00Z", 9
    try:
        time_string, precision = node2.split("/")
        if time_string.startswith("^"):
            time_string = time_string[1:]
        if time_string.startswith("+"):
            time_string = time_string[1:]
        return time_string, int(precision)
    except Exception:
        return None


def _snak(prop: str, ptype: str, node2: str):
    """The mainsnak/qualifier-snak body for one value (generator.py's
    update_misc_json_dict_* family, qualifier form); None = corrupted."""
    if ptype == "wikibase-item":
        dv = {"value": {"entity-type": "item", "numeric-id": 0,
                        "id": node2}, "type": "wikibase-entityid"}
        dt = "wikibase-item"
    elif ptype == "time":
        tv = _time_value(node2)
        if tv is None:
            return None
        dv = {"value": {"time": tv[0], "timezone": 0, "before": 0,
                        "after": 0, "precision": tv[1],
                        "calendarmodel":
                        "http://www.wikidata.org/entity/Q1985727"},
              "type": "time"}
        dt = "time"
    elif ptype == "globe-coordinate":
        try:
            lat, lon = node2[1:].split("/")
            lat, lon = float(lat), float(lon)
        except Exception:
            return None
        dv = {"value": {"latitude": lat, "longitude": lon,
                        "altitude": None, "precision": 0.01,
                        "globe": "http://www.wikidata.org/entity/Q2"},
              "type": "globecoordinate"}
        dt = "globecoordinate"
    elif ptype == "quantity":
        m = _QUANTITY.match(node2)
        if m is None:
            return None
        try:
            amount, lo, hi, unit = m.groups()
            amount = _clean_number(amount)
            lo = _clean_number(lo)
            hi = _clean_number(hi)
            unit = ("http://www.wikidata.org/entity/" + unit
                    if unit is not None else None)
        except Exception:
            return None
        dv = {"value": {"amount": amount, "unit": unit,
                        "lowerBound": lo, "UpperBound": hi},
              "type": "quantity"}
        dt = "quantity"
    elif ptype == "monolingualtext":
        text, lang = _process_text_string(node2)
        dv = {"value": {"text": text, "language": lang},
              "type": "monolingualtext"}
        dt = "monolingualtext"
    elif ptype == "string":
        text, _ = _process_text_string(node2)
        dv = {"value": text, "type": "string"}
        dt = "string"
    elif ptype == "external-id":
        dv = {"value": node2, "type": "string"}
        dt = "external-id"
    elif ptype == "url":
        dv = {"value": node2, "type": "string"}
        dt = "url"
    else:
        raise ValueError(f"property type {ptype} is not defined")
    return {"snaktype": "value", "property": prop, "hash": "",
            "datavalue": dv, "datatype": dt}


def _statement(prop: str, ptype: str, node1: str, node2: str, rank: str,
               quals: list | None):
    snak = _snak(prop, ptype, node2)
    if snak is None:
        return None
    st = {"mainsnak": snak, "type": "statement",
          "id": node1 + prop + node2, "rank": rank,
          "references": [], "qualifiers": {}, "qualifiers-order": []}
    for qprop, qtype, qnode2 in quals or []:
        qsnak = _snak(qprop, qtype, qnode2)
        if qsnak is None:
            continue
        st["qualifiers"].setdefault(qprop, []).append(qsnak)
        if qprop not in st["qualifiers-order"]:
            st["qualifiers-order"].append(qprop)
    return st


def _entity_doc(node: str, is_prop: bool, datatype):
    """init_entity_in_json + update_misc_json_dict_info key order
    (generator.py:662-706)."""
    doc: dict = {"labels": {}, "descriptions": {}, "aliases": {},
                 "claims": {}, "sitelinks": {}}
    if is_prop:
        doc["datatype"] = datatype
    doc["type"] = "property" if is_prop else "item"
    doc["id"] = node
    if node.startswith("Q") or node.startswith("P"):
        doc["pageid"] = -1
        doc["ns"] = -1
        doc["title"] = ("Property:" + node) if node.startswith("P") else node
        doc["lastrevid"] = "2000-01-01T00:00:00Z"
    return doc


def load_prop_types(prop_df: pd.DataFrame) -> dict[str, str]:
    """(node1, node2) property-declaration table -> mapped prop types
    (reference set_properties, generator.py:1132-1147)."""
    return {p: DATATYPE_MAPPING[t.strip()]
            for p, t in zip(prop_df["node1"].astype(str),
                            prop_df["node2"].astype(str))}


def generate_wikidata_jsons(
    edges: Dataset,
    prop_types: Mapping[str, str],
    *,
    label_set: tuple = ("label",),
    description_set: tuple = ("description",),
    alias_set: tuple = ("alias",),
    rank_col: str | None = None,
    order_col: str | None = None,
) -> Dataset:
    """Edges -> ``(qnode, doc)`` rows, one reference-exact JSON document
    per entity (see module docstring).  ``prop_types`` maps property ->
    mapped datatype (:func:`load_prop_types`).  ``order_col`` carries
    the input order the reference gets from its file scan; when absent
    a block-order row index is attached."""
    from ..ops._rowindex import add_row_index
    from ..ops.shuffle import ifexists, ifnotexists
    from ..ops._bucket import bucketed_group_apply, bucketed_join, \
        schema_pa_fields

    lbl, desc, ali = set(label_set), set(description_set), set(alias_set)
    ptypes_ref = ray.put(dict(prop_types))

    if order_col is None:
        order_col = "__order__"
        edges = add_row_index(edges, order_col)
    edges = edges.map_batches(
        lambda df, oc=order_col, rc=rank_col: pd.DataFrame({
            "node1": df["node1"].astype(str),
            "label": df["label"].astype(str),
            "node2": df["node2"].astype(str),
            "id": df["id"].astype(str) if "id" in df.columns else "",
            "rank": df[rc].astype(str) if rc else "normal",
            "ord": df[oc].astype("int64"),
        }),
        batch_format="pandas").materialize()

    # qualifier split: a row whose node1 is some other row's id
    ids = edges.map_batches(
        lambda df: pd.DataFrame({"id": df["id"][df["id"] != ""]
                                 .drop_duplicates()}),
        batch_format="pandas")
    quals = ifexists(edges, ids, input_keys=["node1"],
                     filter_keys=["id"]).materialize()
    stmts = ifnotexists(edges, ids, input_keys=["node1"],
                        filter_keys=["id"]).materialize()

    import pyarrow as pa
    ef = {"node1": pa.string(), "label": pa.string(),
          "node2": pa.string(), "id": pa.string(), "rank": pa.string(),
          "ord": pa.int64()}
    if quals.count():
        # per-statement qualifier lists (sorted by input order), then
        # one hash join onto the statements by statement id
        # list cells don't survive Ray's pandas->Arrow conversion
        # (tensor-extension cast), so the (prop, node2) pairs travel
        # as a JSON string column through the exchange
        def qual_lists(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("ord", kind="mergesort")
            g = df.groupby("node1", sort=False).apply(
                lambda s: json.dumps(list(zip(s["label"], s["node2"]))),
                include_groups=False)
            return pd.DataFrame({"id": g.index, "quals": g.to_numpy()})

        qlists = bucketed_group_apply(quals, ["node1"], qual_lists)
        with_q = bucketed_join(
            stmts, qlists, "id",
            left_fields=ef,
            right_fields={"id": pa.string(), "quals": pa.string()},
            how="left")
    else:
        with_q = stmts.map_batches(
            lambda df: df.assign(quals=None), batch_format="pandas")

    def build(df: pd.DataFrame) -> pd.DataFrame:
        ptypes = ray.get(ptypes_ref)
        docs: list = []
        for entity, sub in df.groupby("node1", sort=False):
            sub = sub.sort_values("ord", kind="mergesort")
            is_prop = entity in ptypes
            doc = _entity_doc(entity, is_prop,
                              ptypes.get(entity))
            mentions: list = []
            for r in sub.itertuples(index=False):
                prop = r.label
                if prop == "data_type":
                    continue  # declaration row (collected upstream)
                if prop in lbl or prop in desc or prop in ali:
                    text, lang = _process_text_string(r.node2)
                    rec = {lang: {"languange": lang, "value": text}}
                    if prop in lbl:
                        doc["labels"].update(rec)
                    elif prop in desc:
                        doc["descriptions"].update(rec)
                    else:
                        doc["aliases"].setdefault(lang, []).append(rec)
                    continue
                if prop not in ptypes:
                    if prop in _WIKI_IMPORT_PROPS:
                        continue
                    raise ValueError(f"property {prop} is not defined")
                ptype = ptypes[prop]
                mentions.append((prop, True))
                if ptype == "wikibase-item":
                    mentions.append((r.node2, False))
                qlist = None
                if isinstance(r.quals, str) and r.quals:
                    pairs = json.loads(r.quals)
                    qlist = [(p, ptypes[p], v) for p, v in pairs
                             if p in ptypes]
                    for p, v in pairs:
                        if p in ptypes:
                            mentions.append((p, True))
                            if ptypes[p] == "wikibase-item":
                                mentions.append((v, False))
                st = _statement(prop, ptype, entity, r.node2, r.rank,
                                qlist)
                if st is None:
                    continue
                doc["claims"].setdefault(prop, []).append(st)
            docs.append((entity, json.dumps({entity: doc}), 1))
            # mention stubs (property docs / item-valued node2 docs);
            # real docs win over stubs downstream
            for node, as_prop in mentions:
                if node == entity:
                    continue
                mdoc = _entity_doc(node, node in ptypes,
                                   ptypes.get(node))
                docs.append((node, json.dumps({node: mdoc}), 0))
        out = pd.DataFrame(docs, columns=["qnode", "doc", "real"])
        return out.drop_duplicates(["qnode", "doc"])

    built = bucketed_group_apply(with_q, ["node1"], build)

    # one doc per entity: a real (statement-bearing) doc wins over
    # mention stubs; stubs are identical wherever they originate
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["qnode", "real"], ascending=[True, False],
                            kind="mergesort")
        return df.drop_duplicates("qnode")[["qnode", "doc"]]

    return bucketed_group_apply(built, ["qnode"], dedup)
