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


# ---------------------------------------------------------------------------
# Per-source importers with the reference's exact field mappings.
# Output layout is the reference's 9-column edge header (with '_' -> ';'
# in the written header): node1, relation, node2, node1;label,
# node2;label, relation;label, relation;dimension, source, sentence.
# ---------------------------------------------------------------------------

_OUT_COLS = ["node1", "relation", "node2", "node1;label", "node2;label",
             "relation;label", "relation;dimension", "source", "sentence"]

_CAMEL1 = None  # compiled lazily per process


def _split_camel_case(name: str) -> str:
    """reference import_conceptnet.py:42-44."""
    import re
    splitted = re.sub("([A-Z][a-z]+)", r" \1",
                      re.sub("([A-Z]+)", r" \1", name)).split()
    return " ".join(splitted).lower()


def import_conceptnet(ds: Dataset, *, english_only: bool = False) -> Dataset:
    """ConceptNet assertion TSV -> KGTK edges with the reference's exact
    field mapping (kgtk/cli/import_conceptnet.py:36-68 row_to_edge):
    node1/node2 = the raw concept uris, node1;label = stringify(4th uri
    segment with '_'->' '), relation;label = stringify(camel-case-split
    last segment), source = '"CN"', sentence = stringify(metadata
    surfaceText with backslashes removed).

    ``ds`` holds the 5 assertion columns named (assertion, rel, subj,
    obj, metadata) — e.g. from ``ray.data.read_csv(path,
    ParseOptions(delimiter='\\t'), column_names=[...])``.
    """
    import json

    from ..format import stringify

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if english_only:
            keep = df["subj"].str.startswith("/c/en/") \
                & df["obj"].str.startswith("/c/en/")
            df = df[keep]

        def node_label(s: pd.Series) -> pd.Series:
            return s.str.split("/").str[3].str.replace("_", " ", regex=False) \
                .str.strip().map(stringify)

        def sentence(meta: str) -> str:
            m = json.loads(meta)
            if "surfaceText" in m:
                return stringify(m["surfaceText"].replace("\\", ""))
            return ""

        return pd.DataFrame({
            "node1": df["subj"].astype(str),
            "relation": df["rel"].astype(str),
            "node2": df["obj"].astype(str),
            "node1;label": node_label(df["subj"].astype(str)),
            "node2;label": node_label(df["obj"].astype(str)),
            "relation;label": df["rel"].astype(str).str.split("/").str[-1]
            .map(lambda r: stringify(_split_camel_case(r))),
            "relation;dimension": "",
            "source": stringify("CN"),
            "sentence": df["metadata"].astype(str).map(sentence),
        })[_OUT_COLS]

    return ds.map_batches(f, batch_format="pandas")


def import_concept_pairs(ds: Dataset, *, source: str = "CN",
                         relation: str = "/r/RelatedTo") -> Dataset:
    """Concept-pair TSV (node1, node2 columns) -> edges (reference
    kgtk/cli/import_concept_pairs.py:42-67: nodes get a lowercased
    source prefix, labels strip the 3-char namespace prefix)."""
    from ..format import stringify

    prefix = source.lower()
    rel_label = stringify(_split_camel_case(relation.split("/")[-1]))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n1 = df["node1"].astype(str)
        n2 = df["node2"].astype(str)
        return pd.DataFrame({
            "node1": prefix + ":" + n1,
            "relation": relation,
            "node2": prefix + ":" + n2,
            "node1;label": n1.str[3:].map(stringify),
            "node2;label": n2.str[3:].map(stringify),
            "relation;label": rel_label,
            "relation;dimension": "",
            "source": stringify(source),
            "sentence": "",
        })[_OUT_COLS]

    return ds.map_batches(f, batch_format="pandas")


_ATOMIC_REL_LABELS = {
    # reference import_atomic.py:70-83
    "xAttr": "person x has attribute", "oAttr": "others have attribute",
    "xReact": "person x feels", "oReact": "others feel",
    "xIntent": "person x wants", "xWant": "person x wants",
    "oWant": "others want", "xNeed": "person x needs",
    "xEffect": "effect on person x", "oEffect": "the effect on others",
}


def _atomic_clean(event: str) -> str:
    """reference import_atomic.py:45-55 remove_people_mentions."""
    e = event.replace("personx", "").strip()
    e = e.replace("persony", "").strip()
    e = e.replace("person x", "").strip()
    e = e.replace("person y", "").strip()
    e = e.replace("the ___", "")
    e = e.replace("___", "")
    e = e.replace("'s", "")
    e = e.replace("to y", "")
    return e.strip()


def _atomic_labels(event: str) -> str:
    """reference import_atomic.py:57-68 produce_node_labels."""
    from ..format import stringify
    if "\t" in event:
        event = event.split("\t")[0]
    e1 = event.lower().rstrip(".").strip()
    e2 = _atomic_clean(e1)
    while "  " in e2:
        e2 = e2.replace("  ", " ")
    if e1 != e2 and e2:
        return "|".join([stringify(e1), stringify(e2)])
    return stringify(e1)


def import_atomic(ds: Dataset) -> Dataset:
    """ATOMIC CSV -> edges (reference kgtk/cli/import_atomic.py): one
    edge per (event, relation column, json-list member), skipping
    'none'; node ids are ``at:`` + the first label with spaces as
    underscores.

    ``ds`` holds an ``event`` column plus the nine relation columns
    (xAttr..oEffect) whose cells are JSON list strings (or lists).
    """
    import json

    from ..format import unstringify

    rel_cols = list(_ATOMIC_REL_LABELS)

    def make_node(label: str) -> str:
        return "at:" + label.replace(" ", "_")

    def first_label(label_list: str) -> str:
        return unstringify(label_list.split("|")[0]
                           if "|" in label_list else label_list)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        from ..format import stringify

        df = df.reset_index(drop=True)
        cols = [c for c in rel_cols if c in df.columns]

        # per-unique-value label computation (events and list members
        # repeat heavily), then columnar melt -> explode -> filter
        ev = df["event"].astype(str)
        ev_label = ev.map({e: _atomic_labels(e) for e in ev.unique()})
        base = pd.DataFrame({
            "__n1": ev_label.map(lambda s: make_node(first_label(s))),
            "__el": ev_label,
            "__row": range(len(df)),
        })
        for c in cols:
            base[c] = df[c].map(
                lambda v: json.loads(v) if isinstance(v, str) else v)

        long = base.melt(id_vars=["__n1", "__el", "__row"], value_vars=cols,
                         var_name="__rel", value_name="__v")
        long = long[long["__v"].notna()].explode("__v", ignore_index=True)
        long = long[long["__v"].notna() & (long["__v"] != "none")]
        # restore the reference's row-major emission order
        # (import_atomic.py iterates rows, then relation columns;
        # melt is column-major, explode keeps intra-list order)
        cpos = {c: i for i, c in enumerate(cols)}
        long = long.sort_values(
            ["__row", "__rel"], key=lambda s:
            s.map(cpos) if s.name == "__rel" else s, kind="mergesort")

        vals = long["__v"].astype(str)
        vlabel = vals.map({v: _atomic_labels(v) for v in vals.unique()})
        rel_label = {c: stringify(_ATOMIC_REL_LABELS[c]) for c in cols}
        return pd.DataFrame({
            "node1": long["__n1"].to_numpy(),
            "relation": ("at:" + long["__rel"].str.replace(
                " ", "_", regex=False)).to_numpy(),
            "node2": vlabel.map(
                lambda s: make_node(first_label(s))).to_numpy(),
            "node1;label": long["__el"].to_numpy(),
            "node2;label": vlabel.to_numpy(),
            "relation;label": long["__rel"].map(rel_label).to_numpy(),
            "relation;dimension": "",
            "source": stringify("AT"),
            "sentence": "",
        }, columns=_OUT_COLS)

    return ds.map_batches(f, batch_format="pandas")


def import_visualgenome(ds: Dataset, attr_synsets: dict) -> Dataset:
    """Visual Genome scene graph -> edges (reference
    kgtk/cli/import_visualgenome.py:40-146): object attributes become
    mw:MayHaveProperty (adjectives) / /r/CapableOf (verbs) edges
    between wordnet synsets, relationships become /r/LocatedNear edges
    between subject and object synsets; per-image de-duplication.

    ``ds`` rows are scene-graph image records (image_id, objects,
    relationships); ``attr_synsets`` maps attribute -> synset."""
    import ray

    from ..format import stringify

    aref = ray.put(attr_synsets)

    def per_image(row: dict) -> list[dict]:
        asyns = ray.get(aref)
        out, seen = [], set()

        def emit(n1, n1_lbl, n2, n2_lbl, rel, rel_lbl):
            key = (n1, rel, n2, rel_lbl)
            if key in seen:
                return
            seen.add(key)
            out.append(dict(zip(_OUT_COLS, (
                n1, rel, n2, "|".join(n1_lbl), "|".join(n2_lbl),
                rel_lbl, "", stringify("VG"), ""))))

        objid2names: dict = {}
        objid2syns: dict = {}
        for o in row["objects"]:
            names = []
            for name in o.get("names", []):
                name = name.strip().lower().rstrip(".")
                if name:
                    names.append(stringify(name))
            objid2names[o["object_id"]] = names
            objid2syns[o["object_id"]] = o.get("synsets", [])
        for o in row["objects"]:
            o_synset = objid2syns[o["object_id"]]
            for attr in o.get("attributes", []) or []:
                attr = attr.lower()
                if attr not in asyns:
                    continue
                asyn = asyns[attr]
                apos = asyn.split(".")[1]
                if apos == "n":
                    continue
                rel, rel_lbl = (
                    ("/r/CapableOf", stringify("capable of"))
                    if apos == "v"
                    else ("mw:MayHaveProperty",
                          stringify("may have property")))
                for osyn in o_synset:
                    if osyn != asyn:
                        emit("wn:" + osyn, objid2names[o["object_id"]],
                             "wn:" + asyn, [stringify(attr)], rel, rel_lbl)
        for rel in row.get("relationships", []) or []:
            relation_label = stringify(
                rel["predicate"].lower().strip().strip("."))
            sub_id, obj_id = rel["subject_id"], rel["object_id"]
            for ssyn in objid2syns.get(sub_id, []):
                for osyn in objid2syns.get(obj_id, []):
                    if osyn != ssyn:
                        emit("wn:" + ssyn, objid2names.get(sub_id, []),
                             "wn:" + osyn, objid2names.get(obj_id, []),
                             "/r/LocatedNear", relation_label)
        return out

    return ds.flat_map(per_image)
