"""Per-source importer field-mapping fidelity (reference
kgtk/cli/import_conceptnet.py:36-68, import_atomic.py:36-120,
import_concept_pairs.py:42-67, import_visualgenome.py:40-146)."""
import json

import pandas as pd
import ray.data

from kgtk_ray.io.importers import (
    import_atomic,
    import_concept_pairs,
    import_conceptnet,
    import_visualgenome,
)

OUT_COLS = ["node1", "relation", "node2", "node1;label", "node2;label",
            "relation;label", "relation;dimension", "source", "sentence"]


def test_import_conceptnet_mapping():
    rows = pd.DataFrame({
        "assertion": ["/a/1", "/a/2"],
        "rel": ["/r/AtLocation", "/r/CapableOf"],
        "subj": ["/c/en/new_york", "/c/fr/chat"],
        "obj": ["/c/en/usa", "/c/fr/miauler"],
        "metadata": ['{"surfaceText": "[[New York]] is in [[USA]]"}', "{}"],
    })
    out = import_conceptnet(ray.data.from_pandas(rows)).to_pandas() \
        .sort_values("node1").reset_index(drop=True)
    assert list(out.columns) == OUT_COLS
    ny = out[out.node1 == "/c/en/new_york"].iloc[0]
    assert ny["node1;label"] == '"new york"'
    assert ny["node2;label"] == '"usa"'
    assert ny["relation;label"] == '"at location"'
    assert ny["source"] == '"CN"'
    assert ny["sentence"] == '"[[New York]] is in [[USA]]"'
    cat = out[out.node1 == "/c/fr/chat"].iloc[0]
    assert cat["relation;label"] == '"capable of"'
    assert cat["sentence"] == ""


def test_import_conceptnet_english_only():
    rows = pd.DataFrame({
        "assertion": ["/a/1", "/a/2"],
        "rel": ["/r/IsA", "/r/IsA"],
        "subj": ["/c/en/dog", "/c/fr/chien"],
        "obj": ["/c/en/animal", "/c/fr/animal"],
        "metadata": ["{}", "{}"],
    })
    out = import_conceptnet(ray.data.from_pandas(rows),
                            english_only=True).to_pandas()
    assert list(out.node1) == ["/c/en/dog"]


def test_import_concept_pairs():
    rows = pd.DataFrame({"node1": ["cn:dog", "cn:cat"],
                         "node2": ["cn:animal", "cn:pet"]})
    out = import_concept_pairs(ray.data.from_pandas(rows), source="CN",
                               relation="/r/RelatedTo").to_pandas()
    assert list(out.columns) == OUT_COLS
    r = out.iloc[0]
    assert r.node1 == "cn:cn:dog"
    assert r["node1;label"] == '"dog"'  # label strips the 3-char prefix
    assert r["relation;label"] == '"related to"'
    assert r.source == '"CN"'


def test_import_atomic():
    rows = pd.DataFrame({
        "event": ["PersonX buys ___ lunch."],
        "xAttr": [json.dumps(["generous", "none"])],
        "oReact": [json.dumps(["grateful"])],
    })
    out = import_atomic(ray.data.from_pandas(rows)).to_pandas()
    assert list(out.columns) == OUT_COLS
    assert len(out) == 2  # 'none' skipped
    attr = out[out.relation == "at:xAttr"].iloc[0]
    assert attr["relation;label"] == '"person x has attribute"'
    # event label: lowered + cleaned variant joined with |
    assert attr["node1;label"] == '"personx buys ___ lunch"|"buys lunch"'
    # node id derives from the FIRST label (the uncleaned variant),
    # reference import_atomic.py:103-105
    assert attr.node1 == "at:personx_buys_____lunch"
    assert attr["node2;label"] == '"generous"'
    assert attr.source == '"AT"'


def test_import_visualgenome():
    image = {
        "image_id": 7,
        "objects": [
            {"object_id": 1, "names": ["Dog."], "synsets": ["dog.n.01"],
             "attributes": ["black", "running"]},
            {"object_id": 2, "names": ["yard"], "synsets": ["yard.n.01"]},
        ],
        "relationships": [
            {"predicate": "IN", "subject_id": 1, "object_id": 2},
        ],
    }
    attr_synsets = {"black": "black.a.01", "running": "run.v.01"}
    out = import_visualgenome(ray.data.from_items([image]),
                              attr_synsets).to_pandas()
    trip = set(zip(out.node1, out.relation, out.node2))
    assert ("wn:dog.n.01", "mw:MayHaveProperty", "wn:black.a.01") in trip
    assert ("wn:dog.n.01", "/r/CapableOf", "wn:run.v.01") in trip
    assert ("wn:dog.n.01", "/r/LocatedNear", "wn:yard.n.01") in trip
    rel = out[out.relation == "/r/LocatedNear"].iloc[0]
    assert rel["relation;label"] == '"in"'
    assert rel["node1;label"] == '"dog"'
    assert (out.source == '"VG"').all()
