"""Tests for the Wikidata JSON importer, unreify-values, and HITS."""
import json

import pandas as pd
import ray.data

import kgtk_ray.ops as O
from kgtk_ray.io import import_wikidata, split_wikidata


def edges(rows, columns=("node1", "label", "node2")):
    return ray.data.from_pandas(pd.DataFrame(rows, columns=list(columns)))


def rows(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)].astype(str)
    return sorted(map(tuple, df.to_numpy().tolist()))


def _entity(qid, label, claims):
    return json.dumps({
        "id": qid,
        "labels": {"en": {"value": label}},
        "descriptions": {"en": {"value": f"desc of {qid}"}},
        "aliases": {"en": [{"value": label.lower()}]},
        "claims": claims,
    })


def test_import_wikidata():
    claims = {
        "P31": [{
            "id": "Q1$abc",
            "mainsnak": {"datavalue": {"type": "wikibase-entityid",
                                       "value": {"id": "Q5"}}},
            "qualifiers": {
                "P580": [{"datavalue": {"type": "time",
                                        "value": {"time": "+1984-01-01T00:00:00Z"}}}],
            },
        }],
        "P1082": [{
            "mainsnak": {"datavalue": {"type": "quantity",
                                       "value": {"amount": "+42", "unit": "1"}}},
        }],
    }
    lines = ray.data.from_pandas(pd.DataFrame(
        {"line": ["[", _entity("Q1", "Alice", claims) + ",", "]"]}))
    nodes, e, quals = split_wikidata(import_wikidata(lines))
    ndf = nodes.to_pandas()
    assert list(ndf.iloc[0]) == ["Q1", "Alice", "desc of Q1", "alice"]
    got = rows(e)  # (id, label, node1, node2)
    assert ("Q1-abc", "P31", "Q1", "Q5") in got
    assert any(r[1] == "P1082" and r[3] == "42" for r in got)
    q = rows(quals)  # (label, node1, node2)
    assert ("P580", "Q1-abc", "^1984-01-01T00:00:00Z") in q


def test_unreify_values():
    e = edges([
        ("V1", "rdf:type", "wikibase:QuantityValue"),
        ("V1", "quantityAmount", "42"),
        ("V1", "quantityUnit", "Q11573"),
        ("Q1", "height", "V1"),
        ("Q2", "height", "V1"),
        ("Q1", "P31", "Q5"),
    ])
    out = rows(O.unreify_values(
        e, trigger_label="rdf:type", trigger_node2="wikibase:QuantityValue",
        value_label="quantityAmount", old_label="height"))
    # (id, label, node1, node2) after column sort
    assert ("V1", "quantityAmount", "Q2", "42") in out  # greatest referrer wins
    assert ("", "P31", "Q1", "Q5") in out               # passthrough kept
    assert ("V1-1", "quantityUnit", "V1", "Q11573") in out  # attribute edge
    # old-label edges consumed (reference keeps only the last referrer);
    # trigger + quantityAmount rows consumed: 1 direct + 1 attr + 1 passthrough
    assert len(out) == 3


def test_hits():
    # star: h -> a1, h -> a2 ; a1/a2 are pure authorities, h pure hub
    e = edges([("h", "r", "a1"), ("h", "r", "a2")])
    out = O.hits(e, iters=5).to_pandas()
    hub = {r.node1: float(r.node2) for r in out.itertuples() if r.label == "hub"}
    auth = {r.node1: float(r.node2) for r in out.itertuples()
            if r.label == "authority"}
    assert hub["h"] > 0.99
    assert abs(auth["a1"] - auth["a2"]) < 1e-9
    assert auth["h"] == 0.0 and hub["a1"] == 0.0


def test_generate_mediawiki_jsons():
    import json
    import pandas as pd
    import ray.data as rd
    from kgtk_ray.io import generate_mediawiki_jsons

    edges = rd.from_pandas(pd.DataFrame({
        "node1": ["Q1", "Q1", "Q1", "Q1", "P1"],
        "label": ["label", "alias", "P1", "P1", "data_type"],
        "node2": ["'Item one'@en", "one", "Q2", "Q3", "item"],
    }))
    out = generate_mediawiki_jsons(edges).to_pandas()
    docs = {q: json.loads(d) for q, d in zip(out.qnode, out.doc)}
    assert set(docs) == {"Q1"}
    d = docs["Q1"]
    assert d["labels"]["en"]["value"] == "'Item one'@en"
    assert [a["value"] for a in d["aliases"]["en"]] == ["one"]
    claims = d["claims"]["P1"]
    assert [c["mainsnak"]["datavalue"]["value"] for c in claims] == ["Q2", "Q3"]
    assert all(c["mainsnak"]["datatype"] == "wikibase-item" for c in claims)
