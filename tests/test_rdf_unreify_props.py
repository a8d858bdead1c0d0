"""Tests for RDF import/export, unreify, property validation, paths,
sampling, export formats, normalizers, and embedding plumbing
(reference semantics cites in each module's docstring)."""
import json

import pandas as pd
import pytest
import ray.data

import kgtk_ray.ops as O
from kgtk_ray.io import (
    import_ntriples, generate_ntriples, export_neo4j, export_neo4j_nodes,
    export_entities_json, to_markdown, edges_from_table,
)
from kgtk_ray.text import normalize_text
from kgtk_ray.pipelines.embed import text_embedding


def edges(rows, columns=("node1", "label", "node2")):
    return ray.data.from_pandas(pd.DataFrame(rows, columns=list(columns)))


def rows(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)].astype(str)
    return sorted(map(tuple, df.to_numpy().tolist()))


# ---------------------------------------------------------------- ntriples

NT_LINES = [
    '<http://example.org/Q1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/Person> .',
    '<http://example.org/Q1> <http://schema.org/name> "Alice" .',
    '<http://example.org/Q1> <http://schema.org/name> "Alicia"@es .',
    '<http://example.org/Q1> <http://schema.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
    '<http://example.org/Q1> <http://schema.org/alive> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
    '<http://example.org/Q1> <http://schema.org/born> "1984-01-02T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .',
    '_:b0 <http://schema.org/knows> <http://example.org/Q1> .',
    'malformed line no triple',
]


def test_import_ntriples():
    ns = {"http://example.org/": "ex",
          "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
          "http://schema.org/": "schema"}
    lines = ray.data.from_pandas(pd.DataFrame({"line": NT_LINES}))
    out = import_ntriples(lines, namespaces=ns,
                          allocate_namespaces=False).to_pandas()
    got = set(map(tuple, out.to_numpy().tolist()))
    assert ("ex:Q1", "rdf:type", "ex:Person") in got
    assert ("ex:Q1", "schema:name", '"Alice"') in got
    assert ("ex:Q1", "schema:name", "'Alicia'@es") in got
    assert ("ex:Q1", "schema:age", "42") in got
    assert ("ex:Q1", "schema:alive", "True") in got
    assert ("ex:Q1", "schema:born", "^1984-01-02T00:00:00Z") in got
    # blank nodes carry the reference's local namespace prefix "X"
    assert ("X:b0", "schema:knows", "ex:Q1") in got
    assert len(got) == 7  # malformed line dropped


def test_generate_ntriples_roundtrip():
    ns = {"http://example.org/": "ex", "http://schema.org/": "schema"}
    e = edges([("ex:Q1", "schema:age", "42"),
               ("ex:Q1", "schema:name", '"Alice"')])
    lines = generate_ntriples(e, namespaces=ns).to_pandas()["line"]
    assert '<http://example.org/Q1> <http://schema.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#decimal> .' in set(lines)
    assert '<http://example.org/Q1> <http://schema.org/name> "Alice" .' in set(lines)


# ----------------------------------------------------------------- unreify

def test_unreify_rdf_statements():
    e = edges([
        ("S1", "rdf:type", "rdf:Statement"),
        ("S1", "rdf:subject", "Q1"),
        ("S1", "rdf:predicate", "P31"),
        ("S1", "rdf:object", "Q5"),
        ("S1", "refers_to", "REF9"),
        ("Q7", "P31", "Q5"),
    ])
    out = rows(O.unreify_rdf_statements(e))
    # sorted-column tuple order: (id, label, node1, node2)
    assert ("S1", "P31", "Q1", "Q5") in out          # collapsed direct edge
    # qualifier keeps stmt node as node1 and gets id <edge>-<n>
    # (reference make_new_id, kgtkunreifyrdfstatements.py:327-340)
    assert ("S1-1", "refers_to", "S1", "REF9") in out
    assert ("", "P31", "Q7", "Q5") in out            # untouched passthrough
    assert len(out) == 3


def test_unreify_multiple_objects_cross_product():
    e = edges([
        ("S1", "rdf:type", "rdf:Statement"),
        ("S1", "rdf:subject", "Q1"),
        ("S1", "rdf:predicate", "P31"),
        ("S1", "rdf:object", "Q5"),
        ("S1", "rdf:object", "Q6"),
        ("S1", "conf", "0.9"),
    ])
    out = rows(O.unreify_rdf_statements(e))
    # sorted cross-product numbered <statement>-<n>; the qualifier is
    # copied under each product edge (reference :280-324)
    assert ("S1-1", "P31", "Q1", "Q5") in out
    assert ("S1-2", "P31", "Q1", "Q6") in out
    assert ("S1-1-1", "conf", "S1-1", "0.9") in out
    assert ("S1-2-1", "conf", "S1-2", "0.9") in out


def test_unreify_docs_example_ids():
    # /root/reference/docs/transform/unreify_rdf_statements.md worked
    # example: three qualifiers numbered in order under the main edge
    g = "X:g3"
    e = edges([
        (g, "ont:confidence", "X:g4"),
        (g, "ont:justifiedBy", "X:g5"),
        (g, "ont:system", "n1:"),
        (g, "rdf:object", "gaia:e1"),
        (g, "rdf:predicate", "n3:LocatedNear"),
        (g, "rdf:subject", "gaia:r1"),
        (g, "rdf:type", "rdf:Statement"),
    ])
    out = rows(O.unreify_rdf_statements(e))
    assert out == sorted([
        (g, "n3:LocatedNear", "gaia:r1", "gaia:e1"),
        (f"{g}-1", "ont:confidence", g, "X:g4"),
        (f"{g}-2", "ont:justifiedBy", g, "X:g5"),
        (f"{g}-3", "ont:system", g, "n1:"),
    ])


# ---------------------------------------------------------- validate-props

def _patterns():
    return pd.DataFrame({
        "prop": ["in_region", "in_region", "age", "age"],
        "kind": ["node1_pattern", "node2_pattern", "node2_type", "maxoccurs"],
        "value": ["^N\\d+$", "^R\\d+$", "number", "1"],
    })


def test_validate_properties_patterns():
    e = edges([
        ("N1", "in_region", "R1"),
        ("X1", "in_region", "R1"),     # bad node1
        ("N2", "in_region", "Z9"),     # bad node2
        ("N1", "age", "42"),
        ("N2", "age", "forty"),        # bad type
    ])
    good = rows(O.validate_properties(e, _patterns()))
    # sorted-column tuple order: (label, node1, node2)
    assert ("in_region", "N1", "R1") in good
    assert ("age", "N1", "42") in good
    assert len(good) == 2
    bad = O.validate_properties(e, _patterns(), emit="reject").to_pandas()
    assert set(bad["reason"]) == {"node1_pattern", "node2_pattern", "node2_type"}


def test_validate_properties_cardinality():
    e = edges([
        ("N1", "age", "1"),
        ("N1", "age", "2"),   # maxoccurs=1 violated for N1
        ("N2", "age", "3"),
    ])
    good = O.validate_properties(e, _patterns()).to_pandas()
    assert set(good["node1"]) == {"N2"}


# -------------------------------------------------------------------- paths

def test_paths():
    e = edges([("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c"),
               ("c", "r", "a")])
    out = O.paths(e, ["a"], ["c"], max_hops=3).to_pandas()
    ps = set(out["path"])
    assert "a->c" in ps
    assert "a->b->c" in ps
    assert all(h <= 3 for h in out["hops"])
    # no cyclic revisits
    assert not any(p.split("->").count("a") > 1 for p in ps)


# ----------------------------------------------------------------- sampling

def test_sampling():
    ds = ray.data.from_pandas(pd.DataFrame({"k": range(100), "v": range(100)}))
    assert O.every_nth(ds, 10, key="k").count() == 10
    assert O.record_limit(ds, 7).count() == 7
    t = O.tail(ds, 5, key="k").to_pandas()
    assert set(t["k"]) == {95, 96, 97, 98, 99}
    s = O.initial_skip(ds, 95, key="k").to_pandas()
    assert set(s["k"]) == {95, 96, 97, 98, 99}


# ------------------------------------------------------------------ formats

def test_export_neo4j():
    e = edges([("a", "knows well", "b")])
    c = export_neo4j(e).to_pandas()["cypher"].iloc[0]
    assert "KNOWS_WELL" in c and "{id: 'a'}" in c and "{id: 'b'}" in c
    nodes = set(export_neo4j_nodes(e).to_pandas()["cypher"])
    assert len(nodes) == 2


def test_export_entities_json():
    e = edges([("Q1", "P31", "Q5"), ("Q1", "P31", "Q4"), ("Q2", "P31", "Q5")])
    out = export_entities_json(e).to_pandas().set_index("qnode")
    doc = json.loads(out.loc["Q1", "doc"])
    assert doc["claims"]["P31"] == ["Q4", "Q5"]


def test_to_markdown():
    e = edges([("a", "r", "b")])
    md = to_markdown(e)
    assert md.splitlines()[0].startswith("| ")
    assert "| a | r | b |" in md


def test_edges_from_table():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"start": ["x"], "rel": ["related"], "end": ["y"], "w": [3]}))
    out = edges_from_table(ds, node1_col="start", label_col="rel",
                           node2_col="end", extra={"weight": "w"})
    # sorted-column tuple order: (label, node1, node2, weight)
    assert rows(out) == [("related", "x", "y", "3")]


# --------------------------------------------------------------- normalize

def test_normalize_text():
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["  Héllo,   World!  "]}))
    out = normalize_text(ds).to_pandas()["text_norm"].iloc[0]
    assert out == "héllo world"
    ws = normalize_text(ds, mode="whitespace").to_pandas()["text_norm"].iloc[0]
    assert ws == "Héllo, World!"


# --------------------------------------------------------------- embedding

def test_text_embedding_deterministic():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"text": ["alpha beta", "alpha beta", "gamma delta"]}))
    out = text_embedding(ds, concurrency=(1, 2), batch_size=2).to_pandas()
    import numpy as np
    v = [np.asarray(x) for x in out["embedding"]]
    assert v[0].shape == (64,)
    assert np.allclose(v[0], v[1])       # same text -> same vector
    assert not np.allclose(v[0], v[2])
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-5


def test_unreify_values_docs_example():
    """Replay the full worked example from the reference's
    docs/transform/unreify_values.md (all three variants: plain,
    multi-value refusal, --allow-multiple-values)."""
    from kgtk_ray.ops.unreify import unreify_values

    g1, g2 = "X:g1", "X:g2"
    clu, mem, sysv = "gaia:cluster", "gaia:member", "nX-2:"
    base = [
        (g1, "rdf:type", "ont:ClusterMembership"),
        (g1, "ont:cluster", clu),
        (g1, "ont:clusterMember", mem),
        (g1, "ont:confidence", g2),
        (g2, "rdf:type", "ont:Confidence"),
        (g2, "ont:confidenceValue", "1.0"),
        (g2, "ont:system", sysv),
        (g1, "ont:system", sysv),
    ]
    kw = dict(trigger_label="rdf:type", trigger_node2="ont:Confidence",
              value_label="ont:confidenceValue", old_label="ont:confidence")

    out = rows(unreify_values(edges(base), **kw))
    assert out == sorted([  # rows() sorts columns: (id, label, node1, node2)
        ("", "rdf:type", g1, "ont:ClusterMembership"),
        ("", "ont:cluster", g1, clu),
        ("", "ont:clusterMember", g1, mem),
        ("", "ont:system", g1, sysv),
        (g2, "ont:confidenceValue", g1, "1.0"),
        (g2 + "-1", "ont:system", g2, sysv),
    ])

    # two distinct values, default allow_multiple_values=False: the
    # whole group refuses and passes through unchanged (id appended)
    multi = base[:6] + [(g2, "ont:confidenceValue", "2.0")] + base[6:]
    out2 = rows(unreify_values(edges(multi), **kw))
    assert len(out2) == 9 and all(r[0] == "" for r in out2)

    # allow_multiple_values=True: values join into a sorted | list
    out3 = rows(unreify_values(edges(multi), allow_multiple_values=True,
                               **kw))
    assert (g2, "ont:confidenceValue", g1, "1.0|2.0") in out3
    assert len(out3) == 6


def test_unreify_values_quoted_string_id_and_existing_id():
    """A quoted-string value-node id numbers inside the quotes
    (reference make_new_id kgtkunreifyvalues.py:286-296); an existing
    id column is preserved on pass-through rows."""
    from kgtk_ray.ops.unreify import unreify_values

    q = '"v one"'
    ds = edges([
        (q, "rdf:type", "ont:Confidence", "e1"),
        (q, "ont:confidenceValue", "0.5", "e2"),
        (q, "ont:system", "sys", "e3"),
        ("s", "ont:confidence", q, "e4"),
        ("a", "plain", "b", "e5"),
    ], columns=("node1", "label", "node2", "id"))
    out = rows(unreify_values(
        ds, trigger_label="rdf:type", trigger_node2="ont:Confidence",
        value_label="ont:confidenceValue", old_label="ont:confidence"))
    assert (q, "ont:confidenceValue", "s", "0.5") in out
    assert ('"v one-1"', "ont:system", q, "sys") in out
    assert ("e5", "plain", "a", "b") in out


@pytest.mark.parametrize("fixture,golden", [
    ("unreify-values-file1.tsv", "unreify_values_golden1.tsv"),
    ("unreify-values-file3.tsv", "unreify_values_golden3.tsv"),
])
def test_unreify_values_reference_fixture_golden(fixture, golden):
    """Row-set parity against the reference implementation's own output
    on its test fixtures (kgtk/join/test/unreify-values-test1.sh).  The
    goldens in tests/data/ were produced by running
    /root/reference/kgtk/unreify/kgtkunreifyvalues.py on the fixture
    with the documented test1.sh parameters."""
    import csv
    import os

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.unreify import unreify_values

    ds = read_kgtk_tsv(f"/root/reference/kgtk/join/test/{fixture}")
    out = unreify_values(
        ds, trigger_label="rdf:type", trigger_node2="ont:Confidence",
        value_label="ont:confidenceValue",
        old_label="ont:confidence").to_pandas()
    gold = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data", golden),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)
    cols = ["node1", "label", "node2", "id"]
    assert (sorted(map(tuple, out[cols].to_numpy()))
            == sorted(map(tuple, gold[cols].to_numpy())))


def test_unreify_rdf_reference_fixture_golden():
    """Row-set parity against the reference kgtkunreifyrdfstatements.py
    run on its own fixture (kgtk/join/test/unreify-rdf-statements-file1
    .tsv, default triggers); golden in tests/data/."""
    import csv
    import os

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.unreify import unreify_rdf_statements

    ds = read_kgtk_tsv(
        "/root/reference/kgtk/join/test/unreify-rdf-statements-file1.tsv")
    out = unreify_rdf_statements(ds).to_pandas()
    gold = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data",
                     "unreify_rdf_golden1.tsv"),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)
    cols = ["node1", "label", "node2", "id"]
    assert (sorted(map(tuple, out[cols].astype(str).to_numpy()))
            == sorted(map(tuple, gold[cols].to_numpy())))
