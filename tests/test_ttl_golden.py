"""Golden-file byte-parity of the Turtle generator against the
reference's own test fixtures (kgtk/tests/test_triple_generation.py:
test_truthy_property_triple_generation and
test_truthy_qnode_triple_generation — their dates test is disabled in
the reference itself)."""
import pandas as pd
import pytest
import ray.data

from kgtk_ray.io.rdf import TTL_HEADER, generate_wikidata_ttl, write_wikidata_ttl

DATA = "/root/reference/kgtk/tests/data"


def load_props() -> dict:
    df = pd.read_csv(f"{DATA}/wikidata_properties.tsv", sep="\t",
                     names=["node1", "label", "node2"])
    return dict(zip(df.node1, df.node2))


def load_edges(name: str) -> pd.DataFrame:
    return pd.read_csv(f"{DATA}/{name}", sep="\t", dtype=str,
                       quoting=3, keep_default_na=False)


@pytest.mark.parametrize("tsv,golden", [
    ("P10.tsv", "P10_truthy.ttl"),
    ("Q57160439.tsv", "Q57160439_truthy.ttl"),
])
def test_truthy_ttl_byte_parity(ray_session, tmp_path, tsv, golden):
    edges = ray.data.from_pandas(load_edges(tsv))
    out = tmp_path / "out.ttl"
    write_wikidata_ttl(edges, load_props(), str(out),
                       label_set="label", alias_set="aliases",
                       description_set="descriptions")
    assert out.read_text() == open(f"{DATA}/{golden}").read()


def test_ttl_dataset_per_entity(ray_session):
    edges = ray.data.from_pandas(load_edges("Q57160439.tsv"))
    df = generate_wikidata_ttl(edges, load_props()).to_pandas()
    assert list(df.entity) == ["Q57160439"]
    assert df.ttl.iloc[0].startswith("wd:Q57160439 a wikibase:Item ;")
    assert "pq:P1545" in df.ttl.iloc[0]  # qualifiers grouped by id prefix


@pytest.mark.parametrize("tsv,golden", [
    ("P10.tsv", "P10_not_truthy.ttl"),
    ("Q57160439.tsv", "Q57160439_not_truthy.ttl"),
])
def test_not_truthy_ttl_byte_parity(ray_session, tmp_path, tsv, golden):
    """truthy=False (reference test_property_triple_generation /
    test_not_truthy_qnode_triple_generation): no direct wdt: claims,
    NormalRank instead of BestRank."""
    edges = ray.data.from_pandas(load_edges(tsv))
    out = tmp_path / "out.ttl"
    write_wikidata_ttl(edges, load_props(), str(out),
                       label_set="label", alias_set="aliases",
                       description_set="descriptions", truthy=False)
    assert out.read_text() == open(f"{DATA}/{golden}").read()


def test_small_values_quantity_ttl_parity(ray_session, tmp_path):
    """Quantity serialization against the reference's
    small_values.ttl golden (test_triple_small_values): bare decimal /
    uppercase-E double literals, wdtn/psv/psn links to wdv:Quantity
    value nodes with QuantityValue stanzas.  Stanza-SET equality: the
    golden's wdv stanza order follows rdflib's internal store order,
    which has no stable public rule — every stanza still matches
    byte-for-byte."""
    edges = ray.data.from_pandas(load_edges("small_values.tsv"))
    out = tmp_path / "out.ttl"
    write_wikidata_ttl(edges, load_props(), str(out),
                       label_set="label", alias_set="aliases",
                       description_set="descriptions")
    got = out.read_text()
    want = open(f"{DATA}/small_values.ttl").read()
    assert sorted(got.split("\n\n")) == sorted(want.split("\n\n"))


def test_corrupted_edges_ttl_parity(ray_session, tmp_path):
    """Corrupted-value handling against corrupted.ttl
    (test_triple_corrupted_edges): an unparseable time value drops the
    statement and its qualifiers; a corrupted qualifier drops alone;
    bare yyyy values parse as yyyy-01-01 at year precision with shared
    wdv:Time value nodes on both psv: and pqv: links, deduplicated
    globally across entities."""
    edges = ray.data.from_pandas(load_edges("corrupted_kgtk.tsv"))
    out = tmp_path / "out.ttl"
    write_wikidata_ttl(edges, load_props(), str(out),
                       label_set="label", alias_set="aliases",
                       description_set="descriptions")
    assert out.read_text() == open(f"{DATA}/corrupted.ttl").read()
