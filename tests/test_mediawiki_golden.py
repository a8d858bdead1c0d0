"""Byte-exact replay of the reference's own generate-mediawiki-jsons
goldens (kgtk/tests/test_json_generation.py): every document produced
for dates.tsv / P10.tsv / Q57160439.tsv / ranked_example.tsv must equal
the corresponding line of dates0 / P100 / Q571604390 / ranked0 .jsonl
byte-for-byte.  Covers every datatype branch, label/description/alias
records (with the reference's "languange" typo), qualifier attachment,
info-field key order, and the legacy date quirks.

The reference emits documents in file order; rows here are unordered,
so the comparison is per-entity (same doc set, each byte-identical).
"""
from __future__ import annotations

import json

import pandas as pd
import pytest
import ray.data as rd

from kgtk_ray.io.mediawiki import generate_wikidata_jsons, load_prop_types

BASE = "/root/reference/kgtk/tests/data"


@pytest.fixture(scope="module")
def prop_types():
    props = pd.read_csv(f"{BASE}/wikidata_properties.tsv", sep="\t")
    return load_prop_types(props)


def _read_edges(tsv: str) -> pd.DataFrame:
    rows = []
    with open(tsv) as f:
        header = f.readline().strip("\r\n").split("\t")
        for line in f:
            if line.startswith("#") or not line.strip():
                continue  # the reference test loop skips comments
            rows.append(line.rstrip("\r\n").split("\t"))
    df = pd.DataFrame(rows, columns=header)
    df["ord"] = range(len(df))
    return df


def _golden(path: str) -> dict[str, str]:
    out = {}
    for line in open(path):
        d = json.loads(line)
        out[next(iter(d))] = line.rstrip("\n")
    return out


@pytest.mark.parametrize("tsv,golden,kw", [
    ("dates.tsv", "dates0.jsonl", {}),
    ("P10.tsv", "P100.jsonl",
     {"alias_set": ("aliases",), "description_set": ("descriptions",)}),
    ("Q57160439.tsv", "Q571604390.jsonl",
     {"alias_set": ("aliases",), "description_set": ("descriptions",)}),
    ("ranked_example.tsv", "ranked0.jsonl", {}),
])
def test_mediawiki_jsons_byte_exact(ray_session, prop_types, tsv, golden,
                                    kw):
    df = _read_edges(f"{BASE}/{tsv}")
    # multiple blocks: the result must not depend on block structure
    ds = rd.from_pandas(df).repartition(4)
    out = generate_wikidata_jsons(ds, prop_types, order_col="ord",
                                  **kw).to_pandas()
    got = dict(zip(out.qnode, out.doc))
    want = _golden(f"{BASE}/{golden}")
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, want[k][:120], got[k][:120])
