"""Compressed TSV round-trip + KgtkWriter output formats
(reference kgtk/io/kgtkreader.py:693-698, kgtkwriter.py:32-61,393-520)."""
import gzip
import json

import pytest

import pandas as pd
import ray.data

from kgtk_ray.io.formats import format_lines, write_kgtk_file
from kgtk_ray.io.kgtk_tsv import read_kgtk_tsv_any, write_kgtk_tsv

EDGES = pd.DataFrame({
    "node1": ["Q1", "Q2"],
    "label": ["name", "born"],
    "node2": ['"Alice \\"A\\""', "^1990-01-01"],
})


def test_gz_roundtrip(ray_session, tmp_path):
    p = tmp_path / "edges.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("node1\tlabel\tnode2\n")
        for r in EDGES.itertuples(index=False):
            f.write("\t".join(r) + "\n")
    back = read_kgtk_tsv_any(str(p)).to_pandas().sort_values("node1")
    assert list(back.node2) == list(EDGES.node2)


def test_xz_roundtrip_string_fidelity(ray_session, tmp_path):
    """xz routes through stdlib lzma (no Arrow codec); cells that CSV
    inference would mangle (007, True) must come back verbatim."""
    import lzma
    p = tmp_path / "edges.tsv.xz"
    with lzma.open(p, "wt") as f:
        f.write("node1\tlabel\tnode2\nq1\tp\t007\nq2\tp\tTrue\n")
    back = read_kgtk_tsv_any(str(p)).to_pandas().sort_values("node1")
    assert list(back.node2) == ["007", "True"]


@pytest.mark.parametrize("ext,opener", [
    ("gz", lambda p: gzip.open(p, "rt")),
    ("xz", lambda p: __import__("lzma").open(p, "rt")),
])
def test_write_kgtk_file_compresses_by_extension(ray_session, tmp_path,
                                                 ext, opener):
    # reference kgtkwriter.py:162-180: output extension selects codec
    p = str(tmp_path / f"out.tsv.{ext}")
    write_kgtk_file(ray.data.from_pandas(EDGES), p)
    text = opener(p).read()
    assert text.startswith("node1\tlabel\tnode2\n")
    assert '"Alice \\"A\\""' in text


def test_bz2_roundtrip(ray_session, tmp_path):
    import bz2
    p = tmp_path / "edges.tsv.bz2"
    with bz2.open(p, "wt") as f:
        f.write("node1\tlabel\tnode2\nQ1\tp\tv\n")
    back = read_kgtk_tsv_any(str(p)).to_pandas()
    assert list(back.node2) == ["v"]


def test_csv_format(ray_session, tmp_path):
    out = tmp_path / "edges.csv"
    write_kgtk_file(ray.data.from_pandas(EDGES), str(out), fmt="csv")
    lines = out.read_text().splitlines()
    assert lines[0] == "node1,label,node2"
    body = sorted(lines[1:])
    # string unstringified then csv-quoted with doubled quotes;
    # datetime sigil stripped
    assert 'Q1,name,"Alice ""A"""' in body
    assert "Q2,born,1990-01-01" in body


def test_tsv_csvlike_and_unquoted(ray_session):
    ds = ray.data.from_pandas(EDGES)
    csvlike = sorted(format_lines(ds, "tsv-csvlike").to_pandas().line)
    assert 'Q1\tname\t"Alice ""A"""' in csvlike
    unquoted = sorted(format_lines(ds, "tsv-unquoted").to_pandas().line)
    assert 'Q1\tname\tAlice "A"' in unquoted


def test_jsonl_map(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["Q1"], "label": ["age"], "node2": ["42"], "extra": [""]}))
    row = json.loads(format_lines(ds, "jsonl-map").to_pandas().line[0])
    assert row == {"node1": "Q1", "label": "age", "node2": 42, "extra": ""}
    compact = json.loads(
        format_lines(ds, "jsonl-map-compact").to_pandas().line[0])
    assert "extra" not in compact


def test_md_format(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["a|b"], "label": ["p"], "node2": ["v"]}))
    line = format_lines(ds, "md").to_pandas().line[0]
    assert line == "| a\\|b | p | v |"


def test_plain_tsv_writer_still_works(ray_session, tmp_path):
    write_kgtk_tsv(ray.data.from_pandas(EDGES), str(tmp_path / "out"))
    files = list((tmp_path / "out").iterdir())
    assert files


@pytest.mark.parametrize("codec", ["gzip", "zstd", "xz"])
def test_write_kgtk_tsv_compressed_roundtrip(tmp_path, codec):
    import glob

    out = str(tmp_path / codec)
    write_kgtk_tsv(ray.data.from_pandas(EDGES), out, compression=codec)
    files = glob.glob(out + "/*")
    assert files and files[0].rsplit(".", 1)[-1] in ("gz", "zst", "xz")
    back = read_kgtk_tsv_any(files).to_pandas()
    want = EDGES.astype(str)
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].astype(str)
                                .to_numpy().tolist()))
    assert key(back) == key(want)


def test_jsonl_roundtrip_raw_cells(ray_session, tmp_path):
    """write_jsonl keeps raw KGTK cells; read_kgtk_jsonl is its
    lossless inverse (sigils, lists, empties intact)."""
    from kgtk_ray.io import read_kgtk_jsonl, write_jsonl
    df = pd.DataFrame({
        "node1": ["Q1", "Q2", "Q3"],
        "label": ["P1", "P2", "P3"],
        "node2": ['"a b"', "^2020-01-01T00:00:00Z/11", "x|y"],
        "extra": ["", "'de'@de", "+12[−1,1]m"],
    })
    out = tmp_path / "edges_jsonl"
    write_jsonl(ray.data.from_pandas(df), str(out))
    back = (read_kgtk_jsonl(str(out)).to_pandas()
            .sort_values("node1").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[df.columns.tolist()], df)


def test_jsonl_map_export_readback(ray_session, tmp_path):
    """The reference's jsonl-map-compact EXPORT read back: missing keys
    (compact empties) come back as '' and values are JSON-decoded."""
    from kgtk_ray.io import read_kgtk_jsonl
    df = pd.DataFrame({
        "node1": ["Q1", "Q2"],
        "label": ["P1", "P2"],
        "node2": ['"hello"', "42"],
        "extra": ["", "sym"],
    })
    path = tmp_path / "export.jl"
    write_kgtk_file(ray.data.from_pandas(df), str(path),
                    fmt="jsonl-map-compact")
    back = (read_kgtk_jsonl(str(path)).to_pandas()
            .sort_values("node1").reset_index(drop=True))
    # sigils decoded by the exporter (documented one-way), empties restored
    assert back["node2"].tolist() == ["hello", "42"]
    assert back["extra"].tolist() == ["", "sym"]


def test_jsonl_reader_resolves_aliases(ray_session, tmp_path):
    """normalize=True resolves KGTK column aliases on jsonl input just
    as the TSV reader does (from/predicate/to -> node1/label/node2)."""
    import json
    from kgtk_ray.io import read_kgtk_jsonl
    p = tmp_path / "alias.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"from": "a", "predicate": "p", "to": "b"}) + "\n")
        f.write(json.dumps({"from": "c", "predicate": "q", "to": "d"}) + "\n")
    back = read_kgtk_jsonl(str(p)).to_pandas().sort_values("node1")
    assert list(back.columns) == ["node1", "label", "node2"]
    assert back.node1.tolist() == ["a", "c"]


def test_json_wholefile_format(ray_session, tmp_path):
    """Whole-file `json` format: '[' line, compact header array with a
    trailing comma, one compact row array + ',' per row, closing ']'
    (reference kgtkwriter.py:534-536,639,669-672)."""
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["Q1"], "label": ["age"], "node2": ["42"]}))
    p = str(tmp_path / "o.json")
    write_kgtk_file(ds, p, fmt="json")
    body = open(p).read()
    assert body == ('[\n["node1","label","node2"],\n'
                    '["Q1","age",42],\n]\n')


def test_json_map_wholefile_formats(ray_session, tmp_path):
    """`json-map`/`json-map-compact`: '[' + object rows with trailing
    commas; the reference's close() terminates only the `json` array
    (kgtkwriter.py:669-672), so no ']' — mirrored for byte parity.
    The compact variant drops empty-valued columns."""
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["Q1"], "label": ["p"], "node2": [""]}))
    p = str(tmp_path / "o.jsonmap")
    write_kgtk_file(ds, p, fmt="json-map")
    assert open(p).read() == ('[\n{"node1":"Q1","label":"p","node2":""},\n')
    p2 = str(tmp_path / "o.jsonmapc")
    write_kgtk_file(ds, p2, fmt="json-map-compact")
    assert open(p2).read() == ('[\n{"node1":"Q1","label":"p"},\n')
