"""The reference-compatible CLI (`python -m kgtk_ray ...`): pipe
grammar, option mapping, and golden parity with the reference's own
shell-test pipelines (kgtk/join/test/*.sh)."""
import os

import pandas as pd
import pytest

from kgtk_ray.cli import main

REF = "/root/reference/kgtk/join/test"
DATA = os.path.join(os.path.dirname(__file__), "data")


def run(argv):
    rc = main(argv)
    assert rc == 0, f"CLI failed (rc={rc}): {argv}"


def read_tsv(path):
    import csv
    return pd.read_csv(path, sep="\t", dtype=str, keep_default_na=False,
                       quoting=csv.QUOTE_NONE)


def rowset(df):
    return sorted(map(tuple, df.fillna("").astype(str).to_numpy()))


def write_tsv(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


@pytest.fixture
def edges_file(tmp_path):
    return write_tsv(tmp_path / "edges.tsv", (
        "node1\tlabel\tnode2\n"
        "peter\tzipcode\t12040\n"
        "peter\tzipcode\t12040\n"
        "steve\tzipcode\t45601\n"
        "john\tposition\tengineer\n"
        "john\tzipcode\t\n"
    ))


def test_cc_test1_pipe_chain_golden(tmp_path):
    """The reference's cc-test1.sh 4-stage pipe, run through the CLI
    grammar with `-` label-file plumbing; row-set equal to the golden
    captured from the reference CLI."""
    out = str(tmp_path / "connected.tsv")
    run(["connected-components", "--properties", "mw:SameAs",
         "--input-file", f"{REF}/cc-file1.tsv",
         "/", "lift", "--input-file", f"{REF}/cc-file1.tsv",
         "--label-file", "-", "--columns-to-lift", "node1", "node2",
         "--lift-suffix=", "--label-select-value", "connected_component",
         "/", "filter", "--invert", "-p", ";mw:SameAs;",
         "/", "compact", "--output-file", out])
    assert rowset(read_tsv(out)) == rowset(
        read_tsv(f"{DATA}/cc_pipeline_golden.tsv"))


def test_filter_pattern_and_reject(edges_file, tmp_path):
    out, rej = str(tmp_path / "o.tsv"), str(tmp_path / "r.tsv")
    run(["filter", "-i", edges_file, "-p", " ; zipcode ; ",
         "--reject-file", rej, "-o", out])
    kept, rejected = read_tsv(out), read_tsv(rej)
    assert set(kept["label"]) == {"zipcode"} and len(kept) == 4
    assert set(rejected["label"]) == {"position"} and len(rejected) == 1


def test_filter_invert_or(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["filter", "-i", edges_file, "-p", "peter,steve ; ; ", "--or",
         "--invert", "-o", out])
    assert set(read_tsv(out)["node1"]) == {"john"}


def test_sort_positional_and_numeric_columns(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["sort", edges_file, "--columns", "1,3", "-o", out])
    df = read_tsv(out)
    assert list(df["node1"]) == sorted(df["node1"])


def test_pipe_filter_sort_compact(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["filter", "-i", edges_file, "-p", ";zipcode;",
         "/", "compact", "/", "sort", "-o", out])
    df = read_tsv(out)
    # duplicate peter rows compacted to one
    assert len(df) == 3
    assert list(df["node1"]) == ["john", "peter", "steve"]


def test_cat_and_rename(edges_file, tmp_path):
    other = write_tsv(tmp_path / "more.tsv",
                      "node1\tlabel\tnode2\nmary\tzipcode\t90001\n")
    out = str(tmp_path / "o.tsv")
    run(["cat", "-i", edges_file, other, "-o", out])
    assert len(read_tsv(out)) == 6
    run(["cat", "-i", edges_file, "--old-columns", "node2",
         "--new-columns", "where", "-o", out])
    assert "where" in read_tsv(out).columns


def test_ifexists_and_reject(edges_file, tmp_path):
    filt = write_tsv(tmp_path / "f.tsv", "node1\nid\npeter\n")
    out, rej = str(tmp_path / "o.tsv"), str(tmp_path / "r.tsv")
    run(["ifexists", edges_file, "--filter-on", filt,
         "--input-keys", "node1", "--filter-keys", "node1",
         "--reject-file", rej, "-o", out])
    assert set(read_tsv(out)["node1"]) == {"peter"}
    assert set(read_tsv(rej)["node1"]) == {"steve", "john"}


def test_ifnotexists(edges_file, tmp_path):
    filt = write_tsv(tmp_path / "f.tsv", "node1\nid\npeter\n")
    out = str(tmp_path / "o.tsv")
    run(["ifnotexists", edges_file, "--filter-on", filt,
         "--input-keys", "node1", "--filter-keys", "node1", "-o", out])
    assert set(read_tsv(out)["node1"]) == {"steve", "john"}


def test_join_reference_fixture(tmp_path):
    """kgtk join on the reference's own joiner fixtures, inner mode."""
    out = str(tmp_path / "o.tsv")
    run(["join", "--left-file", f"{REF}/kgtkjoiner-file1.tsv",
         "--right-file", f"{REF}/kgtkjoiner-file2.tsv", "-o", out])
    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops import kgtk_join
    want = kgtk_join(read_kgtk_tsv(f"{REF}/kgtkjoiner-file1.tsv"),
                     read_kgtk_tsv(f"{REF}/kgtkjoiner-file2.tsv"))
    assert rowset(read_tsv(out)) == rowset(want.to_pandas())


def test_unique_formats(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["unique", edges_file, "--column", "label", "-o", out])
    df = read_tsv(out)
    assert rowset(df) == rowset(pd.DataFrame(
        {"node1": ["position", "zipcode"], "label": ["count", "count"],
         "node2": ["1", "4"]}))
    run(["unique", edges_file, "--column", "label", "--label", "total",
         "-o", out])
    assert set(read_tsv(out)["label"]) == {"total"}


def test_compact_build_id(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["compact", "-i", edges_file, "--build-id",
         "--id-style", "node1-label-node2", "-o", out])
    df = read_tsv(out)
    assert "id" in df.columns
    assert all(i for i in df["id"])


def test_add_id_styles(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["add-id", "-i", edges_file, "--id-style", "prefix###",
         "--id-prefix", "E", "-o", out])
    ids = list(read_tsv(out)["id"])
    assert ids == [f"E{i}" for i in range(1, 6)]


def test_lift_reference_fixture(tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["lift", f"{REF}/lift-file1.tsv", "-o", out])
    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops import lift
    want = lift(read_kgtk_tsv(f"{REF}/lift-file1.tsv"))
    assert rowset(read_tsv(out)) == rowset(want.to_pandas().fillna(""))


def test_explode_implode_roundtrip(tmp_path):
    src = write_tsv(tmp_path / "v.tsv", (
        "node1\tlabel\tnode2\n"
        'q1\tp1\t"hello"\n'
        "q1\tp2\t42\n"
    ))
    mid = str(tmp_path / "exploded.tsv")
    out = str(tmp_path / "imploded.tsv")
    run(["explode", "-i", src, "-o", mid])
    df = read_tsv(mid)
    assert "node2;kgtk:data_type" in df.columns
    run(["implode", "-i", mid, "-o", out])
    got = read_tsv(out)
    assert set(got["node2"]) == {'"hello"', "42"}


def test_remove_reorder_columns(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["remove-columns", "-i", edges_file, "-c", "label", "-o", out])
    assert list(read_tsv(out).columns) == ["node1", "node2"]
    run(["reorder-columns", "-i", edges_file, "-c", "node2", "...",
         "-o", out])
    assert list(read_tsv(out).columns)[0] == "node2"


def test_calc_percentage(tmp_path):
    src = write_tsv(tmp_path / "c.tsv",
                    "node1\tlabel\tnode2\ttotal\na\tp\t50\t200\n")
    out = str(tmp_path / "o.tsv")
    run(["calc", "-i", src, "-c", "node2", "total", "--do", "percentage",
         "-o", out])
    assert read_tsv(out)["result"][0] == "25.00"


def test_sampling_flags(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["cat", "-i", edges_file, "--record-limit", "2", "-o", out])
    assert len(read_tsv(out)) == 2
    run(["cat", "-i", edges_file, "--every-nth-record", "2", "-o", out])
    assert len(read_tsv(out)) == 2
    run(["cat", "-i", edges_file, "--initial-skip-count", "3", "-o", out])
    assert len(read_tsv(out)) == 2
    run(["cat", "-i", edges_file, "--tail-count", "1", "-o", out])
    df = read_tsv(out)
    assert len(df) == 1 and df["node1"][0] == "john"


def test_clean_data_reject_file(tmp_path):
    src = write_tsv(tmp_path / "d.tsv", (
        "node1\tlabel\tnode2\n"
        "q1\tp1\t^1999-12-31T00:00:00Z/11\n"
        "q2\tp1\t^20x0-00-00T99\n"
    ))
    out, rej = str(tmp_path / "o.tsv"), str(tmp_path / "r.tsv")
    run(["clean-data", "-i", src, "--reject-file", rej, "-o", out])
    assert list(read_tsv(out)["node1"]) == ["q1"]
    assert list(read_tsv(rej)["node1"]) == ["q2"]


def test_output_formats(edges_file, tmp_path):
    md = str(tmp_path / "o.md")
    run(["md", "-i", edges_file, "-o", md])
    text = open(md).read()
    assert text.startswith("|") and "peter" in text
    jl = str(tmp_path / "o.jsonl")
    run(["cat", "-i", edges_file, "--output-format", "jsonl-map",
         "-o", jl])
    import json
    rows = [json.loads(l) for l in open(jl)]
    assert rows[0]["node1"] == "peter"
    # whole-file json: "[", header array + ",", rows + ",", "]"
    # (reference kgtkwriter.py:534-536,639,669-672)
    js = str(tmp_path / "o.json")
    run(["cat", "-i", edges_file, "--output-format", "json", "-o", js])
    lines = open(js).read().splitlines()
    assert lines[0] == "[" and lines[-1] == "]"
    assert json.loads(lines[1][:-1]) == ["node1", "label", "node2"]
    assert json.loads(lines[2][:-1])[0] == "peter"
    jm = str(tmp_path / "o.jsonmap")
    run(["cat", "-i", edges_file, "--output-format", "json-map",
         "-o", jm])
    mlines = open(jm).read().splitlines()
    assert mlines[0] == "[" and mlines[-1].endswith(",")  # json-only "]"
    assert json.loads(mlines[1][:-1])["node1"] == "peter"


def test_unreify_values_docs_example(tmp_path):
    """The docs/transform/unreify_values.md worked example through the
    CLI surface."""
    src = write_tsv(tmp_path / "u.tsv", (
        "node1\tlabel\tnode2\tid\n"
        "john\tposition\tV1\tE1\n"
        "V1\trdf:type\tposition_value\tE2\n"
        "V1\tvalue\tengineer\tE3\n"
    ))
    out = str(tmp_path / "o.tsv")
    run(["unreify-values", "-i", src,
         "--trigger-label", "rdf:type",
         "--trigger-node2", "position_value",
         "--value-label", "value", "--old-label", "position",
         "--new-label", "position", "-o", out])
    df = read_tsv(out)
    assert ("john", "position", "engineer") in set(
        zip(df["node1"], df["label"], df["node2"]))


def test_import_ntriples_fixture(tmp_path):
    """import-ntriples on the reference's own fixture, row-set equal to
    the library op the goldens pin."""
    out = str(tmp_path / "o.tsv")
    src = f"{REF}/import-ntriples-file2.ttl.nt"
    run(["import-ntriples", "-i", src, "-o", out])
    import ray.data

    from kgtk_ray.io.rdf import import_ntriples
    want = import_ntriples(ray.data.read_text(src),
                           line_col="text").to_pandas()
    assert rowset(read_tsv(out)) == rowset(want)


def test_graph_statistics_cli(edges_file, tmp_path):
    out = str(tmp_path / "o.tsv")
    run(["graph-statistics", "-i", edges_file, "--statistics-only",
         "--degrees", "-o", out])
    df = read_tsv(out)
    assert set(df["label"]) <= {"vertex_in_degree", "vertex_out_degree"}
    assert len(df) > 0


def test_reachable_nodes_cli(tmp_path):
    src = write_tsv(tmp_path / "g.tsv", (
        "node1\tlabel\tnode2\n"
        "a\tp\tb\nb\tp\tc\nx\tp\ty\n"
    ))
    out = str(tmp_path / "o.tsv")
    run(["reachable-nodes", "-i", src, "--root", "a", "-o", out])
    df = read_tsv(out)
    assert set(df["node2"]) == {"b", "c"}


def test_out_of_scope_commands_error():
    assert main(["import-wordnet"]) == 2
    assert main(["export-gt"]) == 2


def test_unknown_command_error():
    assert main(["frobnicate"]) == 2


def test_text_embedding_cli(tmp_path):
    src = write_tsv(tmp_path / "e.tsv", (
        "node1\tlabel\tnode2\n"
        'q1\tlabel\t"apple"\n'
        'q1\tdescription\t"a fruit"\n'
        'q2\tlabel\t"car"\n'
    ))
    out = str(tmp_path / "o.tsv")
    run(["text-embedding", "-i", src, "-o", out])
    df = read_tsv(out)
    assert set(df["node1"]) == {"q1", "q2"}
    assert all("," in v for v in df["node2"])  # comma-joined vectors
    assert set(df["label"]) == {"text_embedding"}


def test_side_file_alias_does_not_hijack_output_spelling(tmp_path):
    """A filter-on side file spelling `label` as `relation` must not
    rewrite the primary input's canonical header: alias restoration is
    recorded from primary inputs only (ADVICE r4)."""
    prim = write_tsv(tmp_path / "prim.tsv", (
        "node1\tlabel\tnode2\n"
        "a\tp1\tx\n"
        "b\tp2\ty\n"
    ))
    side = write_tsv(tmp_path / "side.tsv", (
        "node1\trelation\tnode2\n"
        "a\tp1\tx\n"
    ))
    out = str(tmp_path / "out.tsv")
    run(["ifexists", "-i", prim, "--filter-on", side, "-o", out])
    df = read_tsv(out)
    assert list(df.columns) == ["node1", "label", "node2"]
    assert set(df["node1"]) == {"a"}
    # and the converse: a primary spelled `relation` keeps `relation`
    out2 = str(tmp_path / "out2.tsv")
    run(["ifexists", "-i", side, "--filter-on", prim, "-o", out2])
    assert list(read_tsv(out2).columns) == ["node1", "relation", "node2"]


def test_alias_restore_survives_empty_result(tmp_path):
    """A chain that drops every row of an alias-spelled input must
    still emit (empty) output instead of crashing on a None schema
    (ADVICE r4)."""
    src = write_tsv(tmp_path / "r.tsv", (
        "node1\trelation\tnode2\n"
        "a\tp1\tx\n"
    ))
    out = str(tmp_path / "o.tsv")
    run(["filter", "-i", src, "-p", " ; nomatch ; ", "-o", out])
    assert os.path.exists(out)
    body = open(out).read()
    assert body == "" or len(body.splitlines()) == 1  # header at most
