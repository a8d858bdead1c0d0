"""Conformance against the reference's own fixture corpus.

Inputs are the tiny TSV fixtures under /root/reference/kgtk/join/test/
(the reference's operator-semantics oracle, SURVEY §5 layer 3), read
through our KGTK TSV reader; expected outputs are the reference's
checked-in golden files or the worked examples in
/root/reference/docs/transform/*.md.  Comparisons are order-insensitive
(KGTK rows are set-semantics, docs/specification.md:24).
"""
from __future__ import annotations

import pandas as pd
import pytest

import kgtk_ray.ops as O
from kgtk_ray.io import read_kgtk_tsv

REF = "/root/reference/kgtk/join/test"


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.fillna("").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def read_ref(name: str) -> pd.DataFrame:
    return pd.read_csv(f"{REF}/{name}", sep="\t", dtype=str, keep_default_na=False)


def test_compact_file1_matches_reference_docs():
    # golden from /root/reference/docs/transform/compact.md ("kgtk compact file1.tsv")
    ds = read_kgtk_tsv(f"{REF}/compact-file1.tsv")
    got = norm(O.compact(ds, ["node1", "label", "node2"]).to_pandas())
    want = norm(pd.DataFrame({
        "node1": ["john", "john", "peter", "steve"],
        "label": ["zipcode"] * 4,
        "node2": ["12345", "12346", "12040", "45601"],
        "location": ["home", "", "cabin|home|work", "cabin|home|work"],
        "years": ["10", "", "5|6", "1|2|3|4|5"],
    }))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_ifexists_test1_default_keys_matches_golden():
    ds = read_kgtk_tsv(f"{REF}/ifexists-test1-file1.tsv")
    filt = read_kgtk_tsv(f"{REF}/ifexists-test1-file2.tsv")
    got = norm(O.ifexists(ds, filt).to_pandas())
    want = norm(read_ref("ifexists-test1-default-output.tsv"))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_ifexists_preserve_order_both_paths():
    # reference --preserve-order (kgtk/iff/kgtkifexists.py:17-21):
    # surviving rows in INPUT order, replayed on the reference's own
    # ifexists-test1 fixture.  Exercised on both the broadcast path and
    # (by shrinking BROADCAST_LIMIT) the bucketed-join path, which is
    # the one that genuinely reorders.
    import ray.data

    import kgtk_ray.ops.shuffle as S
    # many single-row blocks in scrambled-ish block order
    rows = [
        {"node1": "steve", "label": "zipcode", "node2": "45601"},
        {"node1": "john", "label": "zipcode", "node2": "12345"},
        {"node1": "peter", "label": "zipcode", "node2": "12040"},
        {"node1": "john", "label": "zipcode", "node2": "12346"},
        {"node1": "peter", "label": "zipcode", "node2": "12041"},
        {"node1": "steve", "label": "zipcode", "node2": "45602"},
    ]
    ds = ray.data.from_pandas([pd.DataFrame([r]) for r in rows])
    filt = ray.data.from_pandas(pd.DataFrame(
        {"node1": ["john", "peter"], "label": ["zipcode"] * 2,
         "node2": ["12345", "12040"]}))
    want = [(r["node1"], r["node2"]) for r in rows
            if r["node1"] in ("john", "peter")]
    got = O.ifexists(ds, filt, input_keys=["node1"], filter_keys=["node1"],
                     preserve_order=True).to_pandas()
    assert list(zip(got.node1, got.node2)) == want
    old = S.BROADCAST_LIMIT
    try:
        S.BROADCAST_LIMIT = 1  # force the bucketed-join path
        got2 = O.ifexists(ds, filt, input_keys=["node1"],
                          filter_keys=["node1"],
                          preserve_order=True).to_pandas()
        assert list(zip(got2.node1, got2.node2)) == want
        got3 = O.ifnotexists(ds, filt, input_keys=["node1"],
                             filter_keys=["node1"],
                             preserve_order=True).to_pandas()
        assert list(got3.node1) == ["steve", "steve"]
    finally:
        S.BROADCAST_LIMIT = old


def test_ifexists_test1_node1_keys_matches_golden():
    ds = read_kgtk_tsv(f"{REF}/ifexists-test1-file1.tsv")
    filt = read_kgtk_tsv(f"{REF}/ifexists-test1-file2.tsv")
    got = norm(O.ifexists(ds, filt, input_keys=["node1"],
                          filter_keys=["node1"]).to_pandas())
    want = norm(read_ref("ifexists-test1-node1-output.tsv"))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_ifexists_test2_label_node2_keys_matches_golden():
    ds = read_kgtk_tsv(f"{REF}/ifexists-test2-file1.tsv")
    filt = read_kgtk_tsv(f"{REF}/ifexists-test2-file2.tsv", normalize=False)
    got = norm(O.ifexists(ds, filt, input_keys=["label", "node2"],
                          filter_keys=["label", "node2"]).to_pandas())
    want = norm(read_ref("ifexists-test2-label-and-node2-output.tsv"))
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_expand_round_trips_compact_file1():
    # expand(compact(x)) restores one row per (key, list element) with
    # positional pairing across list columns (docs/transform/expand.md)
    ds = read_kgtk_tsv(f"{REF}/compact-file1.tsv")
    compacted = O.compact(ds, ["node1", "label", "node2"])
    got = norm(O.expand_lists(compacted,
                              columns=["location", "years"]).to_pandas())
    # compact sorts each column's values independently, so positional
    # expansion recovers the original SET of non-empty cell values per
    # key, not the original row pairings
    orig = norm(read_ref("compact-file1.tsv"))
    for col in ("location", "years"):
        got_pairs = {(r.node1, r.node2, getattr(r, col))
                     for r in got.itertuples() if getattr(r, col)}
        want_pairs = {(r.node1, r.node2, getattr(r, col))
                      for r in orig.itertuples() if getattr(r, col)}
        assert got_pairs == want_pairs, col
    assert set(map(tuple, got[["node1", "node2"]].values)) == \
        set(map(tuple, orig[["node1", "node2"]].values))


def test_lift_file1_matches_reference_docs():
    # golden from /root/reference/docs/transform/lift.md ("kgtk lift file1.tsv")
    out = O.lift(read_kgtk_tsv(f"{REF}/lift-file1.tsv")).to_pandas()
    expect = pd.DataFrame(
        [["Q1", "P1", "Q5", '"Elmo"', '"instance of"', '"human"'],
         ["Q1", "P2", "Q6", '"Elmo"', '"friend"', '"Fred"'],
         ["Q6", "P1", "Q5", '"Fred"', '"instance of"', '"human"']],
        columns=["node1", "label", "node2",
                 "node1;label", "label;label", "node2;label"])
    pd.testing.assert_frame_equal(norm(out[expect.columns.tolist()]),
                                  norm(expect))


def test_lift_file4_multilabel_sorted_unique_list():
    # golden from lift.md ("kgtk lift file4.tsv"): multiple label records
    # merge into a sorted, deduplicated |-list
    out = O.lift(read_kgtk_tsv(f"{REF}/lift-file4.tsv")).to_pandas()
    expect = pd.DataFrame(
        [["Q1", "P1", "Q5", '"Elmo"', '"instance of"',
          '"homo sapiens"|"human"'],
         ["Q1", "P2", "Q6", '"Elmo"', '"amigo"|"friend"', '"Fred"'],
         ["Q6", "P1", "Q5", '"Fred"', '"instance of"',
          '"homo sapiens"|"human"']],
        columns=["node1", "label", "node2",
                 "node1;label", "label;label", "node2;label"])
    pd.testing.assert_frame_equal(norm(out[expect.columns.tolist()]),
                                  norm(expect))


def test_unique_location_matches_reference_docs():
    # golden from /root/reference/docs/transform/unique.md: empty cells
    # are skipped by default ("kgtk unique file1.tsv --column location")
    out = O.unique_counts(read_kgtk_tsv(f"{REF}/unique-file1.tsv"),
                          "location").to_pandas()
    expect = pd.DataFrame([["home", "count", "2"], ["work", "count", "3"]],
                          columns=["node1", "label", "node2"])
    pd.testing.assert_frame_equal(norm(out), norm(expect))


def test_unique_location_empty_substitution():
    # "--empty NONE": empties counted under the substitute label
    out = O.unique_counts(read_kgtk_tsv(f"{REF}/unique-file1.tsv"),
                          "location", empty_value="NONE").to_pandas()
    expect = pd.DataFrame([["NONE", "count", "3"], ["home", "count", "2"],
                           ["work", "count", "3"]],
                          columns=["node1", "label", "node2"])
    pd.testing.assert_frame_equal(norm(out), norm(expect))


def _join_docs_inputs():
    import ray.data
    f1 = ray.data.from_pandas(pd.DataFrame(
        [["john", "zipcode", "12345", "home"],
         ["john", "zipcode", "12346", "work"],
         ["peter", "zipcode", "12040", "home"],
         ["peter", "zipcode", "12040", "work"],
         ["steve", "zipcode", "45601", "home"],
         ["steve", "zipcode", "45601", "work"]],
        columns=["node1", "label", "node2", "location"]))
    f2 = ray.data.from_pandas(pd.DataFrame(
        [["john", "position", "programmer", "3"],
         ["peter", "position", "engineer", "2"],
         ["edward", "position", "supervisor", "10"],
         ["john", "laptop", "dell", "4"],
         ["peter", "laptop", "apple", "7"]],
        columns=["node1", "label", "node2", "years"]))
    return f1, f2


def test_join_inner_matches_reference_docs():
    # golden from /root/reference/docs/transform/join.md ("kgtk join
    # file1.tsv file2.tsv"): key-set filtered union on node1
    f1, f2 = _join_docs_inputs()
    out = O.kgtk_join(f1, f2).to_pandas()
    expect = pd.DataFrame(
        [["john", "zipcode", "12345", "home", ""],
         ["john", "zipcode", "12346", "work", ""],
         ["peter", "zipcode", "12040", "home", ""],
         ["peter", "zipcode", "12040", "work", ""],
         ["john", "position", "programmer", "", "3"],
         ["peter", "position", "engineer", "", "2"],
         ["john", "laptop", "dell", "", "4"],
         ["peter", "laptop", "apple", "", "7"]],
        columns=["node1", "label", "node2", "location", "years"])
    pd.testing.assert_frame_equal(norm(out[expect.columns.tolist()]),
                                  norm(expect))


def test_join_left_matches_reference_docs():
    # golden from join.md ("kgtk join ... --left-join"): steve's rows
    # return, edward's stay excluded
    f1, f2 = _join_docs_inputs()
    out = O.kgtk_join(f1, f2, left_join=True).to_pandas()
    assert len(out) == 10
    assert "edward" not in set(out["node1"])
    assert (out["node1"] == "steve").sum() == 2


def test_explode_field_values_match_reference_docs():
    # golden from /root/reference/docs/transform/explode.md ("kgtk
    # explode file1.tsv"): field naming <col>;kgtk:<field> and the
    # reference's field renderings (numbers normalized, lq-string text
    # re-quoted, date wrapped in quotes, precision extracted)
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(
        [["john", "string", '"John"'],
         ["john", "lqstring", "'John'@en"],
         ["john", "number", "186.2e04"],
         ["john", "quantity", "84.3[84,85]kg"],
         ["john", "date_and_time", "^1960-11-05T00:00Z/6"],
         ["john", "location", "@60.2/134.3"],
         ["john", "boolean", "True"],
         ["john", "symbol", "quadrature"]],
        columns=["node1", "label", "node2"]))
    out = O.explode_node2(ds).to_pandas().set_index("label")

    def g(row, field):
        return str(out.loc[row, f"node2;kgtk:{field}"])

    assert g("string", "data_type") == "string"
    assert g("string", "text") == '"John"'
    assert g("lqstring", "data_type") == "language_qualified_string"
    assert g("lqstring", "text") == '"John"'
    assert g("lqstring", "language") == "en"
    assert g("number", "data_type") == "number"
    assert float(g("number", "number")) == 1862000.0
    assert g("quantity", "data_type") == "quantity"
    assert float(g("quantity", "number")) == 84.3
    assert float(g("quantity", "low_tolerance")) == 84.0
    assert float(g("quantity", "high_tolerance")) == 85.0
    assert g("quantity", "si_units") == "kg"
    assert g("date_and_time", "data_type") == "date_and_times"
    assert g("date_and_time", "date_and_time") == '"1960-11-05T00:00Z"'
    assert float(g("date_and_time", "precision")) == 6  # numeric column
    assert g("location", "data_type") == "location_coordinates"
    assert float(g("location", "latitude")) == 60.2
    assert float(g("location", "longitude")) == 134.3
    assert g("boolean", "data_type") == "boolean"
    assert g("boolean", "truth") == "True"
    assert g("symbol", "data_type") == "symbol"
    assert g("symbol", "symbol") == "quadrature"


def test_explode_list_expansion_opt_in():
    # reference kgtkexplode.py:45,173: --expand defaults False — a
    # |-list row stays whole, carrying only data_type/valid/list_len;
    # with --expand it becomes one output row per item
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(
        [["john", "list", "home|work"]],
        columns=["node1", "label", "node2"]))
    whole = O.explode_node2(ds).to_pandas()
    assert whole["node2"].tolist() == ["home|work"]
    assert whole["node2;kgtk:list_len"].tolist() == [2]
    out = O.explode_node2(ds, expand_list=True).to_pandas().sort_values("node2")
    assert out["node2"].tolist() == ["home", "work"]
    assert out["node2;kgtk:data_type"].tolist() == ["symbol", "symbol"]


def test_reorder_columns_ellipsis_and_trim():
    # reference reorder_columns.py:131-146: "... col" moves col to the
    # end, "col ..." moves it to the front; --trim drops unmentioned
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(
        [["e1", "a", "p", "b", "x"]],
        columns=["id", "node1", "label", "node2", "extra"]))
    to_end = O.reorder_columns(ds, ["...", "id"]).to_pandas()
    assert list(to_end.columns) == ["node1", "label", "node2", "extra", "id"]
    to_front = O.reorder_columns(ds, ["extra", "..."]).to_pandas()
    assert list(to_front.columns) == ["extra", "id", "node1", "label",
                                      "node2"]
    ranged = O.reorder_columns(ds, ["node1", "..", "node2", "..."]).to_pandas()
    assert list(ranged.columns) == ["node1", "label", "node2", "id", "extra"]
    trimmed = O.reorder_columns(ds, ["node1", "node2"], trim=True).to_pandas()
    assert list(trimmed.columns) == ["node1", "node2"]
    import pytest as _p
    with _p.raises(ValueError):
        O.reorder_columns(ds, ["...", "id", "..."])


@pytest.mark.parametrize("t,f1,f2,lj", [
    ("test1_inner", "kgtkjoiner-test1-file1.tsv",
     "kgtkjoiner-test1-file2.tsv", False),
    ("test1_left", "kgtkjoiner-test1-file1.tsv",
     "kgtkjoiner-test1-file2.tsv", True),
    ("test2_inner", "kgtkjoiner-test2-file1.tsv",
     "kgtkjoiner-test2-file2.tsv", False),
    ("test2_left", "kgtkjoiner-test2-file1.tsv",
     "kgtkjoiner-test2-file2.tsv", True),
])
def test_kgtk_join_reference_fixture_golden(t, f1, f2, lj):
    """Row-set parity with the reference joiner's own output on its
    kgtkjoiner-test1/2 fixtures (kgtk/join/test/kgtkjoiner-*.sh) —
    covers edge-mode (node1 key) and node-mode (id key) defaults, inner
    and left.  Goldens in tests/data/ were produced by running the
    reference kgtk/join/kgtkjoiner.py with each script's arguments."""
    import csv
    import os

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.shuffle import kgtk_join

    L = read_kgtk_tsv(f"{REF}/{f1}")
    R = read_kgtk_tsv(f"{REF}/{f2}")
    out = kgtk_join(L, R, left_join=lj).to_pandas().fillna("")
    gold = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data",
                     f"joiner_{t}_golden.tsv"),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)
    assert sorted(out.columns) == sorted(gold.columns)
    cols = sorted(gold.columns)
    assert (sorted(map(tuple, out[cols].astype(str).to_numpy()))
            == sorted(map(tuple, gold[cols].to_numpy())))


@pytest.mark.parametrize("fixture,golden,kw", [
    ("compact-file1.tsv", "compact_golden1.tsv", {}),
    # id column present: the reference's default edge key EXTENDS to
    # (node1,label,node2,id) — rows with distinct ids stay separate
    # (kgtk/reshape/kgtkcompact.py:236-243)
    ("compact-file3.tsv", "compact_golden3.tsv", {}),
    ("compact-file4.tsv", "compact_golden4.tsv", {}),
    # --compact-id: id drops out of the key and merges into | lists
    ("compact-file3.tsv", "compact_golden3_cid.tsv", {"compact_id": True}),
])
def test_compact_reference_fixture_golden(fixture, golden, kw):
    """Row-set parity with the reference compactor's own output on its
    kgtk/join/test fixtures (goldens in tests/data/, produced by running
    kgtk/reshape/kgtkcompact.py with default arguments)."""
    import csv
    import os

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.shuffle import compact

    out = compact(read_kgtk_tsv(f"{REF}/{fixture}"), **kw).to_pandas()
    gold = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data", golden),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)
    cols = sorted(gold.columns)
    assert sorted(out.columns) == cols
    assert (sorted(map(tuple, out[cols].astype(str).to_numpy()))
            == sorted(map(tuple, gold[cols].to_numpy())))


@pytest.mark.parametrize("i", [1, 4, 9, 10])
def test_lift_reference_fixture_golden(i):
    """Row-set parity with the reference lifter's own output on its
    lift-file* fixtures (default arguments: label rows from the input
    itself, lifted into ;label columns, label rows removed)."""
    import csv
    import os

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.shuffle import lift

    out = lift(read_kgtk_tsv(f"{REF}/lift-file{i}.tsv")).to_pandas().fillna("")
    gold = pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data",
                     f"lift_golden{i}.tsv"),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)
    cols = sorted(gold.columns)
    assert sorted(out.columns) == cols
    assert (sorted(map(tuple, out[cols].astype(str).to_numpy()))
            == sorted(map(tuple, gold[cols].to_numpy())))


def test_lift_all_label_rows_keeps_schema():
    """lift-file6 holds ONLY label rows: the reference emits an empty
    table under the full lifted header.  The Dataset schema must keep
    all six columns even though every row was removed (to_pandas() on
    an all-empty pandas-block dataset drops columns — a Ray quirk, so
    assert on the Dataset schema)."""
    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.ops.shuffle import lift

    out = lift(read_kgtk_tsv(f"{REF}/lift-file6.tsv"))
    assert sorted(out.schema().names) == [
        "label", "label;label", "node1", "node1;label",
        "node2", "node2;label"]
    assert out.count() == 0


def _golden(name):
    import csv
    import os
    return pd.read_csv(
        os.path.join(os.path.dirname(__file__), "data", name),
        sep="\t", dtype=str, keep_default_na=False, quoting=csv.QUOTE_NONE)


def _rowset(df):
    cols = sorted(df.columns)
    return cols, sorted(map(tuple, df[cols].astype(str).to_numpy()))


def test_expand_reference_fixture_golden():
    """Parity with the reference expander's own output on
    expand-file1.tsv (kgtk/reshape/kgtkexpand.py defaults: the edge
    required columns auto-join the key set even with --columns empty,
    the rest expand positionally)."""
    out = O.expand_lists(read_kgtk_tsv(f"{REF}/expand-file1.tsv"),
                         key_columns=[]).to_pandas()
    gold = _golden("expand_golden1.tsv")
    assert _rowset(out) == _rowset(gold)


def test_unique_reference_fixture_golden():
    """Parity with the reference unique's output on unique-file1.tsv
    (--column location)."""
    out = O.unique_counts(read_kgtk_tsv(f"{REF}/unique-file1.tsv"),
                          "location").to_pandas()
    gold = _golden("unique_golden1.tsv")
    assert _rowset(out) == _rowset(gold)


def test_ifempty_reference_fixture_golden():
    """Parity with the reference ifempty's output on ifempty-file1.tsv
    (--columns location)."""
    out = O.ifempty(read_kgtk_tsv(f"{REF}/ifempty-file1.tsv"),
                    ["location"]).to_pandas()
    gold = _golden("ifempty_golden1.tsv")
    assert _rowset(out) == _rowset(gold)


@pytest.mark.parametrize("i", [1, 2])
def test_explode_reference_fixture_golden(i):
    """Parity with the reference exploder's own output on
    explode-file{1,2}.tsv (kgtk explode defaults: node2, all fields,
    lists expanded first)."""
    from kgtk_ray.ops.validate import explode_node2
    out = explode_node2(read_kgtk_tsv(f"{REF}/explode-file{i}.tsv"),
                        kgtk_cells=True).to_pandas()
    assert _rowset(out) == _rowset(_golden(f"explode_golden{i}.tsv"))


def test_implode_reference_fixture_golden1():
    """Parity with the reference imploder on implode-file1.tsv
    (kgtk implode --without si_units language_suffix: node2 rebuilt in
    place from the kgtk: subfield columns, prefixed columns kept)."""
    from kgtk_ray.ops.validate import implode_node2
    out = implode_node2(read_kgtk_tsv(f"{REF}/implode-file1.tsv"),
                        drop_fields=False).to_pandas()
    assert _rowset(out) == _rowset(_golden("implode_golden1.tsv"))


def test_implode_reference_fixture_golden2():
    """Parity with the reference imploder on implode-file2.tsv
    (kgtk implode --mode NONE: node2 appended, the unsupported list row
    kept with empty node2)."""
    from kgtk_ray.ops.validate import implode_node2
    out = implode_node2(read_kgtk_tsv(f"{REF}/implode-file2.tsv"),
                        drop_fields=False).to_pandas()
    assert _rowset(out) == _rowset(_golden("implode_golden2.tsv"))


def test_clean_data_reference_fixture_golden():
    """Parity with kgtk clean-data on clean_data-file1.tsv (invalid
    date ^2020-05-00T00:00 dropped, valid rows kept — the reference
    default KgtkValueOptions has repair_month_or_day_zero=False, so the
    bad row rejects rather than repairing)."""
    from kgtk_ray import values as V
    from kgtk_ray.ops.validate import clean_edges
    out = clean_edges(read_kgtk_tsv(f"{REF}/clean_data-file1.tsv"),
                      options=V.ValueOptions()).to_pandas()
    assert _rowset(out) == _rowset(_golden("clean_data_golden1.tsv"))


def test_ifnotempty_reference_fixture_golden():
    """Parity with kgtk ifnotempty --columns location on
    ifnotempty-file1.tsv."""
    out = O.ifnotempty(read_kgtk_tsv(f"{REF}/ifnotempty-file1.tsv"),
                       ["location"]).to_pandas()
    assert _rowset(out) == _rowset(_golden("ifnotempty_golden1.tsv"))


def test_calc_reference_fixture_golden():
    """Parity with kgtk calc --do percentage -c node2 node1;total --into
    result on calc-file1.tsv (incl. the reference's %5.2f leading-space
    format, kgtk/cli/calc.py)."""
    out = O.calc_percentage(read_kgtk_tsv(f"{REF}/calc-file1.tsv"),
                            "node2", "node1;total").to_pandas()
    assert _rowset(out) == _rowset(_golden("calc_golden1.tsv"))


@pytest.mark.parametrize("golden,kw", [
    ("lift_golden5_7.tsv",
     dict(label_file="lift-file7.tsv", input_file="lift-file5.tsv",
          lift_columns=["node1"])),
    ("lift_golden8_9.tsv",
     dict(label_file="lift-file9.tsv", input_file="lift-file8.tsv")),
    ("lift_golden8_9_name.tsv",
     dict(label_file="lift-file9.tsv", input_file="lift-file8.tsv",
          label_value="name")),
    ("lift_golden8_9_from.tsv",
     dict(label_file="lift-file9.tsv", input_file="lift-file8.tsv",
          label_value="name", lift_from="full-name",
          lift_columns=["node1"], suffix=";full-name")),
])
def test_lift_label_file_reference_fixture_golden(golden, kw):
    """Parity with the reference lifter's --label-file variants on its
    own fixtures: --columns-to-lift, --property, --lift-from,
    --lift-suffix (docs/transform/lift.md worked examples run through
    the reference CLI)."""
    from kgtk_ray.ops.shuffle import lift
    kw = dict(kw)
    labels = read_kgtk_tsv(f"{REF}/{kw.pop('label_file')}")
    ds = read_kgtk_tsv(f"{REF}/{kw.pop('input_file')}")
    out = lift(ds, labels, **kw).to_pandas().fillna("")
    assert _rowset(out) == _rowset(_golden(golden))


def test_cc_pipeline_reference_fixture_golden():
    """Replay the reference's cc-test1.sh pipeline on cc-file1.tsv:
    connected-components --properties mw:SameAs (default HASH naming:
    CLUS + b64(md5("+".join(sorted members)))) → lift --lift-suffix=
    --columns-to-lift node1 node2 --label-select-value
    connected_component (in-place overwrite, unmapped keep original)
    → filter --invert -p ';mw:SameAs;' → compact.  Golden stage
    outputs from the reference CLI (the CC stage hand-derived per
    kgtk/gt/connected_components.py:125-127 since graph-tool is
    absent here)."""
    from kgtk_ray.ops.graph import connected_components
    from kgtk_ray.ops.shuffle import compact, lift

    src = read_kgtk_tsv(f"{REF}/cc-file1.tsv")
    clusters = connected_components(src, method="hash",
                                    properties=["mw:SameAs"])
    got = clusters.to_pandas()
    assert _rowset(got) == _rowset(_golden("cc_clusters_golden.tsv"))

    merged = lift(read_kgtk_tsv(f"{REF}/cc-file1.tsv"), clusters,
                  label_value="connected_component",
                  lift_columns=["node1", "node2"], suffix="")
    assert _rowset(merged.to_pandas().fillna("")) == _rowset(
        _golden("cc_merged_golden.tsv"))

    filtered = O.kgtk_filter(merged, pred="mw:SameAs", invert=True)
    final = compact(filtered)
    assert _rowset(final.to_pandas().fillna("")) == _rowset(
        _golden("cc_pipeline_golden.tsv"))


@pytest.mark.parametrize("emit,golden", [
    ("pass", "ppv_pass_golden.tsv"),
    ("reject", "ppv_reject_golden.tsv"),
])
def test_validate_properties_reference_fixture_golden(emit, golden):
    """Parity with the reference's own validate-properties fixture:
    kgtk validate-properties -i ppv-file2.tsv --pattern-file
    ppv-file1.tsv (defaults: --process-node1-groups True — whole-group
    rejection; distinct violations report-only).  Exercises matches,
    unknown, nextcase switches, node2_column redirect, not_in_columns,
    allow-lists, property/datatype declarations, chains, requires/
    prohibits and isa together."""
    import csv

    from kgtk_ray.ops.propvalidate import validate_properties
    pats = pd.read_csv(f"{REF}/ppv-file1.tsv", sep="\t", dtype=str,
                       keep_default_na=False, quoting=csv.QUOTE_NONE)
    pats = pats.rename(columns={"node1": "prop", "label": "kind",
                                "node2": "value"})
    ds = read_kgtk_tsv(f"{REF}/ppv-file2.tsv")
    out = validate_properties(ds, pats, emit=emit).to_pandas()
    cols = ["node1", "label", "node2"]
    got = sorted(map(tuple, out[cols].fillna("").astype(str).to_numpy()))
    want = sorted(map(tuple, _golden(golden)[cols].to_numpy()))
    assert got == want


@pytest.mark.parametrize("i,src,use_ns", [
    (1, "import-ntriples-file1.txt", False),
    (2, "import-ntriples-file2.ttl.nt", True),
    (3, "import-ntriples-file3.ttl.nt", True),
])
def test_import_ntriples_reference_fixture_golden(i, src, use_ns):
    """Parity with kgtk import-ntriples --local-namespace-use-uuid
    False on its own fixtures: literal predicates, boolean/dateTime
    datatype shortcuts (invalid booleans pass through raw), X: blank
    nodes, first-occurrence n1.. namespace allocation against the
    initial namespace table, and used-namespace prefix_expansion
    rows."""
    import csv

    import ray.data as rd

    from kgtk_ray.io.rdf import import_ntriples
    ns = {}
    if use_ns:
        nsdf = pd.read_csv(f"{REF}/initial-ntriple-namespaces.tsv",
                           sep="\t", dtype=str, keep_default_na=False,
                           quoting=csv.QUOTE_NONE)
        ns = {r.node2.strip('"'): r.node1 for r in nsdf.itertuples()}
    lines = rd.read_text(f"{REF}/{src}")
    out = import_ntriples(lines, line_col="text",
                          namespaces=ns).to_pandas()
    assert _rowset(out) == _rowset(_golden(f"ntriples_golden{i}.tsv"))


def test_reader_short_line_actions():
    """Reference KgtkReader short-line handling on its own fixture
    (kgtk/io/kgtkreader.py:282-310): the COMPLAIN default excludes rows
    with missing trailing columns (golden = kgtk clean-data output);
    --fill-short-lines pads them with empty cells instead."""
    out = read_kgtk_tsv(f"{REF}/short-line-file1.tsv").to_pandas()
    assert _rowset(out) == _rowset(_golden("shortline_golden1.tsv"))
    filled = read_kgtk_tsv(f"{REF}/short-line-file1.tsv",
                           fill_short_lines=True).to_pandas()
    assert len(filled) == 6
    assert (filled[filled["node2"] == "12345"]["location"] == "").all()


def test_cat_csv_output_reference_fixture_golden():
    """Parity with kgtk cat --output-format csv on catcsv-file1.tsv:
    KGTK strings re-quote as CSV strings, bare cells containing commas
    quote, lists pass through."""
    import os

    from kgtk_ray.io.formats import format_lines
    ds = read_kgtk_tsv(f"{REF}/catcsv-file1.tsv")
    lines = format_lines(ds, fmt="csv").to_pandas()["line"].tolist()
    want = open(os.path.join(os.path.dirname(__file__), "data",
                             "catcsv_golden1.csv")).read().rstrip(
        "\n").split("\n")
    assert sorted(lines) == sorted(want[1:])  # body; header written by sink


def test_join_prefix_and_key_widening():
    """--right-prefix renames only non-required right columns
    (kgtk/join/kgtkmergecolumns.py: id/node1/label/node2 exempt);
    --join-on-label/--join-on-node2 widen the default node1 key
    (kgtk/cli/join.py:56-61)."""
    import ray.data

    from kgtk_ray.ops.shuffle import kgtk_join
    left = ray.data.from_pandas(pd.DataFrame(
        [["a", "p", "1", "x1"], ["b", "p", "2", "x2"]],
        columns=["node1", "label", "node2", "extra"]))
    right = ray.data.from_pandas(pd.DataFrame(
        [["a", "p", "1", "y1"], ["b", "q", "9", "y2"]],
        columns=["node1", "label", "node2", "extra"]))
    out = kgtk_join(left, right, right_prefix="r_").to_pandas().fillna("")
    assert "r_extra" in out.columns and "extra" in out.columns
    # inner join on node1: both keys survive
    assert sorted(set(out.node1)) == ["a", "b"]
    # widening to (node1,label,node2) drops the b rows (labels differ)
    out2 = kgtk_join(left, right, join_on_label=True,
                     join_on_node2=True).to_pandas()
    assert sorted(set(out2.node1)) == ["a"]
