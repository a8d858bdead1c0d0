"""Full validate-properties action-set semantics (reference
/root/reference/kgtk/value/propertypatternvalidator.py:220-295 Action
enum; row checks :1124-1461, occurs :841-874, distinct :851-861,
chains :1463-1489, isa :1829, switch :1871)."""
import pandas as pd
import pytest
import ray.data

from kgtk_ray.ops.propvalidate import validate_properties


def run(edges, patterns, emit="pass", **kw):
    # per-row mode: these tests encode the ungrouped semantics (the
    # library default is the reference's grouped --process-node1-groups)
    kw.setdefault("reject_node1_groups", False)
    ds = ray.data.from_pandas(pd.DataFrame(edges))
    out = validate_properties(ds, pd.DataFrame(patterns,
                                               columns=["prop", "kind",
                                                        "value"]),
                              emit=emit, **kw)
    return out.to_pandas()


def edge(n1, lab, n2, id=""):
    return {"node1": n1, "label": lab, "node2": n2, "id": id}


def test_type_and_value_rules():
    edges = [edge("Q1", "age", "42"), edge("Q2", "age", '"x"'),
             edge("Q3", "color", "red"), edge("Q4", "color", "plaid")]
    pats = [("age", "node2_type", "number"),
            ("color", "node2_values", "red|green|blue")]
    out = run(edges, pats)
    assert set(out.node1) == {"Q1", "Q3"}
    rej = run(edges, pats, emit="reject")
    assert dict(zip(rej.node1, rej.reason)) == {"Q2": "node2_type",
                                                "Q4": "node2_values"}


def test_patterns_fullmatch_and_not():
    # reference uses fullmatch (:1147): 'N1x' must NOT match 'N\\d+'
    edges = [edge("N1", "p", "a"), edge("N1x", "p", "a"),
             edge("N2", "p", "forbidden")]
    pats = [("p", "node1_pattern", r"N\d+"),
            ("p", "node2_not_pattern", r"forb.*")]
    out = run(edges, pats)
    assert list(out.node1) == ["N1"]


def test_numeric_and_date_ranges():
    edges = [edge("a", "score", "5"), edge("b", "score", "15"),
             edge("c", "score", "notnum"),
             edge("d", "born", "^1990-01-01"),
             edge("e", "born", "^2101-01-01")]
    pats = [("score", "minval", "0"), ("score", "maxval", "10"),
            ("born", "mindate", "^1900-01-01"),
            ("born", "maxdate", "^2100-01-01")]
    out = run(edges, pats)
    assert set(out.node1) == {"a", "d"}


def test_occurs_and_requires():
    edges = [edge("Q1", "name", "n1"), edge("Q1", "name", "n2"),
             edge("Q2", "name", "x"),
             edge("Q2", "email", "e"),
             edge("Q3", "email", "e")]
    pats = [("name", "maxoccurs", "1"),
            ("email", "requires", "name")]
    out = run(edges, pats)
    # Q1's two name rows violate maxoccurs; Q3's email lacks name
    assert set(zip(out.node1, out.label)) == {("Q2", "name"),
                                              ("Q2", "email")}


def test_mustoccur_rejects_whole_group():
    edges = [edge("Q1", "name", "x"), edge("Q1", "age", "4"),
             edge("Q2", "age", "5")]
    pats = [("name", "mustoccur", "True")]
    out = run(edges, pats)
    assert set(out.node1) == {"Q1"}


def test_prohibits():
    edges = [edge("Q1", "deceased", "x"), edge("Q1", "email", "e"),
             edge("Q2", "email", "e")]
    pats = [("email", "prohibits", "deceased")]
    out = run(edges, pats)
    assert set(zip(out.node1, out.label)) == {("Q1", "deceased"),
                                              ("Q2", "email")}


def test_distinct_bounds():
    # the reference only REPORTS distinct violations
    # (report_distinct_violations, propertypatternvalidator.py:2149);
    # distinct_rejects=True opts into rejecting them
    edges = [edge(f"Q{i}", "tag", f"t{i % 2}") for i in range(6)]
    pats = [("tag", "maxdistinct", "1")]
    assert len(run(edges, pats)) == 6  # reference default: report-only
    out = run(edges, pats, distinct_rejects=True)
    assert len(out) == 0  # 2 distinct values > 1 -> all tag rows rejected
    pats = [("tag", "mindistinct", "2")]
    out = run(edges, pats, distinct_rejects=True)
    assert len(out) == 6


def test_chain():
    # citizen_of's node2 must be a node1 that matched datatype 'country'
    edges = [edge("P1", "citizen_of", "Q1"),
             edge("P2", "citizen_of", "Q9"),
             edge("Q1", "country_name", '"x"')]
    pats = [("citizen_of", "node2_chain", "country"),
            ("country_name", "isa", "country"),
            ("country", "node2_type", "string")]
    out = run(edges, pats)
    assert ("P2", "citizen_of") not in set(zip(out.node1, out.label))
    assert ("P1", "citizen_of") in set(zip(out.node1, out.label))


def test_isa_inheritance():
    # prop inherits parent's rules transitively and must satisfy ALL.
    # note: "180cm" would ALSO fail — cm is not in the reference's SI
    # grammar, and autovalidate (reference default True,
    # propertypatternvalidator.py:940) rejects invalid KGTK node2
    # values before any rule applies
    edges = [edge("a", "height", "180m"), edge("b", "height", '"tall"'),
             edge("c", "height", "180cm")]
    pats = [("height", "isa", "measurement"),
            ("measurement", "node2_type", "quantity|number")]
    out = run(edges, pats)
    assert list(out.node1) == ["a"]
    rej = run(edges, pats, emit="reject")
    assert dict(zip(rej.node1, rej.reason)) == {"b": "node2_type",
                                                "c": "autovalidate"}


def test_switch_first_match():
    edges = [edge("a", "val", "42"), edge("b", "val", '"s"'),
             edge("c", "val", "@45.0/9.0")]
    pats = [("val", "switch", "numcase|strcase"),
            ("numcase", "node2_type", "number"),
            ("strcase", "node2_type", "string")]
    out = run(edges, pats, emit="reject")
    assert dict(zip(out.node1, out.reason)) == {"c": "switch"}


def test_switch_case_minoccurs_group_recheck():
    """Group rules attached to a switch CASE datatype apply to the rows
    that matched that case (reference validate_switch keeps the matched
    case's occurs-scoreboard increments and rolls back failed cases,
    propertypatternvalidator.py:1871-1941 + :1656-1672): Q2 has only
    one numcase row against minoccurs=2, so that row — and only that
    row — is rejected; its strcase sibling survives."""
    edges = [edge("Q1", "val", "1"), edge("Q1", "val", "2"),
             edge("Q2", "val", "3"), edge("Q2", "val", '"s"')]
    pats = [("val", "switch", "numcase|strcase"),
            ("numcase", "node2_type", "number"),
            ("numcase", "minoccurs", "2"),
            ("strcase", "node2_type", "string")]
    out = run(edges, pats)
    assert sorted(zip(out.node1, out.node2)) == [
        ("Q1", "1"), ("Q1", "2"), ("Q2", '"s"')]
    rej = run(edges, pats, emit="reject")
    assert list(zip(rej.node1, rej.node2)) == [("Q2", "3")]
    assert list(rej.reason) == ["occurs"]


def test_isa_closure_minoccurs_counts_child_rows():
    """Occurrence counts accumulate per matched datatype, so rows of a
    child prop count toward the isa parent's minoccurs (the reference
    increments the occurs scoreboard for every datatype a row validates
    under, :1656-1672)."""
    edges = [edge("Q1", "child", "1"), edge("Q1", "child", "2"),
             edge("Q2", "child", "3")]
    pats = [("child", "isa", "parent"),
            ("parent", "minoccurs", "2")]
    out = run(edges, pats)
    assert set(out.node1) == {"Q1"}
    rej = run(edges, pats, emit="reject")
    assert set(rej.node1) == {"Q2"} and list(rej.reason) == ["occurs"]


def test_blank_and_id_rules():
    edges = [edge("a", "p", "x", id="E1"), edge("b", "p", "y", id=""),
             edge("c", "p", "", id="E3")]
    pats = [("p", "id_not_blank", "True"), ("p", "node2_not_blank", "True")]
    out = run(edges, pats)
    assert list(out.node1) == ["a"]


def test_reject_kind():
    edges = [edge("a", "deprecated_prop", "x"), edge("b", "ok", "y")]
    pats = [("deprecated_prop", "reject", "True")]
    out = run(edges, pats)
    assert list(out.node1) == ["b"]


def test_zero_count_minoccurs_rejects_whole_group():
    # Q2 has a size prop whose only row FAILS validation (node2 not a
    # number), so its valid count is zero — the reference reports a
    # minoccurs violation for the group even though no valid size row
    # exists to mark (propertypatternvalidator.py:2104)
    edges = [edge("Q1", "size", "5"), edge("Q1", "name", "a"),
             edge("Q2", "size", "x"), edge("Q2", "name", "b")]
    pats = [("size", "node2_type", "number"),
            ("size", "minoccurs", "1")]
    out = run(edges, pats)
    assert set(out.node1) == {"Q1"}
    rej = run(edges, pats, emit="reject")
    assert set(rej.node1) == {"Q2"}


def test_group_rules_preserve_extra_columns():
    edges = [dict(edge("Q1", "name", "x"), source="wiki", **{"node1;label": "Q"}),
             dict(edge("Q1", "name", "y"), source="web", **{"node1;label": "Q"}),
             dict(edge("Q2", "name", "z"), source="wiki", **{"node1;label": "R"})]
    pats = [("name", "maxoccurs", "1")]
    out = run(edges, pats)
    assert "source" in out.columns and "node1;label" in out.columns
    assert set(out.source) == {"wiki"} and set(out["node1;label"]) == {"R"}


def test_chain_join_path_matches_broadcast():
    # forcing BROADCAST_LIMIT=0 exercises both the bucketed semi/anti
    # inside ifnotexists and the chain phase's join-based mark
    import kgtk_ray.ops.shuffle as S

    edges_in = []
    for i in range(30):
        edges_in.append(edge(f"N{i}", "typ", "good" if i % 3 else "bad"))
        edges_in.append(edge(f"S{i}", "located_in", f"N{i}"))
    pats = [("typ", "node2_values", "good"), ("typ", "isa", "place"),
            ("located_in", "node2_chain", "place")]
    want = run(edges_in, pats)
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].astype(str)
                                .to_numpy().tolist()))
    old = S.BROADCAST_LIMIT
    S.BROADCAST_LIMIT = 0
    try:
        got = run(edges_in, pats)
    finally:
        S.BROADCAST_LIMIT = old
    assert key(got) == key(want) and len(want) == 40
