"""Operator-semantics tests modeled on the reference's conformance corpus
(FIXTURES.md F3-F10; /root/reference/kgtk/join/test/ fixture style —
tiny tables in, order-insensitive expected tables out)."""
import pandas as pd
import pytest
import ray.data

import kgtk_ray.ops as O


def edges(rows, columns=("node1", "label", "node2")):
    return ray.data.from_pandas(pd.DataFrame(rows, columns=list(columns)))


def rows(ds, sort_cols=None):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    df = df[cols].astype(str)
    return sorted(map(tuple, df.to_numpy().tolist()))


# F3-ish fixture (from the reference's ifexists-test1-file1 shape)
EDGE_ROWS = [
    ("john", "zipcode", "12345", "home", "10"),
    ("john", "zipcode", "12346", "", ""),
    ("peter", "zipcode", "12040", "home", ""),
    ("peter", "zipcode", "12040", "cabin", ""),
    ("peter", "zipcode", "12040", "work", "5"),
    ("steve", "zipcode", "45601", "", "3"),
    ("steve", "zipcode", "45601", "work", ""),
]
COLS = ("node1", "label", "node2", "location", "years")


def edge_ds():
    return edges(EDGE_ROWS, COLS)


def test_filter():
    out = O.kgtk_filter(edge_ds(), subj={"peter"})
    assert out.count() == 3
    out = O.kgtk_filter(edge_ds(), subj={"peter"}, obj={"12345"}, or_mode=True)
    assert out.count() == 4
    out = O.kgtk_filter(edge_ds(), pred={"zipcode"}, invert=True)
    assert out.count() == 0


def test_ifempty_ifnotempty():
    assert O.ifempty(edge_ds(), ["location"]).count() == 2
    assert O.ifnotempty(edge_ds(), ["location"]).count() == 5
    assert O.ifempty(edge_ds(), ["location", "years"], all_are=True).count() == 1
    assert O.ifnotempty(edge_ds(), ["location", "years"], all_are=False).count() == 6


def test_compact_merges_sorted_unique_lists():
    out = O.compact(edge_ds(), ["node1", "label", "node2"]).to_pandas()
    peter = out[out.node1 == "peter"].iloc[0]
    assert peter["location"] == "cabin|home|work"
    assert peter["years"] == "5"
    steve = out[out.node1 == "steve"].iloc[0]
    assert steve["location"] == "work" and steve["years"] == "3"
    assert len(out) == 4


def test_compact_expands_input_lists():
    ds = edges([("a", "p", "x", "u|v"), ("a", "p", "x", "v|w")],
               ("node1", "label", "node2", "q"))
    out = O.compact(ds, ["node1", "label", "node2"]).to_pandas()
    assert out.iloc[0]["q"] == "u|v|w"


def test_unique_counts():
    out = rows(O.unique_counts(edge_ds(), "node1"))
    assert out == sorted([("count", "john", "2"), ("count", "peter", "3"),
                          ("count", "steve", "2")])


def test_ifexists_semi_and_anti():
    filt = edges([("peter", "zipcode", "12040"), ("john", "zipcode", "12345")])
    assert O.ifexists(edge_ds(), filt).count() == 4
    assert O.ifnotexists(edge_ds(), filt).count() == 3
    # edge x node: input.node1 = filter.id
    nodefile = ray.data.from_pandas(pd.DataFrame({"id": ["john"]}))
    assert O.ifexists(edge_ds(), nodefile).count() == 2


def test_kgtk_join_is_filtered_union():
    left = edges([("a", "p", "1", "L"), ("b", "p", "2", "L")],
                 ("node1", "label", "node2", "fromfile"))
    right = edges([("b", "q", "3", "R"), ("c", "q", "4", "R")],
                  ("node1", "label", "node2", "otherfile"))
    inner = O.kgtk_join(left, right, join_on=["node1"]).to_pandas()
    # inner: keys {b} -> rows from BOTH files with node1=b, merged layout
    assert sorted(inner.node1) == ["b", "b"]
    assert set(inner.columns) == {"node1", "label", "node2", "fromfile", "otherfile"}
    l = O.kgtk_join(left, right, join_on=["node1"], left_join=True).to_pandas()
    assert sorted(l.node1) == ["a", "b", "b"]
    outer = O.kgtk_join(left, right, join_on=["node1"], left_join=True,
                        right_join=True).to_pandas()
    assert sorted(outer.node1) == ["a", "b", "b", "c"]


def test_lift():
    ds = edges([
        ("Q1", "P1", "Q2"),
        ("Q1", "label", "'Moe'@en"),
        ("Q1", "label", "'Moe Howard'@en"),
        ("Q2", "label", "'Larry'@en"),
        ("P1", "label", "'brother of'@en"),
    ])
    out = O.lift(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["node1;label"] == "'Moe Howard'@en|'Moe'@en"
    assert r["label;label"] == "'brother of'@en"
    assert r["node2;label"] == "'Larry'@en"


def test_lift_join_path_matches_broadcast():
    ds = edges([
        ("Q1", "P1", "Q2"),
        ("Q3", "P1", "Q1"),
        ("Q1", "label", "'Moe'@en"),
        ("Q1", "label", "'Moe Howard'@en"),
        ("Q2", "label", "'Larry'@en"),
        ("P1", "label", "'brother of'@en"),
    ])
    want = (O.lift(ds).to_pandas()
            .sort_values("node1").reset_index(drop=True))
    got = (O.lift(ds, broadcast_limit=0).to_pandas()
           .sort_values("node1").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_add_id_styles():
    out = O.add_id(edge_ds(), style="node1-label-node2").to_pandas()
    assert (out["id"] == out.node1 + "-" + out.label + "-" + out.node2).all()
    out2 = O.add_id(edge_ds(), style="node1-label-num").to_pandas()
    assert set(out2[out2.node1 == "peter"]["id"]) == {
        "peter-zipcode-0000", "peter-zipcode-0001", "peter-zipcode-0002"}


def test_add_id_wikidata_digest_style():
    """Content digest ids: E + 16 hex, deterministic, content-keyed
    (identical triples share one id regardless of block layout)."""
    out = O.add_id(edge_ds(), style="wikidata").to_pandas()
    assert out["id"].str.match(r"^E[0-9a-f]{16}$").all()
    again = O.add_id(edge_ds().repartition(3), style="wikidata").to_pandas()
    key = ["node1", "label", "node2"]
    merged = out.merge(again, on=key, suffixes=("_a", "_b"))
    assert (merged["id_a"] == merged["id_b"]).all()
    # distinct triples get distinct digests on this input
    assert out.groupby(key)["id"].nunique().max() == 1


def test_every_nth_string_key_vectorized_hash():
    """The string-key fallback keeps the documented byte-polynomial
    values (sum b*31^i mod 2^31) after the round-5 vectorization."""
    from kgtk_ray.ops.sample import every_nth, string_poly_hash
    import pandas as pd
    keys = [f"row{i}x" for i in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "v": range(200)}))
    out = every_nth(ds, 7, key="k").to_pandas()
    want = [k for k in keys
            if sum(b * pow(31, i, 2**31)
                   for i, b in enumerate(k.encode())) % (2**31) % 7 == 0]
    assert sorted(out["k"]) == sorted(want)
    assert list(string_poly_hash(pd.Series(["abc"]))) == [
        sum(b * pow(31, i, 2**31)
            for i, b in enumerate(b"abc")) % (2**31)]


def test_expand_lists():
    ds = edges([("a", "p", "x", "u|v|w"), ("b", "p", "y", "")],
               ("node1", "label", "node2", "q"))
    out = O.expand_lists(ds, ["q"]).to_pandas()
    assert len(out) == 4
    assert sorted(out[out.node1 == "a"]["q"]) == ["u", "v", "w"]


def test_normalize_nodes():
    nodefile = ray.data.from_pandas(pd.DataFrame({
        "id": ["Q1", "Q2"], "type": ["item", ""], "alias": ["Moe", "Larry"]}))
    out = rows(O.normalize_nodes(nodefile))
    # rows() sorts columns alphabetically: (label, node1, node2)
    assert out == sorted([("type", "Q1", "item"), ("alias", "Q1", "Moe"),
                          ("alias", "Q2", "Larry")])


def test_lower_labels_roundtrip():
    ds = edges([("Q1", "P1", "Q2")])
    lifted = O.lift(ds.union(edges([("Q1", "label", "'Moe'@en")])))
    stripped, label_edges = O.lower_labels(lifted)
    assert "node1;label" not in stripped.schema().names
    le = label_edges.to_pandas()
    assert ("Q1", "label", "'Moe'@en") in set(map(tuple, le.to_numpy()))


def test_column_ops():
    ds = edge_ds()
    assert O.remove_columns(ds, ["years"]).schema().names == [
        "node1", "label", "node2", "location"]
    assert O.rename_columns(ds, {"location": "loc"}).schema().names == [
        "node1", "label", "node2", "loc", "years"]
    assert O.reorder_columns(ds, ["years", "node1", "..."]).schema().names == [
        "years", "node1", "label", "node2", "location"]
    # reference reorder_columns.py:193-196: unmentioned columns without
    # "..." are an error unless --trim
    with pytest.raises(ValueError, match="not accounted for"):
        O.reorder_columns(ds, ["years", "node1"])


def test_cat_alias_merge():
    a = edges([("a", "p", "1")], ("from", "predicate", "to"))
    b = edges([("b", "q", "2", "x")], ("node1", "label", "node2", "extra"))
    out = O.cat(a, b).to_pandas()
    assert set(out.columns) == {"node1", "label", "node2", "extra"}
    assert sorted(out.node1) == ["a", "b"]
    assert list(out[out.node1 == "a"]["extra"]) == [""]


def test_dedup_exact():
    ds = edges([("a", "p", "1"), ("a", "p", "1"), ("b", "p", "2")])
    assert O.dedup_exact_edges(ds).count() == 2


def test_sort_edges():
    out = O.sort_edges(edge_ds(), ["node2"]).to_pandas()
    assert list(out.node2) == sorted(out.node2)


def test_validate_and_clean():
    ds = edges([("a", "p", '"ok"'), ("b", "p", '"bad'), ("c", "p", "^1990-00-00")])
    # month-zero date is invalid under the strict defaults (but
    # repairable); the unterminated string is invalid and unrepairable
    assert O.validate_edges(ds, ["node2"]).count() == 1
    cleaned = O.clean_edges(ds, ["node2"]).to_pandas()
    assert "^1990-01-01" in set(cleaned.node2)
    assert len(cleaned) == 2


def test_explode_implode_dataset():
    ds = edges([("a", "p", "10m"), ("b", "p", "'hi'@en")])
    ex = O.explode_node2(ds).to_pandas()
    assert set(ex[ex.node1 == "a"]["node2;kgtk:data_type"]) == {"quantity"}
    back = O.implode_node2(O.explode_node2(ds)).to_pandas()
    assert sorted(back.node2) == ["'hi'@en", "10m"]


def test_calc_percentage():
    ds = edges([("a", "p", "1", "25", "100")], ("node1", "label", "node2", "v", "t"))
    out = O.calc_percentage(ds, "v", "t").to_pandas()
    assert out.iloc[0]["result"] == "25.00"


def test_connected_components_naming_methods():
    ds = edges([("a", "p", "b"), ("b", "p", "c"), ("x", "p", "yy")])
    def comp_map(method):
        out = O.connected_components(ds, method=method).to_pandas()
        return dict(zip(out.node1, out.node2))
    assert comp_map("lowest") == {"a": "a", "b": "a", "c": "a",
                                  "x": "x", "yy": "x"}
    assert comp_map("highest")["a"] == "c"
    assert comp_map("cat")["x"] == "x+yy"
    assert comp_map("longest")["x"] == "yy"
    pref = comp_map("prefixed")
    assert pref["a"] == "CC0" and pref["x"] == "CC1"
    h = comp_map("hash")
    assert h["a"] == h["b"] != h["x"]


def test_validate_error_budget():
    # reference kgtk/io/kgtkreader.py:53,742-767: REPORT passes rows and
    # counts errors, COMPLAIN excludes and counts, ERROR raises on the
    # first, and error_limit aborts with "Too many data errors"
    ds = edges([("a", "p", '"ok"'), ("b", "p", '"bad'),
                ("c", "p", "^1990-00-00"), ("d", "p", '"worse')])
    out, counters = O.validate_edges(ds, ["node2"],
                                     invalid_action="report")
    assert out.count() == 4
    assert counters == {"node2": 3, "total": 3}
    out2, counters2 = O.validate_edges(ds, ["node2"],
                                       invalid_action="complain")
    assert set(out2.to_pandas().node1) == {"a"}
    assert counters2["total"] == 3
    with pytest.raises(ValueError, match="invalid rows"):
        O.validate_edges(ds, ["node2"], invalid_action="error")
    with pytest.raises(ValueError, match="Too many data errors"):
        O.validate_edges(ds, ["node2"], invalid_action="report",
                         error_limit=3)
    # clean_edges budget counts POST-repair invalids (the date repairs)
    cleaned = O.clean_edges(ds, ["node2"], error_limit=3)
    assert cleaned.count() == 2
    with pytest.raises(ValueError, match="Too many data errors"):
        O.clean_edges(ds, ["node2"], error_limit=2)


def test_clean_edges_rejects_stream():
    ds = edges([("a", "p", '"ok"'), ("b", "p", '"bad'),
                ("c", "p", "^1990-00-00")])
    clean, rejects = O.clean_edges(ds, ["node2"], with_rejects=True)
    c = clean.to_pandas()
    r = rejects.to_pandas()
    assert set(c.node1) == {"a", "c"}          # date repaired then valid
    assert set(r.node1) == {"b"}               # unrepairable string


def test_kgtk_join_distributed_path_matches_broadcast():
    left = edges([("a", "p", "1", "L"), ("b", "p", "2", "L")],
                 ("node1", "label", "node2", "fromfile"))
    right = edges([("b", "q", "3", "R"), ("c", "q", "4", "R")],
                  ("node1", "label", "node2", "otherfile"))
    for kw in ({}, {"left_join": True}, {"left_join": True, "right_join": True}):
        want = rows(O.kgtk_join(left, right, join_on=["node1"], **kw))
        got = rows(O.kgtk_join(left, right, join_on=["node1"],
                               broadcast_limit=0, **kw))
        assert got == want, kw


def test_add_id_prefixed_style():
    out = O.add_id(edge_ds(), style="prefix###", id_prefix="E",
                   initial_id=1, id_prefix_num_width=2).to_pandas()
    assert sorted(out["id"]) == [f"E{str(i).zfill(2)}" for i in range(1, 8)]
    # deterministic: same input -> same id per row content
    again = O.add_id(edge_ds(), style="prefix###", id_prefix="E",
                     initial_id=1, id_prefix_num_width=2).to_pandas()
    a = out.sort_values(list(out.columns)).reset_index(drop=True)
    b = again.sort_values(list(again.columns)).reset_index(drop=True)
    assert a.equals(b)


def test_reachable_distributed_matches_driver(ray_session):
    """The Dataset-state BFS (distributed=True) must equal the
    broadcast-frontier driver loop on the same graph."""
    import pandas as pd
    import ray.data
    from kgtk_ray.ops.graph import reachable_nodes
    edges = ray.data.from_pandas(pd.DataFrame({
        "node1": ["a", "b", "c", "x", "y", "c"],
        "label": ["l", "l", "l", "l", "m", "l"],
        "node2": ["b", "c", "d", "y", "z", "a"]}))

    def norm(ds):
        return set(map(tuple, ds.to_pandas()[["node1", "node2"]]
                       .itertuples(index=False)))

    for kw in ({}, {"undirected": True}, {"labels": ["l"]}):
        drv = norm(reachable_nodes(edges, ["a", "x"], **kw))
        dist = norm(reachable_nodes(edges, ["a", "x"], distributed=True,
                                    **kw))
        assert drv == dist, (kw, drv, dist)
    assert ("a", "d") in norm(reachable_nodes(edges, ["a"],
                                              distributed=True))


def test_sliding_window_non_divisor_slide():
    # window 90s, slide 60s: each event is in ceil(90/60)=2 candidate
    # windows, but the older one only when (ts mod 60) < 30
    from kgtk_ray.ops.window import sliding_window

    ts = pd.to_datetime(
        ["2024-01-01 00:00:10", "2024-01-01 00:00:45",
         "2024-01-01 00:01:10", "2024-01-01 00:02:59"])
    df = pd.DataFrame({"ts": ts, "user_id": ["u"] * 4,
                       "value": [1.0, 2.0, 3.0, 4.0]})
    got = sliding_window(ray.data.from_pandas(df), window_s=90,
                         slide_s=60).to_pandas()

    # brute-force oracle: every minute boundary, events in [s, s+90)
    import numpy as np
    starts = pd.date_range("2023-12-31 23:59:00", "2024-01-01 00:03:00",
                           freq="60s")
    exp = []
    for s in starts:
        m = (df.ts >= s) & (df.ts < s + pd.Timedelta(seconds=90))
        if m.any():
            v = df.loc[m, "value"]
            exp.append(("u", s, int(m.sum()), v.sum(), v.min(), v.max()))
    exp_df = pd.DataFrame(exp, columns=["user_id", "window_start", "n",
                                        "total", "vmin", "vmax"])
    got = got.sort_values("window_start").reset_index(drop=True)
    exp_df = exp_df.sort_values("window_start").reset_index(drop=True)
    got["window_start"] = pd.to_datetime(got["window_start"])
    pd.testing.assert_frame_equal(
        got[exp_df.columns].astype({"n": "int64"}), exp_df.astype({"n": "int64"}),
        check_dtype=False)


def test_ifexists_bucketed_join_path_matches_broadcast():
    import kgtk_ray.ops.shuffle as S

    ds = edges([(f"n{i}", "p", f"m{i % 5}") for i in range(20)])
    flt = edges([("n1", "p", "x"), ("n3", "p", "x"), ("n5", "p", "x"),
                 ("nope", "p", "x"), ("n1", "p", "y")])
    kw = dict(input_keys=["node1"], filter_keys=["node1"])
    want_semi = rows(S.ifexists(ds, flt, **kw))
    want_anti = rows(S.ifnotexists(ds, flt, **kw))
    old = S.BROADCAST_LIMIT
    S.BROADCAST_LIMIT = 0  # force the bucketed semi/anti join path
    try:
        assert rows(S.ifexists(ds, flt, **kw)) == want_semi
        assert rows(S.ifnotexists(ds, flt, **kw)) == want_anti
    finally:
        S.BROADCAST_LIMIT = old
    assert len(want_semi) == 3 and len(want_anti) == 17


def test_paths_distributed_matches_driver():
    from kgtk_ray.ops.graph import paths

    ed = edges([("a", "p", "b"), ("b", "p", "c"), ("b", "p", "d"),
                ("c", "p", "d"), ("d", "p", "a"), ("a", "p", "d")])
    kw = dict(max_hops=3)
    want = rows(paths(ed, ["a"], ["d"], **kw))
    got = rows(paths(ed, ["a"], ["d"], distributed=True,
                     num_partitions=4, **kw))
    assert got == want and len(want) == 3  # a->d, a->b->d, a->b->c->d


def test_expand_lists_key_columns_convention():
    """Reference-CLI convention: key columns held fixed, the rest expand
    POSITIONALLY (kgtk/cli/expand.py:34-36; row loop
    kgtk/reshape/kgtkexpand.py:121-139 — item j of each list lands on
    output row j, padding with empty, not a cross-product)."""
    import pandas as pd
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["a"], "label": ["p"], "node2": ["b"],
        "q1": ["x|y|z"], "q2": ["1|2"]}))
    out = (O.expand_lists(ds, key_columns=["node1", "label", "node2"])
           .to_pandas().sort_values(["q1", "q2"]).reset_index(drop=True))
    assert len(out) == 3
    assert set(zip(out.q1, out.q2)) == {("x", "1"), ("y", "2"), ("z", "")}
    assert (out.node1 == "a").all()
    # default (no columns/key_columns): edge keys implied
    out2 = O.expand_lists(ds).to_pandas()
    assert len(out2) == 3
    import pytest as _p
    with _p.raises(ValueError):
        O.expand_lists(ds, ["q1"], key_columns=["node1"])


def test_dedup_with_transforms_cskg():
    """Reference kgtk/cskg_utils.py:17-30: groupby join columns, merge
    transform columns into comma-joined deduplicated lists (sorted here
    for distributed determinism; the reference's set() order is
    arbitrary)."""
    df = pd.DataFrame({
        "node1": ["a", "a", "b", "a"],
        "label": ["p", "p", "p", "p"],
        "node2": ["x", "x", "y", "x"],
        "datasource": ["CN", "WN,CN", "CN", "VG"],
        "aliases": ["m1", "", "m2", "m1,m3"],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = O.dedup_with_transforms(
        ds, ["node1", "label", "node2"],
        ["datasource", "aliases"]).to_pandas().sort_values("node1")
    assert len(out) == 2
    a = out[out.node1 == "a"].iloc[0]
    assert a["datasource"] == "CN,VG,WN"
    assert a["aliases"] == ",m1,m3"  # empty cell survives as "" like the reference's split
    b = out[out.node1 == "b"].iloc[0]
    assert (b["datasource"], b["aliases"]) == ("CN", "m2")
