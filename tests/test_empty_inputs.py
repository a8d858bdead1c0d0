"""Degenerate-input sweep: every core operator must handle an EMPTY
(but schema-bearing) edge table without raising — empty partitions and
drained frontiers are routine at scale, and Ray 2.49's own join/sort
paths have empty-input crash modes the bucketed primitives exist to
avoid."""
import pandas as pd
import pytest
import ray.data

import kgtk_ray.ops as O


def empty_edges():
    return ray.data.from_pandas(pd.DataFrame({
        "node1": pd.Series([], dtype=str),
        "label": pd.Series([], dtype=str),
        "node2": pd.Series([], dtype=str)}))


def small_edges():
    return ray.data.from_pandas(pd.DataFrame(
        [("a", "p", "b"), ("b", "p", "c")],
        columns=["node1", "label", "node2"]))


def n_rows(ds):
    return len(ds.to_pandas())


def test_empty_through_row_ops():
    e = empty_edges()
    assert n_rows(O.kgtk_filter(e, subj=["a"])) == 0
    assert n_rows(O.ifempty(e, columns=["node2"])) == 0
    assert n_rows(O.add_id(e)) == 0
    assert n_rows(O.expand_lists(e)) == 0
    lowered, label_edges = O.lower_labels(e)
    assert n_rows(lowered) == 0 and n_rows(label_edges) == 0


def test_empty_through_shuffle_ops():
    e = empty_edges()
    assert n_rows(O.compact(e)) == 0
    assert n_rows(O.unique_counts(e, "node2")) == 0
    assert n_rows(O.dedup_exact_edges(e)) == 0


def test_empty_filter_side_semi_anti():
    e, f = small_edges(), empty_edges()
    kw = dict(input_keys=["node1"], filter_keys=["node1"])
    assert n_rows(O.ifexists(e, f, **kw)) == 0
    assert n_rows(O.ifnotexists(e, f, **kw)) == 2


def test_empty_input_side_semi_anti():
    e, f = empty_edges(), small_edges()
    kw = dict(input_keys=["node1"], filter_keys=["node1"])
    assert n_rows(O.ifexists(e, f, **kw)) == 0
    assert n_rows(O.ifnotexists(e, f, **kw)) == 0


def test_empty_graph_ops():
    e = empty_edges()
    from kgtk_ray.ops.graph import connected_components, pagerank, paths

    assert n_rows(pagerank(e, iters=1)) == 0
    assert n_rows(connected_components(e)) == 0
    assert n_rows(paths(e, ["a"], ["b"], max_hops=2)) == 0
    assert n_rows(paths(e, ["a"], ["b"], max_hops=2, distributed=True)) == 0


def test_empty_windows():
    from kgtk_ray.ops.window import tumbling_window

    ev = ray.data.from_pandas(pd.DataFrame({
        "ts": pd.Series([], dtype="datetime64[ns]"),
        "user_id": pd.Series([], dtype=str),
        "value": pd.Series([], dtype=float)}))
    assert n_rows(tumbling_window(ev)) == 0


def test_empty_through_text_quality_ops():
    from kgtk_ray.text import (corpus_dup_ngram_frac, gopher_filter,
                               repetition_signals, scrub_pii)
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=str)}))
    assert n_rows(repetition_signals(docs)) == 0
    assert n_rows(gopher_filter(docs)) == 0
    assert n_rows(corpus_dup_ngram_frac(docs)) == 0
    assert n_rows(scrub_pii(docs)) == 0


def test_empty_through_pack_and_against():
    from kgtk_ray.dedup import dedup_against, semdedup
    from kgtk_ray.text import pack_sequences
    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "embedding": pd.Series([], dtype=object)}))
    assert n_rows(semdedup(emb)) == 0
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=str)}))
    small = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": ["some text here"]}))
    assert n_rows(pack_sequences(docs)) == 0
    # empty corpus against a non-empty reference, and vice versa
    assert n_rows(dedup_against(docs, small)) == 0
    out = dedup_against(small, docs).to_pandas()
    assert len(out) == 1 and not out["dup"].any()


def test_empty_through_new_r4_ops():
    from kgtk_ray.io.importers import import_atomic, import_concept_pairs
    from kgtk_ray.ops import (graph_statistics_edges, paths_statistics,
                              validate_edges)
    e = ray.data.from_pandas(pd.DataFrame({
        "node1": pd.Series([], dtype=str),
        "node2": pd.Series([], dtype=str),
        "label": pd.Series([], dtype=str),
        "id": pd.Series([], dtype=str)}))
    assert n_rows(paths_statistics(e, ["a"], ["b"], max_hops=2)) == 0
    assert n_rows(graph_statistics_edges(e)) == 0
    atomic = ray.data.from_pandas(pd.DataFrame({
        "event": pd.Series([], dtype=str),
        "xAttr": pd.Series([], dtype=object)}))
    assert n_rows(import_atomic(atomic)) == 0
    pairs = ray.data.from_pandas(pd.DataFrame({
        "node1": pd.Series([], dtype=str),
        "node2": pd.Series([], dtype=str)}))
    assert n_rows(import_concept_pairs(pairs)) == 0
    # error-budget actions on an empty dataset: zero counters, no raise
    out, counters = validate_edges(e, ["node2"], invalid_action="report")
    assert n_rows(out) == 0 and counters["total"] == 0


def test_round4_new_ops_empty_inputs(ray_session):
    import pandas as pd
    import ray.data

    from kgtk_ray.ops.graph import connected_components
    from kgtk_ray.ops.propvalidate import validate_properties

    e = ray.data.from_pandas(pd.DataFrame({
        "node1": pd.Series([], dtype=str),
        "label": pd.Series([], dtype=str),
        "node2": pd.Series([], dtype=str)}))
    assert n_rows(connected_components(e, strong=True)) == 0
    assert n_rows(connected_components(e, properties=["p"])) == 0
    pats = pd.DataFrame({"prop": ["p"], "kind": ["minoccurs"],
                         "value": ["1"]})
    assert n_rows(validate_properties(e, pats)) == 0  # grouped default

    from kgtk_ray.io.rdf import import_ntriples
    lines = ray.data.from_pandas(pd.DataFrame(
        {"line": pd.Series([], dtype=str)}))
    assert n_rows(import_ntriples(lines)) == 0

    from kgtk_ray.ops.shuffle import lift
    labels = ray.data.from_pandas(pd.DataFrame({
        "node1": pd.Series([], dtype=str),
        "label": pd.Series([], dtype=str),
        "node2": pd.Series([], dtype=str)}))
    out = lift(e, labels, lift_columns=["node1"], suffix="")
    assert n_rows(out) == 0
