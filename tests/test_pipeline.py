"""End-to-end KG pipeline tests (FIXTURES.md F11): byte-identical
extraction, golden-edge comparison on the documents corpus, P/R >= 0.95
on the seeded entity corpus, resumable materialization."""
import os

import pandas as pd
import pytest
import ray.data

from kgtk_ray.pipelines import (
    DEFAULT_PATTERNS,
    extract_text,
    kg_pipeline,
    kg_pipeline_from_pages,
    materialize_edges,
    pages_from_documents,
    pending_partitions,
    read_manifest,
    synthetic_corpus,
)
from kgtk_ray.pipelines.corpus import BASE_TS
from kgtk_ray.pipelines.extract import extract_html_text
from kgtk_ray.pipelines.link import build_alias_map
from kgtk_ray.pipelines.manifest import read_materialized

SF = "/root/testdata/sf0.001"


def test_extraction_byte_identical():
    pages = pages_from_documents(SF)
    out = extract_text(pages).to_pandas()
    assert (out["extracted_text"] == out["text"]).all()


def test_extract_handles_entities_and_no_article():
    h = b"<html><body><p>a &amp; b</p><p>c</p></body></html>"
    assert extract_html_text(h) == "a & b\nc"
    assert extract_html_text(b"<html><body>plain text</body></html>") == "plain text"


def reference_edges(sf_dir: str) -> pd.DataFrame:
    """Single-process reference implementation of the documents pipeline
    (the golden oracle for P/R)."""
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = []
    for _, r in df.iterrows():
        d = f"D{r.doc_id}"
        url = f"https://example.org/doc/{r.doc_id}"
        rows.append((d, "published_by", r.source, url))
        rows.append((d, "written_in", r.lang, url))
        rows.append((d, "char_count", str(r.n_chars), url))
    out = pd.DataFrame(rows, columns=["node1", "label", "node2", "url"])
    out = out.drop_duplicates(["node1", "label", "node2"])
    out["id"] = out.node1 + "-" + out.label + "-" + out.node2
    return out.sort_values(["node1", "label", "node2"]).reset_index(drop=True)


def test_kg_pipeline_matches_reference():
    got = kg_pipeline(SF).to_pandas()
    want = reference_edges(SF)
    got_set = set(map(tuple, got[["node1", "label", "node2"]].to_numpy()))
    want_set = set(map(tuple, want[["node1", "label", "node2"]].to_numpy()))
    assert got_set == want_set
    # ids are content-derived, provenance merged
    g = got.set_index(["node1", "label", "node2"])
    w = want.set_index(["node1", "label", "node2"])
    assert (g["id"] == w["id"]).all()
    assert (g["url"] == w["url"]).all()
    # sorted by node1
    assert list(got["node1"]) == sorted(got["node1"])


def test_synthetic_corpus_precision_recall():
    pages, aliases, golden = synthetic_corpus(300, n_entities=100, seed=7)
    out = kg_pipeline_from_pages(pages, aliases, DEFAULT_PATTERNS,
                                 check_extraction=True).to_pandas()
    got = set(map(tuple, out[["node1", "label", "node2"]].to_numpy()))
    want = set(map(tuple, golden.to_numpy()))
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95, f"precision {precision}: extra={list(got - want)[:5]}"
    assert recall >= 0.95, f"recall {recall}: missing={list(want - got)[:5]}"


def test_materialize_resume(tmp_path):
    out_dir = str(tmp_path / "edges")
    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": [f"Q{i}" for i in range(100)],
        "label": "p",
        "node2": [f"V{i}" for i in range(100)],
    }))
    recs = materialize_edges(ds, out_dir, num_partitions=8)
    assert len(recs) == 8
    assert sum(r["rows"] for r in recs) == 100
    assert pending_partitions(out_dir, 8) == []
    # resume: nothing left to do
    assert materialize_edges(ds, out_dir, num_partitions=8) == []
    # simulate a partial run: drop two manifest lines -> only those redo
    manifest = read_manifest(out_dir)
    with open(os.path.join(out_dir, "manifest.jsonl"), "w") as f:
        import json
        for rec in manifest[:6]:
            f.write(json.dumps(rec) + "\n")
    redo = materialize_edges(ds, out_dir, num_partitions=8)
    assert {r["part"] for r in redo} == {m["part"] for m in manifest[6:]}
    # full read-back
    back = read_materialized(out_dir).to_pandas()
    assert len(back) == 100


def test_materialize_kill_and_resume(tmp_path):
    """End-to-end crash resume: a child process dies (os._exit) after
    5 manifest records hit disk; the resume skips those partitions,
    redoes the rest, and the final row set matches a clean run."""
    import subprocess
    import sys

    out_dir = str(tmp_path / "edges")
    child = f"""
import json, os, sys
import pandas as pd
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import ray.data
import kgtk_ray.pipelines.manifest as M

count = 0
class ShimJson:  # replace only manifest.py's json binding, not Ray's
    loads = staticmethod(json.loads)
    @staticmethod
    def dumps(obj, *a, **k):
        global count
        count += 1
        if count > 5:
            os._exit(1)  # hard crash AFTER 5 flushed manifest lines
        return json.dumps(obj, *a, **k)
M.json = ShimJson

ds = ray.data.from_pandas(pd.DataFrame({{
    "node1": [f"Q{{i}}" for i in range(200)],
    "label": "p",
    "node2": [f"V{{i}}" for i in range(200)],
}}))
M.materialize_edges(ds, {out_dir!r}, num_partitions=16)
os._exit(0)  # not reached
"""
    proc = subprocess.run([sys.executable, "-c", child],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1, proc.stderr[-2000:]
    done = read_manifest(out_dir)
    assert len(done) == 5
    assert len(pending_partitions(out_dir, 16)) == 11

    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": [f"Q{i}" for i in range(200)],
        "label": "p",
        "node2": [f"V{i}" for i in range(200)],
    }))
    redo = materialize_edges(ds, out_dir, num_partitions=16)
    assert {r["part"] for r in redo} == set(pending_partitions(out_dir, 0)
                                            or range(16)) - \
        {r["part"] for r in done}
    assert pending_partitions(out_dir, 16) == []
    back = read_materialized(out_dir).to_pandas()
    assert sorted(back.node1) == sorted(f"Q{i}" for i in range(200))
    # lineage: fingerprints of resumed partitions match a clean rerun
    clean_dir = str(tmp_path / "clean")
    clean = materialize_edges(ds, clean_dir, num_partitions=16)
    assert {(r["part"], r["rows"], r["fingerprint"]) for r in clean} == \
        {(r["part"], r["rows"], r["fingerprint"])
         for r in read_manifest(out_dir)}


def test_run_pipeline_spec():
    from kgtk_ray.pipelines.spec import run_pipeline, register, OPS

    ds = ray.data.from_pandas(pd.DataFrame({
        "node1": ["a", "a", "b", "b"],
        "label": ["p", "p", "p", "q"],
        "node2": ["1", "1", "2", "3"],
        "q": ["x", "y", "", ""],
    }))
    out = run_pipeline(ds, [
        {"op": "filter", "pred": {"p"}},
        {"op": "compact", "key_columns": ["node1", "label", "node2"]},
        {"op": "add_id", "style": "node1-label-node2"},
        {"op": "sort", "columns": ["node1"]},
    ]).to_pandas()
    assert list(out.node1) == ["a", "b"]
    assert out[out.node1 == "a"].iloc[0]["q"] == "x|y"
    assert out.iloc[0]["id"] == "a-p-1"

    @register("double")
    def double(d, **kw):
        return d.union(d)
    assert run_pipeline(ds, [{"op": "double"}]).count() == 8

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown op"):
        run_pipeline(ds, [{"op": "nope"}])


def test_run_pipeline_curation_ops_registered():
    """The round-3 curation ops compose through the `/` pipe DSL."""
    from kgtk_ray.pipelines.spec import OPS, run_pipeline
    for name in ("dedup_spans", "grouped_profile", "shard_assign"):
        assert name in OPS, name
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b x y", "a b c d"],
    }))
    out = run_pipeline(docs, [
        {"op": "dedup_spans", "k": 2},
        {"op": "shard_assign", "id_col": "doc_id", "n_shards": 2},
    ]).to_pandas().sort_values("doc_id")
    # doc 3 is an exact dup of doc 1 -> gone; doc 2 keeps only "x y"
    assert out.doc_id.tolist() == [1, 2]
    assert out.text.tolist() == ["a b c d", "x y"]
    assert set(out.columns) >= {"doc_id", "text", "shard", "pos"}


def test_run_pipeline_round4_curation_ops():
    """Round-4 webtext ops compose through the `/` pipe DSL; two-corpus
    steps take the second dataset as a kwarg."""
    from kgtk_ray.pipelines.spec import OPS, run_pipeline
    for name in ("canonicalize_urls", "dedup_urls", "filter_domains",
                 "c4_line_filter", "dsir_scores", "dsir_sample",
                 "quality_classifier_scores", "classifier_filter"):
        assert name in OPS, name
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "url": ["https://A.com/x/", "https://a.com:443/x",
                "https://blocked.org/y"],
        "text": ["spark table scan", "spark table scan", "dog cat"],
    }))
    tgt = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [9], "text": ["spark table"]}))
    out = run_pipeline(docs, [
        {"op": "filter_domains", "blocklist": {"blocked.org"}},
        {"op": "dedup_urls"},
        {"op": "dsir_scores", "target": tgt, "num_buckets": 64},
    ]).to_pandas()
    assert out.doc_id.tolist() == [1]
    assert out.dsir_score.iloc[0] != 0.0


def test_link_entities_embedding_fallback():
    """north_rule linker: alias-dict hit first, embedding-index catch
    for fuzzy mentions, surface-form passthrough for misses."""
    from kgtk_ray.pipelines import build_entity_index, link_entities

    entities = pd.DataFrame({
        "qid": ["Q1", "Q2"],
        "name": ["acme corporation", "globex industries"],
    })
    index = build_entity_index(entities)
    edges = ray.data.from_pandas(pd.DataFrame({
        "node1": ["D1", "D2", "D3", "D4"],
        "label": ["mentions"] * 4,
        "node2": ["ACME Corp", "the acme corporation",
                  "globex industries annual report", "zzz unrelated qqq"],
    }))
    out = link_entities(
        edges, {"ACME Corp": "Q1"}, columns=("node2",),
        entity_index=index, threshold=0.5).to_pandas() \
        .sort_values("node1").reset_index(drop=True)
    assert out.node2[0] == "Q1"                  # exact alias hit
    assert out.node2[1] == "Q1"                  # embedding: shared tokens
    assert out.node2[2] == "Q2"                  # embedding: superset mention
    assert out.node2[3] == "zzz unrelated qqq"   # passthrough below threshold
    # deterministic across re-runs and block orders
    out2 = link_entities(
        edges.repartition(4), {"ACME Corp": "Q1"}, columns=("node2",),
        entity_index=index, threshold=0.5).to_pandas() \
        .sort_values("node1").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_dsl_cc_pipeline_chain(ray_session):
    """Replay the reference's cc-test1.sh pipe chain
    (connected-components / lift --label-file - / filter / compact)
    through the DSL, matching the golden output."""
    import os

    import pandas as pd

    from kgtk_ray.io import read_kgtk_tsv
    from kgtk_ray.pipelines.spec import run_pipeline
    src = "/root/reference/kgtk/join/test/cc-file1.tsv"
    clusters = run_pipeline(read_kgtk_tsv(src), [
        {"op": "connected_components", "method": "hash",
         "properties": ["mw:SameAs"]}])
    out = run_pipeline(read_kgtk_tsv(src), [
        {"op": "lift", "labels": clusters,
         "label_value": "connected_component",
         "lift_columns": ["node1", "node2"], "suffix": ""},
        {"op": "filter", "pred": "mw:SameAs", "invert": True},
        {"op": "compact"},
    ]).to_pandas().fillna("")
    import csv
    gold = pd.read_csv(os.path.join(os.path.dirname(__file__), "data",
                                    "cc_pipeline_golden.tsv"),
                       sep="\t", dtype=str, keep_default_na=False,
                       quoting=csv.QUOTE_NONE)
    cols = sorted(gold.columns)
    assert sorted(map(tuple, out[cols].astype(str).to_numpy())) == \
        sorted(map(tuple, gold[cols].to_numpy()))


def test_extract_arrow_kernel_matches_row_spec():
    """The vectorized Arrow extraction kernel must agree byte-for-byte
    with the row-level spec extract_html_text on adversarial HTML
    (unmatched tags, nesting, entities, empty paragraphs, no-p pages,
    case-mixed closers, non-UTF8 bytes)."""
    import pyarrow as pa
    from kgtk_ray.pipelines.extract import _extract_column, extract_html_text

    cases = [
        b"<html><head><script>x</script></head><body><p>a</p></body></html>",
        b"<body><article><p>a</p><p> </p><p>b</p></article></body>",
        b"<body>no paragraphs at all</body>",
        b"<body><p>open but never closed",
        b"<body><p>a</p>junk<p>trailing-open",
        b"<body><p>first<p>nested</p><p>b</p></body>",
        b"<body><P>upper</P><p>c</p></body>",
        b"<body><p>a &amp; b &lt;c&gt;</p><p>&nbsp;x</p></body>",
        b"<nav>menu</nav><p>kept</p><footer>foot</footer>",
        b"<style>s</style><p>one</p><aside>x</aside><p>two</p>",
        b"<article><p>in article</p></article><p>outside</p>",
        b"<p>tab\tand  spaces</p><p>line\nbreak kept</p>",
        b"",
        b"<p></p><p></p>",
        b"<p>\xff\xfe broken utf8</p>",
        b"<body><p>a</p>between text dropped<p>b</p></body>",
        b"<script><style></script></style><p>x</p>",
    ]
    got = _extract_column(pa.array(cases, pa.large_binary())).to_pylist()
    want = [extract_html_text(c) for c in cases]
    assert got == want, [
        (c, g, w) for c, g, w in zip(cases, got, want) if g != w]
