"""Unit tests for global span dedup (C4-style) and grouped profiling."""
import math

import numpy as np
import pandas as pd
import ray.data as rd

from kgtk_ray.ops import grouped_profile
from kgtk_ray.text import dedup_spans


def _ds(rows, parallelism=2):
    return rd.from_pandas(pd.DataFrame(rows)).repartition(parallelism)


def _run(ds, **kw):
    return (dedup_spans(ds, **kw).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_dedup_spans_keeps_first_occurrence():
    # span unit = 2 words; "a b" appears in docs 1 and 2 -> doc 2 loses it
    ds = _ds([
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": "a b x y"},
    ])
    out = _run(ds, k=2)
    assert out.text.tolist() == ["a b c d", "x y"]


def test_dedup_spans_within_doc_and_trailing_partial():
    # doc 1: spans "p q", "p q", "r" -> second "p q" removed, partial kept
    ds = _ds([{"doc_id": 1, "text": "p q p q r"},
              {"doc_id": 2, "text": "r"}])
    out = _run(ds, k=2)
    # "r" in doc 1 (span_idx 2) precedes doc 2's "r" (doc order wins)
    assert out.doc_id.tolist() == [1]
    assert out.text.tolist() == ["p q r"]


def test_dedup_spans_drops_fully_duplicated_docs():
    ds = _ds([
        {"doc_id": 10, "text": "u v w"},
        {"doc_id": 11, "text": "u v w"},   # exact dup -> vanishes
        {"doc_id": 12, "text": ""},        # tokenless -> vanishes
    ])
    out = _run(ds, k=3)
    assert out.doc_id.tolist() == [10]
    assert out.text.tolist() == ["u v w"]


def test_dedup_spans_deterministic_across_block_orders():
    rng = np.random.default_rng(7)
    vocab = list("abcdefgh")
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=rng.integers(3, 20)))}
            for i in range(80)]
    a = _run(_ds(rows, parallelism=1), k=3)
    b = _run(_ds(list(reversed(rows)), parallelism=7), k=3)
    pd.testing.assert_frame_equal(a, b)


import pytest


@pytest.mark.parametrize("seed,k", [(11, 2), (23, 1), (5, 5), (99, 3)])
def test_dedup_spans_matches_naive_reference(seed, k):
    rng = np.random.default_rng(seed)
    vocab = list("xyzw")
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=rng.integers(1, 12)))}
            for i in range(60)]
    seen, expect = set(), {}
    for r in rows:  # rows are doc_id-ordered, matching the op's winner rule
        words = r["text"].split()
        kept = []
        for s in range(0, len(words), k):
            span = " ".join(words[s:s + k])
            if span not in seen:
                seen.add(span)
                kept.append(span)
        if kept:
            expect[r["doc_id"]] = " ".join(kept)
    out = _run(_ds(rows, parallelism=5), k=k)
    assert dict(zip(out.doc_id, out.text)) == expect


def test_dedup_spans_empty_input():
    ds = _ds([{"doc_id": 1, "text": "a"}]).filter(lambda r: False)
    assert dedup_spans(ds).to_pandas().empty


def test_grouped_profile_exact_stats():
    rng = np.random.default_rng(3)
    rows = [{"g": f"s{i % 3}", "v": int(rng.integers(0, 50))}
            for i in range(400)]
    out = (grouped_profile(_ds(rows, parallelism=6), group_col="g",
                           value_col="v", quantiles=(0.5, 0.9, 0.25))
           .to_pandas().sort_values("g").reset_index(drop=True))
    df = pd.DataFrame(rows)
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df.g == row.g, "v"].to_numpy())
        n = len(vals)
        assert row.n == n
        assert row.total == vals.sum()
        assert math.isclose(row["mean"], vals.sum() / n)
        assert row.vmin == vals[0] and row.vmax == vals[-1]
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.25, "p25")]:
            assert row[name] == vals[max(1, math.ceil(q * n)) - 1], (q, row.g)


def test_grouped_profile_float_values_exact_total():
    # quantized floats (the module docstring's recommended usage) must
    # not have their total/mean truncated to int
    rows = [{"g": "a", "v": 0.25}, {"g": "a", "v": 0.5},
            {"g": "a", "v": 0.5}, {"g": "b", "v": 1.75}]
    out = (grouped_profile(_ds(rows, parallelism=2), group_col="g",
                           value_col="v", quantiles=(0.5,))
           .to_pandas().sort_values("g").reset_index(drop=True))
    a, b = out.iloc[0], out.iloc[1]
    assert a.total == 1.25 and math.isclose(a["mean"], 1.25 / 3)
    assert b.total == 1.75 and b["mean"] == 1.75


def test_grouped_profile_single_value_groups():
    out = (grouped_profile(_ds([{"g": "a", "v": 7}], parallelism=1),
                           group_col="g", value_col="v").to_pandas())
    r = out.iloc[0]
    assert (r.n, r.total, r.vmin, r.vmax, r.p50, r.p90) == (1, 7, 7, 7, 7, 7)
    assert r["mean"] == 7.0


def test_shard_assign_matches_hash_arithmetic():
    from kgtk_ray.ops import shard_assign
    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(200)]
    out = (shard_assign(_ds(rows, parallelism=5), id_col="doc_id",
                        n_shards=8).to_pandas()
           .sort_values(["shard", "pos"]).reset_index(drop=True))
    h = (np.arange(200, dtype=np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296)
    df = pd.DataFrame({"doc_id": np.arange(200), "h": h,
                       "shard": (h % 8).astype("int64")})
    df = df.sort_values(["shard", "h", "doc_id"]).reset_index(drop=True)
    df["pos"] = df.groupby("shard").cumcount()
    assert out.doc_id.tolist() == df.doc_id.tolist()
    assert out.shard.tolist() == df.shard.tolist()
    assert out.pos.tolist() == df.pos.tolist()
    # pure-map path (no pos): same shard labels, zero shuffles
    nopos = (shard_assign(_ds(rows, parallelism=3), id_col="doc_id",
                          n_shards=8, pos_col=None).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert "pos" not in nopos.columns
    assert (nopos.shard.to_numpy()
            == df.sort_values("doc_id").shard.to_numpy()).all()


def test_shard_assign_deterministic_across_block_orders():
    from kgtk_ray.ops import shard_assign
    rows = [{"doc_id": i} for i in range(120)]
    a = (shard_assign(_ds(rows, parallelism=1), id_col="doc_id",
                      n_shards=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (shard_assign(_ds(list(reversed(rows)), parallelism=9),
                      id_col="doc_id", n_shards=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_dedup_spans_sentence_unit():
    # C4's literal unit: k consecutive sentences; repeated sentence
    # spans removed corpus-wide, whitespace normalized on reassembly
    ds = _ds([
        {"doc_id": 1, "text": "A is here. B follows! C ends? D tail."},
        {"doc_id": 2, "text": "A is here. B follows! X new. Y new."},
        {"doc_id": 3, "text": "D tail."},
    ])
    out = (dedup_spans(ds, k=2, unit="sentence").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc1 spans: ("A is here. B follows!", "C ends? D tail.") — both kept
    # doc2 spans: ("A is here. B follows!", "X new. Y new.") — first removed
    # doc3 span:  ("D tail.",) — distinct from doc1's 2-sentence span, kept
    assert out.doc_id.tolist() == [1, 2, 3]
    assert out.text.tolist() == [
        "A is here. B follows! C ends? D tail.",
        "X new. Y new.",
        "D tail.",
    ]


def test_dedup_spans_sentence_unit_naive_reference():
    import re
    rng = np.random.default_rng(41)
    sents = [f"{w} s{i}." for i, w in enumerate(
        np.repeat(list("abcdef"), 3))]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(sents, size=rng.integers(1, 7)))}
            for i in range(40)]
    k = 2
    seen, expect = set(), {}
    for r in rows:
        pieces = [p for p in re.split(r"(?<=[.!?])\s+", r["text"].strip())
                  if p]
        kept = []
        for st in range(0, len(pieces), k):
            span = " ".join(pieces[st:st + k])
            if span not in seen:
                seen.add(span)
                kept.append(span)
        if kept:
            expect[r["doc_id"]] = " ".join(kept)
    out = (dedup_spans(_ds(rows, parallelism=6), k=k, unit="sentence")
           .to_pandas())
    assert dict(zip(out.doc_id, out.text)) == expect


def test_dedup_spans_bad_unit():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dedup_spans(_ds([{"doc_id": 1, "text": "a"}]), unit="paragraph")
