"""Property-based test for compact — the canonicalization workhorse —
against a naive single-process reference over randomized edge tables
(lists, empties, duplicate keys, arbitrary block splits).  The oracles
pin it on real corpora; this pins block-order/batch-boundary
independence on adversarial shapes."""
import pandas as pd
import pytest
import hypothesis.strategies as st
from hypothesis import given, settings

import kgtk_ray.ops as O
import ray.data as rd
from kgtk_ray.format import merge_list_cells

# token alphabet exercises all three split tiers of the vectorized
# merge (no-pipe passthrough, plain C split, regex split under
# backslashes): escaped pipes, backslashes without pipes, mixed
# escaped/unescaped, and empty |-components
TOK = st.sampled_from(["a", "b", "c", "x|y", "", "q1", "v2",
                       r"x\|y", r"a\|b|c", r"p\q", r"p\q|r", "|",
                       "a||b", r"tr\\", r"tr\\|u"])
ROW = st.tuples(st.sampled_from(["n1", "n2", "n3"]),
                st.sampled_from(["p", "q"]),
                st.sampled_from(["m1", "m2"]),
                TOK)


def naive_compact(rows):
    """Single-process reference: group on (node1,label,node2), merge
    the qualifier column into a sorted-unique | list."""
    df = pd.DataFrame(rows, columns=["node1", "label", "node2", "extra"])
    out = (df.groupby(["node1", "label", "node2"], as_index=False)
           .agg(extra=("extra",
                       lambda s: merge_list_cells(s.dropna().astype(str)))))
    return sorted(map(tuple, out.to_numpy().tolist()))


@settings(max_examples=25, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=40),
       st.integers(min_value=1, max_value=5))
def test_compact_matches_naive_any_block_split(rows, parallelism):
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["node1", "label", "node2", "extra"])) \
        .repartition(parallelism)
    got = O.compact(ds, ["node1", "label", "node2"]).to_pandas()
    got_rows = sorted(map(tuple, got[["node1", "label", "node2",
                                      "extra"]].to_numpy().tolist()))
    assert got_rows == naive_compact(rows)


def test_compact_phase1_bounds_hot_key_fanin():
    # skew guard: after the phase-1 combiner, a zipfian hot key (30% of
    # all rows) occurs at most once PER BATCH, so the phase-2 bucket
    # holding it receives rows bounded by the upstream block count —
    # never the hot key's row count
    import numpy as np
    rng = np.random.default_rng(5)
    n, blocks = 4000, 16
    hot = rng.random(n) < 0.3
    df = pd.DataFrame({
        "node1": np.where(hot, "HOT", [f"k{i}" for i in range(n)]),
        "label": "p",
        "node2": [f"v{i}" for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(blocks)
    partial = O.compact(ds, ["node1", "label"], _partial_only=True) \
        .to_pandas()
    hot_rows = int((partial.node1 == "HOT").sum())
    assert hot_rows <= blocks, hot_rows          # <=1 per batch
    assert hot_rows < int(hot.sum()) / 10        # vs ~1200 raw rows
    # and the full compact still merges to exactly one HOT row with
    # every value present
    full = O.compact(ds, ["node1", "label"]).to_pandas()
    hot_out = full[full.node1 == "HOT"]
    assert len(hot_out) == 1
    assert hot_out.iloc[0].node2.count("|") == int(hot.sum()) - 1


@settings(max_examples=25, deadline=None)
@given(st.lists(ROW, min_size=1, max_size=40),
       st.integers(min_value=1, max_value=5))
def test_compact_sorted_matches_naive_and_is_sorted(rows, parallelism):
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["node1", "label", "node2", "extra"])) \
        .repartition(parallelism)
    got = O.compact_sorted(ds, ["node1", "label", "node2"]).to_pandas()
    got_rows = sorted(map(tuple, got[["node1", "label", "node2",
                                      "extra"]].to_numpy().tolist()))
    assert got_rows == naive_compact(rows)
    # output arrives globally key-sorted without a separate sort stage
    keys = list(map(tuple, got[["node1", "label", "node2"]]
                    .to_numpy().tolist()))
    assert keys == sorted(keys)


def test_compact_sorted_ties_never_split_across_partitions():
    # the single-exchange design rests on Ray's range partitioner
    # assigning rows by a pure function of the key: a key duplicated
    # across MANY input blocks must still come out as exactly one row.
    # 50k rows, only 199 distinct keys, 32 blocks — every key collides
    # with every boundary candidate.
    import numpy as np
    rng = np.random.default_rng(11)
    n = 50_000
    k = rng.integers(0, 199, n)
    df = pd.DataFrame({
        "node1": [f"k{v:03d}" for v in k],
        "label": "p",
        "node2": "m",
        "extra": [f"v{i % 7}" for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(32)
    # validate=True turns on the global key-uniqueness guard, the
    # runtime detector for the one-block-per-sort-partition invariant
    got = O.compact_sorted(ds, ["node1", "label", "node2"],
                           validate=True).to_pandas()
    assert len(got) == len(set(k)), "a key run split across partitions"
    assert not got.duplicated(["node1", "label", "node2"]).any()
    assert list(got.node1) == sorted(got.node1)
    # every distinct extra value survived into the merged lists
    assert got.extra.str.count(r"\|").sum() == len(set(k)) * 6

# direct fuzz of the vectorized grouped merge against the naive
# per-group set-union (pure pandas, no Ray session) — the tier
# dispatch (pipe/backslash detection) is the risk surface
MTOK = st.one_of(st.sampled_from([
    "", "a", "x|y", r"x\|y", r"a\|b|c", "|", "a||b",
    r"end\\", r"end\\|z", r"\|", r"q\n", " sp ", "a|a|a",
]), st.text(alphabet="ab|\\", max_size=6))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["g1", "g2", "g3"]), MTOK, MTOK),
                min_size=1, max_size=30))
def test_merge_lists_grouped_matches_naive(rows):
    from kgtk_ray.format import merge_lists_grouped
    df = pd.DataFrame(rows, columns=["k", "c1", "c2"])
    got = merge_lists_grouped(df, ["k"], ["c1", "c2"])
    want = (df.groupby("k", as_index=False)
              .agg(c1=("c1", merge_list_cells),
                   c2=("c2", merge_list_cells)))
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert got.equals(want), (got.to_dict(), want.to_dict())
