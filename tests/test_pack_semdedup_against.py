"""Tests for the round-3 training-data additions: sequence packing,
SemDeDup semantic dedup, and cross-corpus fuzzy dedup — each checked
against an independent single-process replay, plus invariants."""
import numpy as np
import pandas as pd
import ray.data

from kgtk_ray.dedup import dedup_against, semdedup
from kgtk_ray.text import pack_sequences
from kgtk_ray.text.tokens import BPEISH

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "while the sun sets slowly behind the big old hill near the lake")


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _docs(n=200, seed=7):
    rng = np.random.default_rng(seed)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(int(rng.integers(1, 120))))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                         "text": texts})


def _naive_pack(df: pd.DataFrame, max_tokens: int, n_bins: int) -> pd.DataFrame:
    rows = []
    df = df.copy()
    df["n_tokens"] = df["text"].str.count(BPEISH).astype("int64")
    df["bin"] = ((df["doc_id"].to_numpy().astype(np.uint64)
                  * np.uint64(2654435761)) % np.uint64(2**32)
                 % np.uint64(n_bins)).astype("int64")
    for b, sub in df.groupby("bin"):
        sub = sub.sort_values("doc_id")
        seq, acc = 0, 0
        for _, r in sub.iterrows():
            if acc > 0 and acc + r.n_tokens > max_tokens:
                seq += 1
                acc = 0
            acc += int(r.n_tokens)
            rows.append((int(r.doc_id), int(r.n_tokens), int(b), seq))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "bin", "seq"])


def test_pack_matches_naive():
    df = _docs()
    # fragment into many blocks so packing must be block-order-free
    ds = ray.data.from_pandas(
        [df.iloc[i::5].reset_index(drop=True) for i in range(5)])
    got = pack_sequences(ds, max_tokens=100, n_bins=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _naive_pack(df, 100, 8).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pack_budget_invariant():
    ds = ray.data.from_pandas(_docs(300, seed=11))
    out = pack_sequences(ds, max_tokens=80, n_bins=4).to_pandas()
    g = out.groupby(["bin", "seq"]).agg(tot=("n_tokens", "sum"),
                                        n=("doc_id", "count"))
    # a sequence exceeds the budget only when a single oversized doc
    # sits alone in it
    assert ((g.tot <= 80) | (g.n == 1)).all()
    assert len(out) == 300


def test_pack_oversized_doc_isolated():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b c", " ".join(["x"] * 500), "d e"]})
    out = pack_sequences(ray.data.from_pandas(df), max_tokens=100,
                         n_bins=1).to_pandas().set_index("doc_id")
    assert out.loc[2, "seq"] not in {out.loc[1, "seq"], out.loc[3, "seq"]}


def test_pack_precomputed_counts():
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "nt": [60, 50, 30, 90]})
    out = pack_sequences(ray.data.from_pandas(df), max_tokens=100,
                         count_col="nt", n_bins=1).to_pandas() \
        .set_index("doc_id")
    # 60 | 50+30 | 90
    assert out.loc[1, "seq"] != out.loc[2, "seq"]
    assert out.loc[2, "seq"] == out.loc[3, "seq"]
    assert out.loc[4, "seq"] != out.loc[3, "seq"]


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

def _emb(n=120, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                         "embedding": [v for v in X]})


def _naive_semdedup(df: pd.DataFrame, *, n_clusters, eps, sample_size,
                    seed) -> pd.DataFrame:
    """Independent replay: same deterministic centroid recipe, naive
    per-cluster O(m^2) pairwise pass."""
    def norm(X):
        return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                              1e-12)

    ids = df["vec_id"].to_numpy()
    stride = max(1, len(df) // sample_size)
    sdf = df
    if stride > 1:
        h = pd.util.hash_array(ids)
        sdf = df[h % np.uint64(stride) == 0]
    sdf = sdf.sort_values("vec_id")
    S = norm(np.stack(sdf["embedding"].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_clusters, len(S)), replace=False)]
    for _ in range(5):
        assign = (S @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = norm(S[m].mean(axis=0, keepdims=True))[0]
    X = norm(np.stack(df["embedding"].to_numpy()).astype(np.float32))
    cl = (X @ C.T).argmax(axis=1)
    rows = []
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]
        idx = idx[np.argsort(ids[idx])]
        kept: list[int] = []
        for i in idx:
            dup = any(float(X[i] @ X[j]) >= eps for j in kept)
            rows.append((int(ids[i]), int(c), not dup))
            kept.append(i)
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "keep"]) \
        .sort_values("vec_id").reset_index(drop=True)


def test_semdedup_matches_naive():
    df = _emb()
    # plant near-identical copies of vectors 0..9
    dup = df.iloc[:10].copy()
    dup["vec_id"] = dup["vec_id"] + 1000
    full = pd.concat([df, dup], ignore_index=True)
    ds = ray.data.from_pandas(
        [full.iloc[i::4].reset_index(drop=True) for i in range(4)])
    got = semdedup(ds, n_clusters=6, eps=0.95, sample_size=64,
                   seed=5).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    want = _naive_semdedup(full, n_clusters=6, eps=0.95, sample_size=64,
                           seed=5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exactly the planted copies are dropped
    assert set(got.loc[~got["keep"], "vec_id"]) == set(dup["vec_id"])


def test_semdedup_chain_rule():
    # the duplicate rule is "cosine >= eps to ANY earlier member"
    # (dup or not): pin it with a 3-chain a~b, b~c, a!~c, where only
    # the any-earlier rule marks c.
    e = np.zeros((3, 8), dtype=np.float32)
    e[0, 0] = 1.0
    # b at angle theta from a; c at angle theta from b (2*theta from a)
    th = np.arccos(0.96)
    e[1, 0], e[1, 1] = np.cos(th), np.sin(th)
    e[2, 0], e[2, 1] = np.cos(2 * th), np.sin(2 * th)
    df = pd.DataFrame({"vec_id": [1, 2, 3], "embedding": [v for v in e]})
    out = semdedup(ray.data.from_pandas(df), n_clusters=1, eps=0.95,
                   sample_size=8, seed=0).to_pandas().set_index("vec_id")
    # cos(a,b)=0.96>=eps -> b dup; cos(c,b)=0.96>=eps and b is EARLIER
    # (any-earlier rule) -> c dup too, even though cos(a,c)~0.843<eps
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "keep"])
    assert not bool(out.loc[3, "keep"])


# ---------------------------------------------------------------------------
# dedup_against
# ---------------------------------------------------------------------------

def test_dedup_against_flags_near_dups():
    corpus = [
        (0, BASE + " unique tail 0"),
        (100, BASE.replace("quick", "swift") + " unique tail 0"),
        (200, "completely different text about spark ray arrow data"),
        (201, "another unrelated document mentioning graphs and rays only"),
    ]
    cds = ray.data.from_pandas(
        pd.DataFrame(corpus, columns=["doc_id", "text"]))
    # reference: exact copy of doc 0's text under a different id space
    rds = ray.data.from_pandas(
        pd.DataFrame({"ref_id": [9000], "text": [BASE + " unique tail 0"]}))
    out = dedup_against(cds, rds, ref_id_col="ref_id",
                        threshold=0.7).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "dup"])      # exact text match
    assert bool(out.loc[100, "dup"])    # near-dup (one word changed)
    assert not bool(out.loc[200, "dup"])
    assert not bool(out.loc[201, "dup"])
    assert len(out) == 4                # one row per corpus doc


def test_dedup_against_join_path(monkeypatch):
    """Force the pair-partitioned (no-broadcast) verify branch and
    check it agrees with the broadcast branch."""
    import kgtk_ray.dedup.against as ag
    corpus = [
        (0, BASE + " unique tail 0"),
        (100, BASE.replace("quick", "swift") + " unique tail 0"),
        (200, "completely different text about spark ray arrow data"),
    ]
    cds = ray.data.from_pandas(
        pd.DataFrame(corpus, columns=["doc_id", "text"]))
    rds = ray.data.from_pandas(
        pd.DataFrame({"ref_id": [9000], "text": [BASE + " unique tail 0"]}))
    broad = dedup_against(cds, rds, ref_id_col="ref_id",
                          threshold=0.7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(ag, "_VERIFY_BROADCAST_DOCS", 0)
    joined = dedup_against(cds, rds, ref_id_col="ref_id",
                           threshold=0.7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(broad, joined)


def test_split_dataset():
    from kgtk_ray.ops import split_dataset
    import pytest
    df = pd.DataFrame({"doc_id": np.arange(2000, dtype="int64")})
    out = split_dataset(ray.data.from_pandas(df), id_col="doc_id",
                        fractions={"train": 0.8, "valid": 0.1,
                                   "test": 0.1}).to_pandas()
    counts = out["split"].value_counts()
    # hash-range assignment: proportions approximate on 2000 ids
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert set(counts.index) == {"train", "valid", "test"}
    # deterministic: re-running assigns identically
    out2 = split_dataset(ray.data.from_pandas(df),
                         id_col="doc_id").to_pandas()
    out3 = split_dataset(ray.data.from_pandas(df),
                         id_col="doc_id").to_pandas()
    pd.testing.assert_frame_equal(out2, out3)
    with pytest.raises(ValueError, match="sum to 1"):
        split_dataset(ray.data.from_pandas(df), id_col="doc_id",
                      fractions={"train": 0.5})
    # a fraction that rounds to an empty hash range must raise, not
    # produce a silently empty split
    with pytest.raises(ValueError, match="empty range"):
        split_dataset(ray.data.from_pandas(df), id_col="doc_id",
                      fractions={"train": 0.99996, "tiny": 0.00004})


def test_dedup_against_empty_reference():
    cds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["aaaa bbbb", "cccc dddd"]}))
    rds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype=str)}))
    out = dedup_against(cds, rds).to_pandas()
    assert len(out) == 2 and not out["dup"].any()
