"""Unit tests for text chunking and deterministic sampling operators."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgtk_ray.ops import sample_per_group, weighted_sample
from kgtk_ray.ops.sample import _id_hash
from kgtk_ray.text import chunk_text


def _ds(rows, parallelism=2):
    return rd.from_pandas(pd.DataFrame(rows)).repartition(parallelism)


def test_chunk_text_boundaries():
    ds = _ds([
        {"doc_id": 1, "text": "abcdefghij"},   # len 10
        {"doc_id": 2, "text": "xy"},
        {"doc_id": 3, "text": ""},
    ])
    out = (chunk_text(ds, size=4, overlap=1).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    # stride 3: starts 0,3,6,9 for len 10
    d1 = out[out.doc_id == 1]
    assert d1.chunk.tolist() == ["abcd", "defg", "ghij", "j"]
    assert d1.chunk_id.tolist() == [0, 1, 2, 3]
    assert out[out.doc_id == 2].chunk.tolist() == ["xy"]
    assert (out.doc_id == 3).sum() == 0  # empty doc -> no chunks


def test_chunk_text_overlap_validation():
    ds = _ds([{"doc_id": 1, "text": "abc"}])
    with pytest.raises(ValueError):
        chunk_text(ds, size=4, overlap=4)


def test_chunk_text_reconstruction():
    # non-overlapping chunks concatenate back to the original text
    text = "the quick brown fox jumps over the lazy dog" * 3
    ds = _ds([{"doc_id": 7, "text": text}], parallelism=1)
    out = (chunk_text(ds, size=16, overlap=0).to_pandas()
           .sort_values("chunk_id"))
    assert "".join(out.chunk) == text


def test_sample_per_group_deterministic_topn():
    rows = [{"doc_id": i, "src": f"s{i % 3}"} for i in range(60)]
    ds = _ds(rows, parallelism=4)
    out = sample_per_group(ds, group_col="src", id_col="doc_id", n=5) \
        .to_pandas()
    assert len(out) == 15
    assert out.groupby("src").size().tolist() == [5, 5, 5]
    # matches the explicit definition: n smallest (hash, id) per group
    df = pd.DataFrame(rows)
    df["h"] = _id_hash(df.doc_id.to_numpy())
    want = (df.sort_values(["h", "doc_id"]).groupby("src").head(5))
    assert set(out.doc_id) == set(want.doc_id)
    # block-order independence
    out2 = sample_per_group(_ds(rows[::-1], parallelism=7),
                            group_col="src", id_col="doc_id", n=5).to_pandas()
    assert set(out2.doc_id) == set(out.doc_id)


def test_weighted_sample_rates():
    rows = [{"doc_id": i, "src": "keep_all" if i % 2 else "drop_all"}
            for i in range(200)]
    ds = _ds(rows, parallelism=3)
    out = weighted_sample(ds, rate_col="src", id_col="doc_id",
                          rates={"keep_all": 1.0, "drop_all": 0.0}).to_pandas()
    assert set(out.src) == {"keep_all"}
    assert len(out) == 100
    # half rate keeps roughly half (deterministic exact set)
    out2 = weighted_sample(ds, rate_col="src", id_col="doc_id",
                           rates={"keep_all": 0.5, "drop_all": 0.5}).to_pandas()
    h = _id_hash(np.arange(200)) % np.uint64(10000)
    assert len(out2) == int((h < 5000).sum())


def test_decontaminate_removes_and_marks():
    from kgtk_ray.text import decontaminate
    corpus = _ds([
        {"doc_id": 1, "text": "alpha beta gamma delta unrelated"},
        {"doc_id": 2, "text": "totally different words here now"},
        {"doc_id": 3, "text": "x alpha beta gamma y"},
    ], parallelism=3)
    ev = _ds([{"doc_id": 100, "text": "eval set alpha beta gamma end"}],
             parallelism=1)
    kept = decontaminate(corpus, ev, k=3).to_pandas()
    assert sorted(kept.doc_id) == [2]  # docs 1 and 3 share 'alpha beta gamma'
    marked = (decontaminate(corpus, ev, k=3, mode="mark").to_pandas()
              .sort_values("doc_id"))
    assert marked.contaminated.tolist() == [True, False, True]
    # k larger than any shared span -> nothing removed
    all_kept = decontaminate(corpus, ev, k=6).to_pandas()
    assert len(all_kept) == 3


def test_decontaminate_empty_eval_set():
    from kgtk_ray.text import decontaminate
    corpus = _ds([{"doc_id": 1, "text": "a b c d"}], parallelism=1)
    ev = _ds([{"doc_id": 9, "text": "zz"}], parallelism=1)  # no 3-grams
    out = decontaminate(corpus, ev, k=3).to_pandas()
    assert len(out) == 1


def test_unigram_logprob_hand_values():
    import math
    from kgtk_ray.text import unigram_logprob
    ref = _ds([{"doc_id": 100, "text": "a a b"}], parallelism=1)
    corpus = _ds([
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "zzz"},     # fully OOV
        {"doc_id": 3, "text": ""},        # no tokens -> dropped
    ], parallelism=3)
    out = (unigram_logprob(corpus, ref).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # model: N=3 tokens, V=2 types; p(a)=(2+.5)/(3+1), p(b)=(1+.5)/4, p(oov)=.5/4
    pa_, pb, poov = 2.5 / 4, 1.5 / 4, 0.5 / 4
    assert out.doc_id.tolist() == [1, 2]
    assert out.n_tokens.tolist() == [2, 1]
    assert out.lm_score.iloc[0] == pytest.approx(
        (math.log(pa_) + math.log(pb)) / 2)
    assert out.lm_score.iloc[1] == pytest.approx(math.log(poov))


def test_unigram_logprob_vocab_cap():
    from kgtk_ray.text import unigram_logprob
    ref = _ds([{"doc_id": 100, "text": "a a a b b c"}], parallelism=1)
    corpus = _ds([{"doc_id": 1, "text": "a c"}], parallelism=1)
    # cap vocab to the 2 most frequent types (a, b): c becomes OOV and
    # N/V shrink to the capped model (N=5, V=2)
    out = unigram_logprob(corpus, ref, max_vocab=2).to_pandas()
    import math
    want = (math.log(3.5 / 6) + math.log(0.5 / 6)) / 2
    assert out.lm_score.iloc[0] == pytest.approx(want)
