"""DSIR importance scoring / resampling (kgtk_ray/text/dsir.py)."""
import numpy as np
import pandas as pd
import ray.data as rd

from kgtk_ray.text.dsir import (_feature_buckets, dsir_sample, dsir_scores,
                                _ALPHA)


def _corpora():
    # target is "spark spark table" prose; raw mixes in "dog cat" prose
    tgt = pd.DataFrame({
        "doc_id": range(10),
        "text": ["spark table scan fast" if i % 2 else "table spark join"
                 for i in range(10)]})
    raw = pd.DataFrame({
        "doc_id": range(100, 120),
        "text": (["spark table scan fast"] * 5
                 + ["dog cat mouse house"] * 10
                 + ["table spark join"] * 5)})
    return raw, tgt


def test_feature_buckets_unigrams_and_bigrams():
    rows, b = _feature_buckets(pd.Series(["a b c", "x"]), 97, True)
    # 3+1 unigrams, 2+0 bigrams; bigrams never cross rows
    assert len(rows) == 6
    assert list(rows) == [0, 0, 0, 1, 0, 0]
    rows_u, _ = _feature_buckets(pd.Series(["a b c", "x"]), 97, False)
    assert len(rows_u) == 4
    assert (b < 97).all()


def test_dsir_scores_separate_target_like_docs():
    raw, tgt = _corpora()
    out = dsir_scores(rd.from_pandas(raw), rd.from_pandas(tgt),
                      num_buckets=512).to_pandas()
    assert len(out) == len(raw)
    assert set(out.columns) == {"doc_id", "n_feats", "dsir_score"}
    s = dict(zip(out.doc_id, out.dsir_score))
    target_like = [s[i] for i in range(100, 105)]
    off_target = [s[i] for i in range(105, 115)]
    assert min(target_like) > max(off_target)


def test_dsir_scores_match_single_process():
    """Distributed counts/scores equal a one-pass pandas computation
    regardless of block structure."""
    raw, tgt = _corpora()
    ds = rd.from_pandas(raw).repartition(7)  # force many blocks
    got = dsir_scores(ds, rd.from_pandas(tgt).repartition(3),
                      num_buckets=256).to_pandas().sort_values("doc_id")

    def counts(df):
        _, b = _feature_buckets(df.text.astype(str), 256, True)
        return np.bincount(b, minlength=256)

    cr, ct = counts(raw), counts(tgt)
    lr = np.log(cr + _ALPHA) - np.log(cr.sum() + _ALPHA * 256)
    lt = np.log(ct + _ALPHA) - np.log(ct.sum() + _ALPHA * 256)
    rows, b = _feature_buckets(raw.text.astype(str), 256, True)
    w = np.zeros(len(raw))
    np.add.at(w, rows, (lt - lr)[b])
    assert np.allclose(got.dsir_score.to_numpy(), w, atol=1e-12)


def test_dsir_sample_topk_and_determinism():
    raw, tgt = _corpora()
    a = dsir_sample(rd.from_pandas(raw), rd.from_pandas(tgt), k=5,
                    num_buckets=512).to_pandas()
    b = dsir_sample(rd.from_pandas(raw).repartition(5),
                    rd.from_pandas(tgt), k=5, num_buckets=512).to_pandas()
    assert len(a) == 5
    assert sorted(a.doc_id) == sorted(b.doc_id)  # block-order independent
    # without gumbel, pure top-k by score: all 5 from the target-like docs
    c = dsir_sample(rd.from_pandas(raw), rd.from_pandas(tgt), k=5,
                    num_buckets=512, gumbel=False).to_pandas()
    assert set(c.doc_id) <= {100, 101, 102, 103, 104, 115, 116, 117, 118, 119}


def test_empty_text_scores_zero():
    raw = pd.DataFrame({"doc_id": [1, 2], "text": ["", "word word"]})
    tgt = pd.DataFrame({"doc_id": [9], "text": ["word"]})
    out = dsir_scores(rd.from_pandas(raw), rd.from_pandas(tgt),
                      num_buckets=64).to_pandas().sort_values("doc_id")
    assert out.n_feats.to_list()[0] == 0
    assert out.dsir_score.to_list()[0] == 0.0
