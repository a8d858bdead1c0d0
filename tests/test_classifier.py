"""Quality classifier (kgtk_ray/text/classifier.py)."""
import numpy as np
import pandas as pd
import ray.data as rd

from kgtk_ray.text.classifier import (classifier_filter,
                                      quality_classifier_scores,
                                      train_quality_classifier)


def _corpora():
    pos = pd.DataFrame({
        "doc_id": range(40),
        "text": ["spark table scan merge join" if i % 2
                 else "table spark aggregate sort" for i in range(40)]})
    neg = pd.DataFrame({
        "doc_id": range(50, 90),
        "text": ["dog cat mouse house garden" if i % 2
                 else "rain cloud storm wind sky" for i in range(40)]})
    corpus = pd.DataFrame({
        "doc_id": range(100, 160),
        "text": (["spark table merge sort scan"] * 15
                 + ["dog cat mouse house garden"] * 30
                 + ["table spark aggregate scan"] * 15)})
    return corpus, pos, neg


def test_scores_separate_classes():
    corpus, pos, neg = _corpora()
    out = quality_classifier_scores(
        rd.from_pandas(corpus), rd.from_pandas(pos), rd.from_pandas(neg),
        num_buckets=512).to_pandas()
    assert len(out) == len(corpus)
    assert ((out.clf_score > 0) & (out.clf_score < 1)).all()
    s = dict(zip(out.doc_id, out.clf_score))
    pos_like = [s[i] for i in list(range(100, 115)) + list(range(145, 160))]
    neg_like = [s[i] for i in range(115, 145)]
    assert min(pos_like) > 0.5 > max(neg_like)


def test_corpus_as_negative_default():
    """GPT-3 setup: negatives default to the raw corpus itself; the
    ordering (target-like above off-target) must still hold."""
    corpus, pos, _ = _corpora()
    out = quality_classifier_scores(
        rd.from_pandas(corpus), rd.from_pandas(pos),
        num_buckets=512).to_pandas()
    s = dict(zip(out.doc_id, out.clf_score))
    assert min(s[i] for i in range(100, 115)) > max(
        s[i] for i in range(115, 145))


def test_training_deterministic_across_block_layouts():
    corpus, pos, neg = _corpora()
    w1, b1 = train_quality_classifier(
        rd.from_pandas(pos), rd.from_pandas(neg),
        num_buckets=256, iters=50)
    w2, b2 = train_quality_classifier(
        rd.from_pandas(pos).repartition(7),
        rd.from_pandas(neg).repartition(3),
        num_buckets=256, iters=50)
    assert b1 == b2
    assert np.array_equal(w1, w2)


def test_max_train_docs_bounds_the_sample():
    corpus, pos, neg = _corpora()
    # a 5-doc cap must pick the same docs regardless of layout
    w1, _ = train_quality_classifier(
        rd.from_pandas(pos), rd.from_pandas(neg),
        num_buckets=128, iters=10, max_train_docs=5)
    w2, _ = train_quality_classifier(
        rd.from_pandas(pos).repartition(9), rd.from_pandas(neg),
        num_buckets=128, iters=10, max_train_docs=5)
    assert np.array_equal(w1, w2)


def test_filter_threshold_and_lottery():
    corpus, pos, neg = _corpora()
    high = set(range(100, 115)) | set(range(145, 160))
    hard = classifier_filter(rd.from_pandas(corpus), rd.from_pandas(pos),
                             rd.from_pandas(neg), threshold=0.5,
                             num_buckets=512).to_pandas()
    assert set(hard.doc_id) == high
    lot = classifier_filter(rd.from_pandas(corpus), rd.from_pandas(pos),
                            rd.from_pandas(neg), lottery_alpha=2.0,
                            num_buckets=512).to_pandas()
    lot2 = classifier_filter(rd.from_pandas(corpus).repartition(5),
                             rd.from_pandas(pos), rd.from_pandas(neg),
                             lottery_alpha=2.0, num_buckets=512).to_pandas()
    assert sorted(lot.doc_id) == sorted(lot2.doc_id)  # deterministic
    # the lottery keeps most high-score docs and few low-score docs
    kept_high = len(set(lot.doc_id) & high)
    kept_low = len(set(lot.doc_id) - high)
    assert kept_high > kept_low
    assert kept_high >= 20
    assert kept_low <= 10
